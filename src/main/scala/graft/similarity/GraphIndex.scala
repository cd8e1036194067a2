package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Graph-based ANN — the fourth serving engine next to IVF
  * ([[IvfIndex]]), PQ ([[PqIndex]]) and the Matryoshka prefix cut
  * (VERDICT r12 next-round #7): the industry-default navigable-graph
  * family (Malkov/Yashunin's NSW/HNSW line, public literature), built
  * DETERMINISTIC so the recall gate and the exact-scan oracle hold.
  *
  * Structure: each vector keeps its m (approximate) nearest neighbors
  * — the navigable core — plus ring skip links at offsets 2^j through
  * the md5 ordering of ids, a deterministic stand-in for NSW's random
  * long-range links (Kleinberg small-world shape) that keeps the
  * graph navigable from any entry. Search is multi-entry BEAM
  * expansion: each round expands the `beam` best-scoring unexpanded
  * nodes `hops` adjacency hops out (hops > 1 composes the adjacency
  * join, amortizing the per-round driver fixed cost — VERDICT r14
  * next-round #2), scores ONLY the newly-reached vectors against the
  * query, and accumulates everything scored as the candidate set; an
  * exact re-rank of the candidates emits the final ranking (the
  * IVF/PQ/MRL serving shape).
  *
  * BUILDS (VERDICT r13 #1, convergence-driven since r15 per r14 #1):
  *  - [[build]] — the default and the production path — is
  *    **NN-descent** (Dong/Charikar/Li, "Efficient K-Nearest Neighbor
  *    Graph Construction for Generic Similarity Measures", WWW 2011):
  *    start from the ring ∪ LSH-seeded graph, then iterate
  *    "a neighbor of my neighbor is probably my neighbor". The local
  *    join is INCREMENTAL (the paper's sampling trick): each list
  *    entry carries a `new` flag — set when it entered the list last
  *    round — and only pairs touching a new entry are proposed, so
  *    round cost decays as lists stabilize and the round budget goes
  *    where updates still happen. Rounds stop EARLY when the
  *    fresh-edge fraction drops under `convergeTol` (the paper's δ
  *    termination): `iters` is a cap, not a schedule. Per-round cost
  *    is O(n · maxList²) pair scores at worst + linear shuffles —
  *    never an n² pair set, never a corpus broadcast, never a
  *    single-partition sort (ring positions come from the distributed
  *    [[graft.operators.PrefixScan]]).
  *  - [[buildExact]] — the test-scale CONTRAST ARM — materializes the
  *    true kNN edges from all pairs. Its broadcast is size-gated
  *    (ADVICE r13): above `maxBroadcastRows` the right side is no
  *    longer broadcast and the pair source degrades to a partitioned
  *    cartesian product rather than failing on the 8 GB broadcast cap.
  *
  * The per-round fresh-edge counts are the engine's CONVERGENCE
  * OBSERVABLE (VERDICT r14 #1): [[buildWithStats]] returns them,
  * [[save]] commits them into the generation (`build_stats`), and
  * [[convergence]] reads the terminal fresh fraction back from the
  * artifact — the retrain cadence can see whether the last build
  * actually converged (fresh ≈ 0) or hit the round cap, the same
  * artifact-resident contract as [[skewRatio]] for degree drift.
  *
  * Scale shape: the adjacency table (n×(m+skips) edge rows) is the
  * serving artifact; per-query work is rounds × beam × degree^hops
  * vector reads — INDEPENDENT of corpus size, the property that makes
  * graph indexes the serving default. Frontier/candidate collects are
  * bounded by `budget` ids (±one round's expansion). The batched face
  * is [[probeJoin]] (a (query_id, node) frontier TABLE, per-round
  * joins shared across the whole query batch); the Δ faces are
  * [[insertPublish]] (the NSW add-node walk, generation-published at
  * Δ write cost), [[delete]] (tombstone sidecar — the retraction half
  * the other four indexes already had, VERDICT r14 #4) and
  * [[compact]] (fold tombstones + collapse the manifest).
  *
  * Everything is deterministic: candidate cuts tie by (cosine desc,
  * id), entry points and ring by (md5 hex, id), beam by (cosine desc,
  * id) — so candidates, gate and final ranks replay exactly, at any
  * parallelism.
  */
object GraphIndex {

  /** One NN-descent round's summary — the convergence observable.
    * `freshEdges` = edges that entered some node's internal-K list
    * this round; convergence is freshEdges/totalEdges → 0.
    */
  case class BuildRound(round: Int, freshEdges: Long, totalEdges: Long) {
    def freshFraction: Double =
      if (totalEdges == 0L) 0.0 else freshEdges.toDouble / totalEdges
  }

  private def md5Of(c: Column) =
    md5(c.cast("string").cast("binary"))

  /** The serve-time per-src degree cap [[load]] applies by default
    * (VERDICT r15 next-round #1): equal to the default build's
    * internal list width (`maxList` = 64), so a FRESH build — whose
    * per-node degree is ~m·2 + ring·2 ≈ 44 — passes through
    * essentially uncut, while maintenance-grown hubs
    * ([[insertPublish]] adds reverse links and never re-prunes) are
    * cut back to the width the walk was budgeted for. The r15 drift
    * rehearsal measured the uncapped consequence: ONE drifted 25% Δ
    * batch ballooned the 16-query serve wall 16.0 → 122.8 s while
    * recall held — un-pruned hubs soak beam budget at degree^hops
    * per expansion.
    */
  val DefaultServeDegreeCap = 64

  /** Beam-escalation ceiling for the stall-adaptive walk (see
    * [[searchCandidates]]): a stalled walk's beam jumps up to this,
    * bounding the per-round expansion fan-out at
    * maxBeam × degree^hops candidate rows per query (1024 × 64² ≈ 4M
    * pre-distinct join rows — distributed work, bounded and cheap
    * next to a saved driver round).
    */
  val MaxEscalatedBeam = 1024

  /** One deterministic beam-escalation step, shared verbatim by the
    * single-probe and batched walk faces (their parity is
    * spec-pinned): a round that visited fewer than 16 × beam new
    * nodes is STALLING — its frontier's neighborhoods mostly re-reach
    * already-visited nodes (the dense-cluster regime a drifted Δ
    * creates: the r16 20× drift rehearsal measured a degree-capped
    * post-drift serve STILL 4× the fresh wall because walks crawled
    * toward their budget across ~64 driver rounds of tiny progress).
    * The next round's frontier JUMPS to the width the remaining
    * budget needs at the observed per-unit-beam yield (not a single
    * doubling — each extra round costs a fixed driver job, the term
    * that dominates the serve wall), clamped to [2×, 64×] per step
    * and [[MaxEscalatedBeam]] overall. Healthy walks (growth ≥ 16 ×
    * beam — a fresh build's near-disjoint neighborhoods) never
    * escalate, so their semantics are untouched until the budget-tail
    * rounds.
    */
  private def escalateBeam(beam: Int, growth: Long, remaining: Long): Int =
    if (remaining <= 0 || growth >= beam.toLong * 16) beam
    else {
      val factor = math.min(64L, math.max(2L,
        remaining / math.max(growth, 1L)))
      math.min(MaxEscalatedBeam.toLong, beam.toLong * factor).toInt
    }

  /** Deterministic ring edges (forward direction only): node at md5
    * position p links to positions (p + off) % n for each `off`.
    * Positions come from [[graft.operators.PrefixScan]] — a
    * range-partitioned two-phase scan — NOT a global no-partition
    * window (which would sort the whole corpus through one task;
    * VERDICT r13 what's-wrong #1). The md5 hex of distinct ids is
    * unique, so the PrefixScan unique-order-key contract holds and
    * the positions equal `row_number() over (order by md5(id), id)` -
    * 1 exactly (the q_eval_ann oracle's gpos).
    */
  private[similarity] def ringEdges(emb: DataFrame, idCol: String,
      skips: Seq[Int], n: Long): DataFrame = {
    val base = emb.select(col(idCol), md5Of(col(idCol)).as("_md5"),
      lit(1L).as("_one"))
    val pos = graft.operators.PrefixScan
      .withCumSums(base, "_md5", Seq("_one"))
      .select(col(idCol), (col("cum__one") - 1).as("_pos"))
    val empty = emb.sparkSession.range(0)
      .select(col("id").as("src"), col("id").as("nb"))
    skips.filter(_ < n).map { off =>
      pos.select(col(idCol).as("src"), ((col("_pos") + off) % n).as("_p2"))
        .join(pos.select(col(idCol).as("nb"), col("_pos").as("_p2")),
          Seq("_p2"))
        .select(col("src"), col("nb"))
    }.reduceOption(_ unionAll _).getOrElse(empty)
  }

  /** Score (src, nb) pairs with the exact cosine via two hash joins
    * against the (id, vec) projection — linear in |pairs|, null
    * cosines (zero vectors) dropped: they can never be nearest
    * neighbors.
    */
  private[similarity] def scorePairs(pairs: DataFrame, vecs: DataFrame): DataFrame = {
    val cos = VectorOps.cosineFor(vecs, "_vv")
    pairs
      .join(vecs.select(col("_vid").as("src"), col("_vv").as("_lv")),
        Seq("src"))
      .join(vecs.select(col("_vid").as("nb"), col("_vv").as("_rv")),
        Seq("nb"))
      .select(col("src"), col("nb"),
        cos(col("_lv"), col("_rv")).as("_c"))
      .filter(col("_c").isNotNull)
  }

  /** [[scorePairs]] WITHOUT the null filter — for ring edges in the
    * emitted adjacency: a zero-norm vector's ring links must survive
    * (its null cosine sorts last under [[capDegree]] but the node
    * stays reachable), where a kNN candidate with a null cosine is
    * correctly dropped.
    */
  private[similarity] def scoreEdgesAll(pairs: DataFrame,
      vecs: DataFrame): DataFrame = {
    val cos = VectorOps.cosineFor(vecs, "_vv")
    pairs
      .join(vecs.select(col("_vid").as("src"), col("_vv").as("_lv")),
        Seq("src"))
      .join(vecs.select(col("_vid").as("nb"), col("_vv").as("_rv")),
        Seq("nb"))
      .select(col("src"), col("nb"),
        cos(col("_lv"), col("_rv")).as("_c"))
  }

  /** Bounded per-src top-m cut over scored edges — the TopKAgg heap
    * (≤m rows per (src, partition) reach the shuffle, never a window
    * sort of the full candidate set.
    */
  private[similarity] def topMEdges(scored: DataFrame, m: Int): DataFrame =
    scored.groupBy(col("src"))
      .agg(graft.functions.TopKAgg.topK(m)(col("_c"), col("nb")).as("_t"))
      .select(col("src"), explode(col("_t")).as("_h"))
      .select(col("src"), col("_h").getField("_2").as("nb"),
        col("_h").getField("_1").as("_c"))

  /** Sign bits of `bits` components starting at 1-based `off` — the
    * salted variant of [[VectorOps.signBucket]] (different projections
    * read different component windows, so their bucket collisions are
    * independent evidence of similarity).
    */
  private def signBucketAt(v: Column, bits: Int, off: Int): Column =
    aggregate(slice(v, off, bits), lit(0L),
      (acc, x) => acc * 2 + when(x >= 0f, 1L).otherwise(0L))

  /** LSH-seeded candidate pairs for the NN-descent init — the
    * deterministic analogue of pyNNDescent's random-projection-tree
    * seeding (public literature: Dong et al. report slow convergence
    * from a random init on high-intrinsic-dimension data; seeding the
    * lists with locality-biased candidates fixes it). `nProj`
    * independent sign-bucket projections (each over a different
    * component window); within each bucket, every member pairs with
    * its next `w` members in id order — |bucket|·w pairs, LINEAR in n
    * at ANY bucket skew (never an in-bucket all-pairs, which a
    * boilerplate-heavy mega-bucket would blow up quadratically). Bits
    * adapt to the corpus (target bucket ≈ 32 members).
    */
  private[similarity] def lshInitPairs(vecs: DataFrame, n: Long, dim: Int,
      nProj: Int, w: Int): DataFrame = {
    val bits = math.max(2, math.min(16,
      math.ceil(math.log(math.max(2.0, n / 32.0)) / math.log(2.0)).toInt))
    val wdw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bkt")).orderBy(col("_vid"))
    (0 until nProj).map { p =>
      val off = (p * bits) % math.max(1, dim - bits + 1) + 1
      val pos = vecs
        .select(col("_vid"), signBucketAt(col("_vv"), bits, off).as("_bkt"))
        .withColumn("_pos", row_number().over(wdw))
      (1 to w).map { j =>
        pos.select(col("_bkt"), col("_vid").as("src"),
            (col("_pos") + j).as("_p2"))
          .join(pos.select(col("_bkt"), col("_vid").as("nb"),
            col("_pos").as("_p2")), Seq("_bkt", "_p2"))
          .select(col("src"), col("nb"))
      }.reduce(_ unionAll _)
    }.reduce(_ unionAll _).distinct()
  }

  /** One INCREMENTAL NN-descent refinement round over the current
    * (src, nb, _c, _new) edge table — exposed for GraphBuildPlanSpec,
    * which asserts this plan's SHAPE (no single-partition exchange,
    * no cartesian/NL join, no non-local broadcast). The round:
    * undirected neighbor lists capped at `maxList` by cosine (the
    * paper's sampled general neighborhood, made deterministic), pairs
    * proposed WITHIN each list only when at least one side is `_new`
    * — entries that entered the list last round; old-old pairs were
    * proposed the round the later one arrived (the paper's
    * incremental local join, the reason round cost decays as lists
    * stabilize) — normalized a<b and deduped before scoring, folded
    * into the per-node bounded top-`buildK` heaps. The output's
    * `_new` flag marks edges absent from the input list — the
    * per-round update count [[buildWithStats]] terminates on.
    */
  private[similarity] def descentRound(b: DataFrame, vecs: DataFrame,
      buildK: Int, maxList: Int, width: Int = 0): DataFrame = {
    // undirected view, deduped: (s,n) can arrive from both directions
    // with the same deterministic cosine but different flags — new if
    // EITHER direction is new
    val undirected = b.unionAll(
      b.select(col("nb").as("src"), col("src").as("nb"), col("_c"),
        col("_new")))
      .groupBy(col("src"), col("nb"))
      .agg(max(col("_c")).as("_c"), max(col("_new")).as("_new"))
    // bounded cut at maxList by cosine (TopKAgg heap), flags rejoined
    // after the cut (the heap's payload is the id alone)
    val cut = topMEdges(undirected.select(col("src"), col("nb"), col("_c")),
      maxList)
    val listed = cut.join(
      undirected.select(col("src"), col("nb"), col("_new")),
      Seq("src", "nb"))
    // per-src sorted (cos desc, id) list of (nb, new) — collect_list
    // is bounded at maxList entries and array_sort normalizes its
    // nondeterministic arrival order
    val cmp = (l: Column, r: Column) =>
      when(l.getField("c") > r.getField("c"), -1)
        .when(l.getField("c") < r.getField("c"), 1)
        .when(l.getField("nb") < r.getField("nb"), -1)
        .when(l.getField("nb") > r.getField("nb"), 1)
        .otherwise(0)
    val lists = listed.groupBy(col("src"))
      .agg(array_sort(collect_list(struct(col("_c").as("c"),
        col("nb").as("nb"), col("_new").as("f"))), cmp).as("_lst"))
    val proposed = lists
      .select(explode(flatten(transform(col("_lst"), (x, i) =>
        filter(
          transform(
            slice(col("_lst"), i + lit(2),
              greatest(lit(0), size(col("_lst")) - i - 1)),
            y => struct(
              least(x.getField("nb"), y.getField("nb")).as("src"),
              greatest(x.getField("nb"), y.getField("nb")).as("nb"),
              (x.getField("f") || y.getField("f")).as("f"))),
          p => p.getField("f")))))
        .as("_p"))
      .select(col("_p").getField("src").as("src"),
        col("_p").getField("nb").as("nb"))
      .filter(col("src") =!= col("nb"))
      .distinct()
    val fresh = scorePairs(proposed, vecs)
    val cand = fresh.unionAll(
      fresh.select(col("nb").as("src"), col("src").as("nb"), col("_c")))
    // the merge cut sees the round's full pair volume (round 1: up to
    // n·maxList²/2 rows) — hash-repartition it by src to `width`
    // BEFORE the TopKAgg so per-task input stays ~bounded as n grows
    // (the groupBy reuses the partitioning: no second exchange) —
    // per-DataFrame sizing instead of mutating the session-global
    // spark.sql.shuffle.partitions, which a concurrent query on the
    // same session would observe (ADVICE r16)
    val mergedIn =
      b.select(col("src"), col("nb"), col("_c")).unionAll(cand).distinct()
    val merged = topMEdges(
      if (width > 0) mergedIn.repartition(width, col("src")) else mergedIn,
      buildK)
    // an edge is new iff it was not in the input list — the flag that
    // drives next round's proposals and this round's update count
    merged.join(
      b.select(col("src"), col("nb"), lit(1).as("_old")),
      Seq("src", "nb"), "left")
      .select(col("src"), col("nb"), col("_c"),
        col("_old").isNull.as("_new"))
  }

  /** NN-DESCENT approximate-kNN build returning the adjacency AND the
    * per-round convergence stats (fresh-edge counts). Starts from the
    * deterministic ring ∪ LSH-seeded graph and runs refinement rounds
    * until the fresh-edge fraction drops under `convergeTol` or
    * `iters` rounds ran — `iters` is a CAP; on corpora whose lists
    * stabilize early the build stops early and never pays the
    * remaining rounds (VERDICT r14 next-round #1). No stage ever
    * materializes n² pairs, broadcasts the corpus, or sorts through a
    * single partition (PlanSpec-asserted). `emb` is scanned ~2× per
    * round — cache it unless it is a raw parquet scan.
    *
    * Returns the symmetric (src, nb) adjacency: approx-kNN edges ∪
    * ring skips, both directions. Deterministic end to end: the ring
    * init, every TopKAgg cut (cos desc, id asc) and the pair
    * proposals are all order-free or tie-broken; the convergence stop
    * is a pure function of deterministic counts.
    */
  def buildWithStats(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 16, iters: Int = 10, maxList: Int = 64,
      skips: Seq[Int] = Seq(1, 2, 4, 8, 16, 32),
      lshProjections: Int = 4, lshWindow: Int = 8,
      convergeTol: Double = 0.02): (DataFrame, Seq[BuildRound]) = {
    require(iters >= 0 && m >= 1 && maxList >= m)
    val vecs = emb.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
    val n = emb.count()
    val dim = emb.select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val ring = ringEdges(emb, idCol, skips, n).localCheckpoint()
    // descent runs at an INTERNAL K larger than the emitted m (the
    // paper's K vs final-k distinction): a true neighbor ranked past
    // m must survive the per-round cut to keep being proposed, or
    // every node's list freezes at its first m guesses
    val buildK = maxList
    // init: ring neighborhood (deterministic, navigable — every node
    // reachable) ∪ the LSH-seeded locality-biased candidates, scored
    // and cut to buildK per node; NN-descent refines toward true kNN.
    // Every init edge is `new` — round 1 is the full local join.
    val initPairs = ring
      .unionAll(lshInitPairs(vecs, n, dim, lshProjections, lshWindow))
    val initUndir = initPairs.unionAll(
      initPairs.select(col("nb").as("src"), col("src").as("nb")))
      .filter(col("src") =!= col("nb")).distinct()
    // round snapshots via Snapshots.persistRound*, NOT localCheckpoint:
    // a checkpoint RDD can never be unpersisted through the Dataset
    // handle, so ten rounds of 40k×maxList edge tables accumulate in
    // the block store (the 20× rehearsal OOM'd an 8g driver exactly
    // this way). persistRoundCounted materializes the round AND counts
    // its fresh edges in ONE job, then frees the superseded round; the
    // FINAL round stays persisted — the emitted adjacency reads it.
    val width = descentWidth(emb.sparkSession, n)
    val init = topMEdges(scorePairs(initUndir, vecs)
        .repartition(width, col("src")), buildK)
      .withColumn("_new", lit(true))
    val (b, bRdd, stats) = runDescent(init, vecs, buildK, maxList, iters,
      convergeTol, width)
    (emitScored(b, bRdd, ring, vecs, m), stats)
  }

  /** Width for the descent's merge-cut repartition, sized by PAIR
    * volume: round 1 proposes up to n·maxList²/2 scored pairs (82M at
    * the 20× rehearsal's n=40k), and pushing that into a TopKAgg at
    * the session default (32 partitions locally) put ~2.5M rows per
    * task through the agg's sort-based fallback — measured borderline
    * on an 8 GB driver (two of three 20× graphbuild runs OOM'd in the
    * round-1 TopKAgg; the third passed). ~n/256 partitions (clamped
    * to [session default, 512]) keeps per-task state bounded as n
    * grows — the same rows-per-task discipline a 1000-executor run
    * needs, applied locally. Applied as an EXPLICIT repartition on
    * the one pair-volume DataFrame per round (see [[descentRound]]),
    * never by mutating the session-global shuffle-partitions conf: a
    * streaming maintenance trigger running concurrently on the same
    * SparkSession must not observe a build's override, and two
    * overlapping builds must not race a save/restore (ADVICE r16).
    */
  private def descentWidth(spark: SparkSession, n: Long): Int =
    math.max(spark.sessionState.conf.numShufflePartitions,
      math.min(512L, n / 256L).toInt)

  /** The shared NN-descent round loop over an initial (src, nb, _c,
    * _new) edge table — [[buildWithStats]] seeds it from ring ∪ LSH
    * (all new), [[buildWarmWithStats]] from a prior adjacency (only
    * Δ-touching edges new). Returns the final internal-K table, its
    * snapshot RDD handle (released by [[emitScored]]'s final swap),
    * and the per-round convergence stats.
    */
  private def runDescent(init: DataFrame, vecs: DataFrame, buildK: Int,
      maxList: Int, iters: Int, convergeTol: Double, width: Int = 0)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row],
        Seq[BuildRound]) = {
    var (b, bRdd) = graft.operators.Snapshots.checkpointRound(init, None)
    val stats = scala.collection.mutable.ArrayBuffer.empty[BuildRound]
    var round = 1
    var converged = false
    while (round <= iters && !converged) {
      val next = descentRound(b, vecs, buildK, maxList, width)
      val newIdx = next.schema.fieldIndex("_new")
      val (df, rdd, freshN) = graft.operators.Snapshots.checkpointRoundCounted(
        next, Some(bRdd), r => r.getBoolean(newIdx))
      b = df; bRdd = rdd
      val total = rdd.count() // cached blocks — a metadata-cheap action
      stats += BuildRound(round, freshN, total)
      converged = freshN <= convergeTol * total
      round += 1
    }
    (b, bRdd, stats.toSeq)
  }

  /** Emit the SCORED adjacency from the final internal-K table: the
    * best m of each node's list (with its cosine — the `_c` column
    * [[capDegree]] cuts on, r15 verdict next-round #1) ∪ the scored
    * ring links, symmetric. The emit is snapshot through one final
    * [[graft.operators.Snapshots.checkpointRound]] — this FREES the
    * descent loop's last internal-K round (ADVICE r15 #5: the loop's
    * terminal localCheckpoint previously had no release path) and
    * leaves the bounded emitted adjacency persisted, so walk callers
    * need not re-checkpoint it.
    */
  private def emitScored(b: DataFrame,
      bRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row],
      ring: DataFrame, vecs: DataFrame, m: Int): DataFrame = {
    val fwd = topMEdges(b.select(col("src"), col("nb"), col("_c")), m)
      .unionAll(scoreEdgesAll(ring, vecs))
    // groupBy-max over the symmetric union: the cosine is direction-
    // free so duplicates agree; max() drops a ring edge's null score
    // when the kNN cut scored the same edge
    val adj = fwd
      .unionAll(fwd.select(col("nb").as("src"), col("src").as("nb"),
        col("_c")))
      .groupBy(col("src"), col("nb")).agg(max(col("_c")).as("_c"))
    graft.operators.Snapshots.checkpointRound(adj, Some(bRdd))._1
  }

  /** WARM-START rebuild (VERDICT r15 next-round #7): seed the descent
    * from a prior adjacency — typically the current DRIFTED artifact
    * ([[load]] with `maxDegree = 0`) whose lists are mostly right —
    * instead of the cold ring ∪ LSH init, so the convergence-driven
    * rounds terminate in a fraction of a cold build's. `freshIds`
    * marks the ids whose neighborhoods actually changed (the inserted
    * Δ); only seed edges touching one are flagged `new`, so round 1's
    * incremental local join proposes Δ-neighborhood pairs instead of
    * the full corpus's (the Dong et al. WWW 2011 incremental update
    * applied across builds, not just across rounds). With
    * `freshIds = None` every seed edge is new — a full-strength
    * refinement from a better init.
    *
    * Seed edges are RE-SCORED against the current corpus: stale
    * endpoints (ids absent from `emb`) and zero-norm pairs drop out
    * of the init, and the ring is recomputed over the full corpus so
    * navigability holds for nodes the seed missed.
    */
  def buildWarmWithStats(emb: DataFrame, idCol: String, vecCol: String,
      seed: DataFrame, freshIds: Option[DataFrame] = None,
      m: Int = 16, iters: Int = 10, maxList: Int = 64,
      skips: Seq[Int] = Seq(1, 2, 4, 8, 16, 32),
      convergeTol: Double = 0.02): (DataFrame, Seq[BuildRound]) = {
    require(iters >= 0 && m >= 1 && maxList >= m)
    val vecs = emb.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
    val n = emb.count()
    val ring = ringEdges(emb, idCol, skips, n).localCheckpoint()
    val buildK = maxList
    // STORED scores are reused (vectors never change for an existing
    // id — the committed `_c` is still the exact cosine): the warm
    // init's scoring join runs only over the ring and any score-less
    // seed edges, not the whole seed (the r16 20× rehearsal measured
    // the re-score-everything init eating the entire warm saving at a
    // 25% Δ: warm 273 s vs cold 259 s). Stale endpoints (ids absent
    // from `emb` — deletions since the seed was built) drop via two
    // semi-joins, no vectors carried.
    val ids = emb.select(col(idCol).as("_lid")).distinct()
    // a seed obtained from a CAPPED load carries the -2.0 coalesce
    // sentinel where the stored score was null (ADVICE r16): any _c
    // outside the cosine range is not evidence — null it so the pair
    // is RE-SCORED instead of the sentinel ranking in topMEdges cuts
    // (and worse, being committed into the new artifact as a score)
    val seedC =
      if (seed.columns.contains("_c"))
        seed.select(col("src"), col("nb"),
          when(col("_c").cast("double") < -1.0, lit(null).cast("double"))
            .otherwise(col("_c").cast("double")).as("_c"))
      else seed.select(col("src"), col("nb"),
        lit(null).cast("double").as("_c"))
    val live = seedC
      .join(ids.select(col("_lid").as("src")), Seq("src"), "left_semi")
      .join(ids.select(col("_lid").as("nb")), Seq("nb"), "left_semi")
      .filter(col("src") =!= col("nb"))
    val undir = live
      .unionAll(ring.select(col("src"), col("nb"),
        lit(null).cast("double").as("_c")))
      .unionAll(live.select(col("nb").as("src"), col("src").as("nb"),
        col("_c")))
      .unionAll(ring.select(col("nb").as("src"), col("src").as("nb"),
        lit(null).cast("double").as("_c")))
      .groupBy(col("src"), col("nb")).agg(max(col("_c")).as("_c"))
    val scored = undir.filter(col("_c").isNotNull)
      .unionAll(scorePairs(
        undir.filter(col("_c").isNull).select(col("src"), col("nb")),
        vecs))
    val flagged = freshIds match {
      case Some(f) =>
        val ids = f.select(col(f.columns.head).as("_fid")).distinct()
          .localCheckpoint()
        scored
          .join(ids.select(col("_fid").as("src"), lit(1).as("_fs")),
            Seq("src"), "left")
          .join(ids.select(col("_fid").as("nb"), lit(1).as("_fn")),
            Seq("nb"), "left")
          .select(col("src"), col("nb"), col("_c"),
            (col("_fs").isNotNull || col("_fn").isNotNull).as("_new"))
      case None => scored.withColumn("_new", lit(true))
    }
    val cut = topMEdges(flagged.select(col("src"), col("nb"), col("_c")),
      buildK)
    val init = cut.join(flagged.select(col("src"), col("nb"), col("_new")),
      Seq("src", "nb"))
    val width = descentWidth(emb.sparkSession, n)
    val (b, bRdd, stats) = runDescent(init, vecs, buildK, maxList, iters,
      convergeTol, width)
    (emitScored(b, bRdd, ring, vecs, m), stats)
  }

  /** The drop-in build face, SIZE-ADAPTIVE (VERDICT r15 next-round
    * #3, the mediaNeardup dispatch precedent): below `exactThreshold`
    * rows the dispatch routes to [[buildExact]] — NN-descent's
    * per-round fixed job cost dominates tiny corpora (the r15 20×
    * rehearsal priced n=2,000 at 356.2 s descent vs 3.6 s exact, and
    * even n≈40,000 at 661 s vs ~150 s: the measured crossover sits
    * above the 65,536 default) — at or above it, the convergence-
    * driven NN-descent ([[buildWithStats]]), whose ~linear growth is
    * the 100 TB path. Both branches emit the same scored symmetric
    * (src, nb, _c) adjacency, snapshot-persisted (walk callers need
    * not re-checkpoint). `exactThreshold = 0` forces descent (the
    * rehearsal's contrast-arm pricing).
    *
    * Default maxList (the internal K): 64 — the r15 20× rehearsal's
    * operating point (recall@10 0.86 at the n/5 serve budget at a
    * build 30% CHEAPER than maxList=48's: wider lists converge in
    * fewer, more effective incremental rounds; 48 plateaued at 0.66).
    */
  def build(emb: DataFrame, idCol: String, vecCol: String, m: Int = 16,
      iters: Int = 10, maxList: Int = 64,
      skips: Seq[Int] = Seq(1, 2, 4, 8, 16, 32),
      lshProjections: Int = 4, lshWindow: Int = 8,
      convergeTol: Double = 0.02,
      exactThreshold: Long = 65536L): DataFrame =
    if (emb.count() <= exactThreshold)
      graft.operators.Snapshots.checkpointRound(
        buildExact(emb, idCol, vecCol, m, bucketBits = 0, skips), None)._1
    else
      buildWithStats(emb, idCol, vecCol, m, iters, maxList, skips,
        lshProjections, lshWindow, convergeTol)._1

  /** EXACT-kNN build — the test-scale contrast arm (the all-pairs
    * cost every graph-index paper amortizes away; kept for recall
    * calibration and the q_eval_ann oracle, whose DuckDB restatement
    * unrolls exactly this). The broadcast of the right side is
    * SIZE-GATED (ADVICE r13): above `maxBroadcastRows` the pair
    * source degrades to a partitioned cartesian product instead of
    * failing on Spark's broadcast cap — but at that size [[build]]
    * is the correct tool. `bucketBits > 0` restricts the kNN to
    * sign-LSH buckets (bounded but measurably recall-lossy on this
    * data — SURVEY r13; superseded by NN-descent).
    */
  def buildExact(emb: DataFrame, idCol: String, vecCol: String, m: Int = 16,
      bucketBits: Int = 0,
      skips: Seq[Int] = Seq(1, 2, 4, 8, 16, 32),
      maxBroadcastRows: Long = 4_000_000L): DataFrame = {
    val cos = VectorOps.cosineFor(emb, vecCol)
    val n = emb.count()
    // the pair source: exact mode (bucketBits <= 0) is a broadcast
    // cross join below the gate — a constant-key equi-join would hash
    // every pair through ONE task (the r13 rehearsal caught the
    // single-thread wall at 20×); the bucketed mode equi-joins on the
    // sign bucket
    val pairs =
      if (bucketBits <= 0) {
        // left side spread across the cluster: a single-file corpus
        // would otherwise drive the whole n² compute from 1 partition.
        // Width is sized by the PAIR volume (~3M pairs per task, min
        // the default parallelism, capped at 4096): at n=40k the r16
        // 20× rehearsal measured 32 partitions = 50M pairs per task,
        // which pushed the downstream TopKAgg into its sort-based
        // fallback and OOM'd an 8 GB heap 2 runs in 3 — with ~75 src
        // groups per task the partial agg also stays hash-based
        // (under the 128-group fallback threshold), so no pair row is
        // ever sorted at all
        val parts = math.max(
          emb.sparkSession.sparkContext.defaultParallelism,
          math.min(4096L, n * n / 3_000_000L).toInt)
        val l = emb.select(col(idCol).as("src"), col(vecCol).as("_lv"))
          .repartition(parts)
        val r = emb.select(col(idCol).as("nb"), col(vecCol).as("_rv"))
        l.crossJoin(if (n <= maxBroadcastRows) broadcast(r) else r)
      } else {
        val l = emb.select(col(idCol).as("src"), col(vecCol).as("_lv"),
          VectorOps.signBucket(col(vecCol), bucketBits).as("_bkt"))
        val r = emb.select(col(idCol).as("nb"), col(vecCol).as("_rv"),
          VectorOps.signBucket(col(vecCol), bucketBits).as("_bkt"))
        l.join(r, Seq("_bkt"))
      }
    // the m-NN cut is a BOUNDED HEAP (TopKAgg: ≤m rows per (src,
    // partition) reach the shuffle, same (cos desc, id) ties as a
    // window), never a row_number window. Null cosines (zero
    // vectors) are filtered: they can never be nearest neighbors.
    val local = pairs
      .filter(col("src") =!= col("nb"))
      .select(col("src"), col("nb"), cos(col("_lv"), col("_rv")).as("_c"))
      .filter(col("_c").isNotNull)
      .groupBy(col("src"))
      .agg(graft.functions.TopKAgg.topK(m)(col("_c"), col("nb")).as("_top"))
      .select(col("src"), explode(col("_top")).as("_hit"))
      .select(col("src"), col("_hit").getField("_2").as("nb"),
        col("_hit").getField("_1").as("_c"))
    val vecs = emb.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
    val fwd = local.unionAll(
      scoreEdgesAll(ringEdges(emb, idCol, skips, n), vecs))
    fwd.unionAll(fwd.select(col("nb").as("src"), col("src").as("nb"),
        col("_c")))
      .groupBy(col("src"), col("nb")).agg(max(col("_c")).as("_c"))
  }

  /** The md5-first entry points — the deterministic stand-in for
    * NSW's random entry. A distributed top-n heap
    * (TakeOrderedAndProject), never a global sort.
    */
  def entryPoints(emb: DataFrame, idCol: String, n: Int): Seq[Long] =
    emb.select(col(idCol)).orderBy(md5Of(col(idCol)), col(idCol))
      .limit(n).collect().map(_.getLong(0)).toSeq

  /** Deterministic BEST-FIRST beam expansion (the NSW search order):
    * each round expands the `beam` best-scoring nodes not yet
    * expanded — over ALL visited nodes, not just the newest batch
    * (batch-local frontiers saturate: a round of duds would end the
    * walk even with promising nodes banked) — then follows the
    * adjacency `hops` hops out from them (VERDICT r14 next-round #2:
    * one driver round per SINGLE hop paid ~fixed job costs that
    * dominated the serve wall; the adjacency join composes, so a
    * round reaches beam × degree^hops candidates for the same fixed
    * cost). Intermediate-hop nodes are expanded in-round — their
    * neighbors are all reached — so only the outermost hop's nodes
    * stay frontier-eligible. Candidates = every id whose exact cosine
    * the walk computed; stops once `budget` ids are visited (checked
    * per round — a round may overshoot by its own expansion, up to
    * beam × degree^hops), the reachable set is exhausted, or
    * `maxRounds` rounds ran. All collects are budget-bounded.
    *
    * This is the SINGLE-PROBE face (~2 jobs per round); a query batch
    * goes through [[probeJoin]], which runs the same walk for every
    * query in shared per-round plans. The two faces implement the
    * SAME walk — keep any semantic change mirrored (probeJoin ≡
    * per-query [[topK]] is spec-pinned).
    */
  def searchCandidates(adj: DataFrame, emb: DataFrame, idCol: String,
      vecCol: String, query: Seq[Float], budget: Int,
      entries: Int = 8, beam: Int = 4, maxRounds: Int = 64,
      hops: Int = 2): Seq[Long] = {
    require(hops >= 1)
    val q = typedlit(query)
    val cos = VectorOps.cosineFor(emb, vecCol)
    def score(ids: Seq[Long]): Seq[(Long, Double)] =
      emb.filter(col(idCol).isin(ids: _*))
        .select(col(idCol), cos(col(vecCol), q).as("_c"))
        .collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toSeq
    val entry = entryPoints(emb, idCol, entries)
    // visitation order preserved for the deterministic return
    val visited = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
    score(entry).foreach { case (id, c) => visited(id) = c }
    val expanded = scala.collection.mutable.HashSet.empty[Long]
    var round = 0
    var exhausted = false
    // stall-adaptive beam ([[escalateBeam]]): doubles whenever a
    // round's progress falls under 16 × beam, so dense-cluster walks
    // reach their budget in O(log) rounds instead of crawling
    var curBeam = beam
    while (visited.size < budget && !exhausted && round < maxRounds) {
      val frontier = visited.toSeq.filterNot(p => expanded(p._1))
        .sortBy { case (id, c) => (-c, id) }.take(curBeam).map(_._1)
      if (frontier.isEmpty) exhausted = true
      else {
        val newly = scala.collection.mutable.LinkedHashSet.empty[Long]
        var cur = frontier
        var h = 0
        while (h < hops && cur.nonEmpty) {
          expanded ++= cur
          val nxt = adj.filter(col("src").isin(cur: _*))
            .select(col("nb")).distinct()
            .collect().map(_.getLong(0))
            .filterNot(id => visited.contains(id) || newly.contains(id))
            .toSeq.sorted
          newly ++= nxt
          cur = nxt
          h += 1
        }
        score(newly.toSeq).foreach { case (id, c) => visited(id) = c }
        curBeam = escalateBeam(curBeam, newly.size.toLong,
          budget.toLong - visited.size)
      }
      round += 1
    }
    visited.keys.toSeq
  }

  /** BATCHED beam search (VERDICT r13 next-round #2, round costs cut
    * per r14 #2) — the [[IvfIndex.probeJoin]]/[[PqIndex.probeJoin]]
    * twin for the graph engine: run [[searchCandidates]]' walk for
    * EVERY query in `queries` simultaneously, as a
    * (query_id, node, cosine, expanded) state TABLE with per-round
    * adjacency/scoring joins shared across the whole batch. Per
    * round: ONE nQ-bounded driver collect (per-query visited +
    * unexpanded counts — budget check and exhaustion in the same job;
    * r14 paid two separate collects) and ONE state materialization;
    * the `hops`-deep expansion composes the adjacency join inside
    * that single round plan, so driver rounds — the fixed-cost term
    * the r14 verdict measured at 82–254 s per 32-query batch at 20× —
    * drop by ~degree^(hops-1)×.
    *
    * Per-query semantics replay [[searchCandidates]] exactly — same
    * entries, same (cosine desc, id) beam ties, same in-round
    * expansion of intermediate hops, same budget/round termination,
    * null cosines banked as -1.0 — so probeJoin ≡ per-query [[topK]]
    * row for row (GraphProbeJoinSpec pins it), with [[topK]]'s one
    * divergence mirrored from the other engines: zero-norm corpus
    * vectors (null cosine) are filtered from the final emit (a
    * retrieval answer with no defined similarity is noise — the
    * q_knn_join convention).
    *
    * `queries` must be BOUNDED (a micro-batch / probe slice): it
    * rides as a broadcast and the per-round state is ≤ nQ × (budget +
    * one round's expansion) rows, round-snapshotted (localCheckpoint)
    * so the iterative plan never re-expands.
    *
    * Output: (query_id, rk, <idCol>, cosine), rk 1-based by
    * (cosine desc, id asc) within each query.
    */
  def probeJoin(adj: DataFrame, emb: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, budget: Int, entries: Int = 8, beam: Int = 4,
      maxRounds: Int = 64, hops: Int = 2): DataFrame = {
    require(hops >= 1)
    val spark = emb.sparkSession
    import spark.implicits._
    // the query slice is BOUNDED by contract — pull it to the driver
    // as a LocalTableScan instead of a localCheckpoint (whose blocks
    // have no release path through the Dataset handle and accumulate
    // across a long probe stream — ADVICE r15 #5)
    val qSel = queries.select(col(qIdCol).as("query_id"),
      col(qVecCol).as("_qv"))
    val qRows = qSel.collect()
    val q = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qSel.schema)
    val qIds = qRows.map(_.getLong(0))
    if (qIds.isEmpty)
      return spark.range(0).select(col("id").as("query_id"),
        col("id").as("rk"), col("id").as(idCol),
        col("id").cast("double").as("cosine"))
    val cos = VectorOps.cosineFor(emb, vecCol)
    // score a bounded (query_id, id) set: ids semi-join the corpus
    // (broadcast — the set is ≤ nQ × round fan-out), queries ride the
    // broadcast too; null cosine banked as -1.0 (the searchCandidates
    // rule: a zero vector sorts last but stays visited)
    def score(pairs: DataFrame): DataFrame =
      emb.join(broadcast(pairs.select(col("query_id"), col(idCol))),
          Seq(idCol))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col(idCol),
          coalesce(cos(col(vecCol), col("_qv")), lit(-1.0)).as("_c"))
    val entry = entryPoints(emb, idCol, entries)
    // one state table: (query_id, id, _c, _exp) — _exp marks nodes
    // whose neighbors were already followed. Each round materializes
    // through ONE fused job (Snapshots.checkpointRoundKeyed): the
    // snapshot — releasable blocks, truncated lineage — AND the
    // per-query (visited, unexpanded) stats the budget / exhaustion /
    // escalation decisions read, so a round pays a single driver job
    // of fixed cost (the term that dominates the serve wall)
    def snap(df: DataFrame,
        prev: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]) = {
      val qi = df.schema.fieldIndex("query_id")
      val ei = df.schema.fieldIndex("_exp")
      graft.operators.Snapshots.checkpointRoundKeyed(df, prev,
        r => r.getLong(qi), r => r.getBoolean(ei))
    }
    var (state, stateRdd, statsMap) = snap(
      score(qIds.toSeq.flatMap(qid => entry.map(e => (qid, e)))
        .toDF("query_id", idCol))
        .withColumn("_exp", lit(false)), None)
    var round = 0
    var anyActive = true
    // per-query stall-adaptive beam — the [[escalateBeam]] trajectory,
    // driven by the same per-round visited growth the single-probe
    // face sees (growth = Δ of the per-query visited count)
    val beamOf = scala.collection.mutable.HashMap.empty[Long, Int]
    qIds.foreach(q => beamOf(q) = beam)
    val prevN = scala.collection.mutable.HashMap.empty[Long, Long]
    while (anyActive && round < maxRounds) {
      statsMap.foreach { case (qid, (nV, _)) =>
        prevN.get(qid).foreach(p =>
          beamOf(qid) = escalateBeam(beamOf(qid), nV - p, budget.toLong - nV))
        prevN(qid) = nV
      }
      val active = statsMap.toSeq.collect {
        case (qid, (n, u)) if n < budget && u > 0 => qid
      }.sorted
      anyActive = active.nonEmpty
      if (anyActive) {
        val activeDf = broadcast(active.toSeq.toDF("query_id"))
        val beamDf = broadcast(active.toSeq.map(q => (q, beamOf(q)))
          .toDF("query_id", "_bm"))
        val wBeam = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("_c").desc, col(idCol).asc)
        val frontier = state
          .filter(!col("_exp"))
          .join(activeDf, Seq("query_id"), "left_semi")
          .withColumn("_rn", row_number().over(wBeam))
          .join(beamDf, Seq("query_id"))
          .filter(col("_rn") <= col("_bm"))
          .select(col("query_id"), col(idCol))
        // hops-deep expansion inside ONE round plan: level h's new
        // ids are the adjacency image of level h-1, minus everything
        // already reached; every level but the outermost is expanded
        // in-round (its neighbors are all reached) — mirror of the
        // searchCandidates loop. Each level joins a FRESH alias of
        // the adjacency (the same table appears `hops` times in one
        // plan — unqualified refs would be ambiguous self-joins).
        var levels = Vector.empty[DataFrame]
        var cur = frontier
        for (h <- 1 to hops) {
          val reached = levels.foldLeft(
            state.select(col("query_id"), col(idCol)))(_ unionAll _)
          val a = s"_adj$h"; val c = s"_cur$h"
          val nxt = cur.as(c)
            .join(adj.as(a), col(s"$c.$idCol") === col(s"$a.src"))
            .select(col(s"$c.query_id").as("query_id"),
              col(s"$a.nb").as(idCol)).distinct()
            .join(reached, Seq("query_id", idCol), "left_anti")
          levels :+= nxt
          cur = nxt
        }
        val scored = levels.zipWithIndex.map { case (lvl, i) =>
          // levels 0..hops-2 are expanded in-round; the last is not
          score(lvl).withColumn("_exp", lit(i < hops - 1))
        }.reduce(_ unionAll _)
        val next = state
          .join(frontier.withColumn("_f", lit(1)), Seq("query_id", idCol),
            "left")
          .select(col("query_id"), col(idCol), col("_c"),
            (col("_exp") || col("_f").isNotNull).as("_exp"))
          .unionAll(scored)
        val (df, rdd, st) = snap(next, Some(stateRdd))
        state = df; stateRdd = rdd; statsMap = st
      }
      round += 1
    }
    // exact re-rank of each query's visited set — recomputed through
    // the same kernel (the -1.0 null banking must not leak into the
    // emitted cosine), nulls filtered (the probeJoin emit convention)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    val out = emb.join(broadcast(state.select(col("query_id"), col(idCol))),
        Seq(idCol))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col(idCol),
        cos(col(vecCol), col("_qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
      .withColumn("rk", row_number().over(wq).cast("long"))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col(idCol), col("cosine"))
    // the emit is ≤ nQ × k rows — materialize it locally so the FINAL
    // round's snapshot RDD can be RELEASED here instead of relying on
    // GC + ContextCleaner (ADVICE r15 #5: one probeJoin per trigger
    // across a long maintenance stream leaked one terminal state table
    // per trigger, the indirect-release failure mode the r15 OOM
    // postmortem found unreliable)
    val outRows = out.collect()
    stateRdd.unpersist(blocking = false)
    spark.createDataFrame(java.util.Arrays.asList(outRows: _*), out.schema)
  }

  // ----------------------------------------------------- durable artifact

  /** Persist the adjacency artifact — the serving structure a graph
    * index amortizes per retrain — in the MANIFEST-POOL layout
    * ([[IvfIndex.save]]'s protocol): edge rows land in an immutable
    * pool dir and the committed generation holds an `adj_dirs`
    * manifest of (ord, root-relative dir) rows, so [[insertPublish]]
    * can pass the frozen parts between generations BY REFERENCE. A
    * rebuild racing a concurrent [[load]] is never read torn; the
    * previous generation stays for in-flight readers. `stats` (from
    * [[buildWithStats]]) commits the build's convergence trajectory
    * into the generation — [[convergence]] reads it back.
    */
  def save(adj: DataFrame, path: String,
      stats: Seq[BuildRound] = Nil): Unit = {
    val spark = adj.sparkSession
    val pool = graft.tools.Artifacts.newPoolDir(path)
    adj.write.mode("overwrite").parquet(pool)
    publishGen(spark, path, Seq(pool), vecDirs = None, stats = stats)
  }

  /** [[save]] plus the CORPUS VECTORS in the same committed
    * generation (`vec_dirs` manifest) — the self-contained serving
    * artifact: [[loadVectors]] returns the embedding side, so the
    * streaming maintenance loop ([[graft.streaming.IndexMaintStream]]
    * Kind.Graph) and any probe can serve from the artifact alone,
    * the IVF/PQ corpus-in-artifact shape. Adjacency-only artifacts
    * ([[save]]) stay valid — their callers pass the corpus
    * explicitly.
    */
  def saveWithVectors(adj: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, path: String, stats: Seq[BuildRound] = Nil,
      tag: Option[String] = None): Unit = {
    val spark = adj.sparkSession
    val pool = graft.tools.Artifacts.newPoolDir(path)
    adj.write.mode("overwrite").parquet(pool)
    val vpool = graft.tools.Artifacts.newPoolDir(path)
    vectors.select(col(idCol), col(vecCol))
      .write.mode("overwrite").parquet(vpool)
    publishGen(spark, path, Seq(pool), vecDirs = Some(Seq(vpool)),
      stats = stats, tag = tag)
  }

  /** One generation publish: adjacency (+ optional vector) manifests,
    * build stats, tombstones carried forward from `carryFrom` (minus
    * files the caller already folded), and the optional idempotency
    * `tag` — then pool prune against every committed generation's
    * referenced dirs. `carryStatsFrom` keeps the last build's
    * convergence trajectory readable across Δ publishes (a Δ insert
    * doesn't re-run descent; the cadence signal is the last BUILD's).
    */
  private def publishGen(spark: SparkSession, path: String,
      adjDirs: Seq[String], vecDirs: Option[Seq[String]],
      carryFrom: Option[(String, Set[String])] = None,
      tag: Option[String] = None,
      stats: Seq[BuildRound] = Nil): Unit = {
    import spark.implicits._
    graft.tools.Artifacts.publish(spark, path) { gen =>
      graft.tools.Artifacts.writeDirManifest(spark, gen, "adj_dirs",
        path, adjDirs)
      vecDirs.foreach(vd => graft.tools.Artifacts.writeDirManifest(spark,
        gen, "vec_dirs", path, vd))
      carryFrom.foreach { case (parent, folded) =>
        graft.tools.Artifacts.carryTombstones(spark, gen, parent, folded)
        // convergence stats travel with the generation until a new
        // build overwrites them — copied as parquet bytes, not through
        // a Spark read+write job pair (optimization r17)
        if (stats.isEmpty &&
            graft.tools.Artifacts.exists(spark, s"$parent/build_stats"))
          graft.tools.Artifacts.copyGenFile(spark, parent, gen,
            "build_stats")
      }
      if (stats.nonEmpty)
        stats.map(s => (s.round, s.freshEdges, s.totalEdges))
          .toDF("round", "fresh_edges", "total_edges")
          .repartition(1).write.mode("overwrite")
          .parquet(s"$gen/build_stats")
      tag.foreach(t => graft.tools.Artifacts.writeTag(spark, gen, t))
    }
    val referenced = graft.tools.Artifacts.committedGens(spark, path)
      .flatMap(g => adjDirsOf(spark, path, g) ++ vecDirsOf(spark, path, g))
    graft.tools.Artifacts.prunePool(spark, path, referenced)
  }

  /** The generation's adjacency dirs in PUBLISH ORDER (the `ord`
    * column, not lexical dir names — ADVICE r13 on the IVF manifest);
    * pre-r14 layouts (adjacency inside the generation) fall back to
    * `gen/adj`.
    */
  private[graft] def adjDirsOf(spark: SparkSession, root: String,
      gen: String): Seq[String] =
    graft.tools.Artifacts.readDirManifest(spark, root, gen,
      "adj_dirs", "adj")

  /** The generation's vector dirs (publish order) — empty when the
    * artifact is adjacency-only.
    */
  private[graft] def vecDirsOf(spark: SparkSession, root: String,
      gen: String): Seq[String] =
    if (!graft.tools.Artifacts.exists(spark, s"$gen/vec_dirs")) Nil
    else graft.tools.Artifacts.readDirManifest(spark, root, gen,
      "vec_dirs", "vec")

  private def tombstonesOf(spark: SparkSession,
      gen: String): Option[DataFrame] =
    if (graft.tools.Artifacts.exists(spark, s"$gen/tombstones"))
      Some(spark.read.parquet(s"$gen/tombstones"))
    else None

  /** Per-src degree cap by STORED edge score — the serve-cost bound
    * between rebuilds (VERDICT r15 next-round #1, the round's one
    * weak): cut each node's list to its `maxDegree` best edges by
    * (_c desc, nb asc) through the bounded TopKAgg heap (≤maxDegree
    * rows per (src, partition) reach the shuffle — a WindowGroupLimit
    * shape, never a full-list sort), so maintenance-grown hubs
    * ([[insertPublish]] never re-prunes) cannot soak beam budget at
    * degree^hops per expansion. No file is rewritten — the cut is a
    * read-side view, so it works on already-published artifacts.
    * Null scores (zero-norm ring edges) coalesce to -2.0 and are cut
    * first. FALLBACK: an adjacency with no `_c` column at all (in
    * memory from a pre-r16 caller) passes through uncut — scores are
    * the cut's ranking evidence and pre-score edges carry none.
    */
  def capDegree(adj: DataFrame, maxDegree: Int): DataFrame =
    if (maxDegree <= 0 || !adj.columns.contains("_c")) adj
    else topMEdges(adj.select(col("src"), col("nb"),
      coalesce(col("_c"), lit(-2.0)).as("_c")), maxDegree)

  /** Load the committed adjacency. Tombstoned ids (see [[delete]])
    * are anti-joined out on BOTH endpoints: an edge from a deleted
    * node must not seed walks, and an edge TO one is a dangling edge
    * that would waste beam budget on a vector the serve must not
    * return — so a walk over the loaded adjacency never reaches a
    * deleted id at all (serve ≡ the same walk with the ids absent).
    *
    * `maxDegree` (default [[DefaultServeDegreeCap]]) applies
    * [[capDegree]] on the way out — the serving read; pass 0 for the
    * RAW adjacency (the [[skewRatio]]/[[occupancy]] drift observables
    * must see true degree growth, and [[compact]]/rebuild seeds want
    * every edge). Pre-r16 score-less generations load uncut (mixed
    * generations score what they can: legacy dirs contribute
    * null-score edges, cut last).
    */
  def load(spark: SparkSession, path: String,
      maxDegree: Int = DefaultServeDegreeCap): DataFrame = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val dirs = adjDirsOf(spark, path, gen)
    var anyScored = false
    val raw = dirs.map { d =>
      val df = spark.read.parquet(d)
      if (df.columns.contains("_c")) {
        anyScored = true
        df.select(col("src"), col("nb"), col("_c").cast("double"))
      } else df.select(col("src"), col("nb"),
        lit(null).cast("double").as("_c"))
    }.reduce(_ unionAll _)
    val live = tombstonesOf(spark, gen) match {
      case Some(t) =>
        val ts = t.select(col("id")).localCheckpoint()
        raw.join(ts, raw("src") === ts("id"), "left_anti")
          .join(ts, raw("nb") === ts("id"), "left_anti")
      case None => raw
    }
    // a fully score-less (pre-r16) artifact carries no ranking
    // evidence — cutting on it would drop arbitrary edges
    if (!anyScored || maxDegree <= 0) live
    else {
      // one-aggregate guard (VERDICT r16 next-round #2): when no list
      // exceeds the cap — every FRESH build, whose degree is ~m·2 +
      // ring·2 ≈ 44 — the cut is a no-op, but a lazy capDegree view
      // would re-run its TopKAgg on every downstream walk round; one
      // cheap degree aggregate here lets such reads serve the RAW
      // pushdown-filtered scan instead. Maintenance-grown artifacts
      // (some degree > cap) pay the cap as before.
      val maxDeg = live.groupBy(col("src")).agg(count(lit(1)).as("_d"))
        .agg(max(col("_d"))).collect()(0)
      if (!maxDeg.isNullAt(0) && maxDeg.getLong(0) <= maxDegree) live
      else capDegree(live, maxDegree)
    }
  }

  /** The committed corpus vectors, when the artifact carries them
    * ([[saveWithVectors]]); tombstoned ids excluded — the embedding
    * side a self-contained probe serves from.
    */
  def loadVectors(spark: SparkSession, path: String): Option[DataFrame] = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val dirs = vecDirsOf(spark, path, gen)
    if (dirs.isEmpty) None
    else {
      val raw = dirs.map(spark.read.parquet(_)).reduce(_ unionAll _)
      Some(tombstonesOf(spark, gen) match {
        case Some(t) =>
          val ts = t.select(col("id")).localCheckpoint()
          raw.join(ts, raw(raw.columns.head) === ts("id"), "left_anti")
        case None => raw
      })
    }
  }

  /** Logical delete — the retraction half of graph-index maintenance
    * (VERDICT r14 next-round #4; the other four serving indexes'
    * exact protocol): append ids to the current generation's
    * tombstone sidecar, touch no adjacency or vector file
    * (spec-asserted). [[load]]/[[loadVectors]] anti-join the bounded
    * deleted-id set, so a probe over the loaded index equals a probe
    * over the same graph with the deleted nodes and every edge
    * touching them absent. Cost ∝ |ids|; [[compact]] folds the
    * sidecar in on the retrain cadence. A tombstoned id stays deleted
    * until compaction — maintenance publishes ([[insertPublish]])
    * carry the sidecar forward.
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").parquet(
        s"${graft.tools.Artifacts.requireGen(spark, path)}/tombstones")

  /** Fold tombstones into the layout AND collapse the manifests:
    * rewrite the adjacency minus every edge touching a snapshotted
    * tombstone id (dangling edges OUT — the beam-budget waste the
    * r14 verdict named) and the vectors minus the ids into ONE fresh
    * pool dir each, publish a new generation pointing at them. The
    * tombstone snapshot is FILE-level (the
    * [[graft.tools.Artifacts.foldTombstones]] protocol): a delete()
    * landing mid-compact is carried forward into the new generation's
    * sidecar instead of being resurrected or lost.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val snapFiles = graft.tools.Artifacts.tombstoneFiles(spark, gen)
    val snap =
      if (snapFiles.isEmpty) None
      else Some(spark.read.parquet(snapFiles.toSeq: _*)
        .select(col("id")).localCheckpoint())
    // normalize mixed generations (a pre-r16 score-less build dir +
    // post-r16 scored Δ dirs) to the scored schema before the union —
    // but ONLY when at least one source dir is scored (ADVICE r16
    // medium): a fully score-less artifact must compact to the
    // score-less schema, or the rewritten all-null `_c` column would
    // make [[load]] apply [[capDegree]] with zero ranking evidence
    // (every edge at the -2.0 sentinel, lists cut arbitrarily by id) —
    // exactly the legacy-drift case the uncut fallback protects.
    val dirDfs = adjDirsOf(spark, gen = gen, root = path)
      .map(spark.read.parquet(_))
    val anyScored = dirDfs.exists(_.columns.contains("_c"))
    val rawAdj = dirDfs.map { df =>
      if (!anyScored) df.select(col("src"), col("nb"))
      else if (df.columns.contains("_c"))
        df.select(col("src"), col("nb"), col("_c").cast("double"))
      else df.select(col("src"), col("nb"),
        lit(null).cast("double").as("_c"))
    }.reduce(_ unionAll _)
    val foldedAdj = snap match {
      case Some(ts) =>
        rawAdj.join(ts, rawAdj("src") === ts("id"), "left_anti")
          .join(ts, rawAdj("nb") === ts("id"), "left_anti")
      case None => rawAdj
    }
    val pool = graft.tools.Artifacts.newPoolDir(path)
    foldedAdj.write.parquet(pool)
    val vDirs = vecDirsOf(spark, path, gen)
    val newVecDirs =
      if (vDirs.isEmpty) None
      else {
        val rawV = vDirs.map(spark.read.parquet(_)).reduce(_ unionAll _)
        val foldedV = snap match {
          case Some(ts) =>
            rawV.join(ts, rawV(rawV.columns.head) === ts("id"), "left_anti")
          case None => rawV
        }
        val vpool = graft.tools.Artifacts.newPoolDir(path)
        foldedV.write.parquet(vpool)
        Some(Seq(vpool))
      }
    publishGen(spark, path, Seq(pool), newVecDirs,
      carryFrom = Some((gen, snapFiles)))
  }

  /** Δ MAINTENANCE — the NSW add-node walk, batched and
    * generation-published (VERDICT r13 next-round #3). Each new
    * vector beam-searches its approximate m nearest over the CURRENT
    * committed adjacency + `corpus` ([[probeJoin]], so the whole Δ
    * batch walks in shared per-round plans), plus the pairs WITHIN
    * the Δ batch (sequential NSW inserts may link to each other) —
    * exact Δ² below `maxBroadcastRows`, the LSH-bucketed linear pair
    * source above it (the [[buildExact]] gate mirrored — VERDICT r14
    * #6: an unboundedly large Δ must degrade to approximate Δ-internal
    * links, never an n² surprise). Links land SYMMETRIC — the reverse
    * edges are exactly the "mutates existing nodes' edge lists" step,
    * expressed as row ADDITIONS to a fresh pool dir: the edge-table
    * representation means no existing file is ever rewritten
    * (spec-asserted), and the new generation's manifest = parent dirs
    * + the Δ dir. Tombstones carry forward — a deleted id stays
    * deleted across inserts. Write cost ∝ Δ.
    *
    * When the artifact carries its corpus ([[saveWithVectors]]), the
    * Δ vectors are ALSO appended (fresh vector pool dir) so
    * [[loadVectors]] serves corpus ∪ Δ — and the `corpus` argument
    * may be [[loadVectors]]' result. `tag` is the exactly-once
    * idempotency stamp for streaming triggers
    * ([[graft.tools.Artifacts.writeTag]]).
    *
    * Honest divergences from a rebuild (the contract
    * GraphIndexInsertSpec pins): inserted nodes get their
    * beam-found approximate kNN (not the NN-descent-refined edges),
    * old nodes' STORED lists GROW by the reverse links rather than
    * being re-cut at m — but the SERVE path is insulated: every edge
    * lands scored and [[load]]'s default [[capDegree]] cuts each list
    * back to the best [[DefaultServeDegreeCap]] at read time (VERDICT
    * r15 #1 — uncapped, one drifted Δ batch ballooned the serve wall
    * 16 → 123 s), so between rebuilds serve cost is bounded while RAW
    * degree drift stays visible to [[skewRatio]] (the retrain-cadence
    * observable, the frozen-centroid economics of IVF/PQ). Ring
    * positions are NOT recomputed (new nodes are reachable through
    * their reverse links; a retrain [[build]] re-rings). Serving
    * after an insert must pass corpus ∪ Δ as the embedding side.
    *
    * `budget` is the per-new-node search breadth — HNSW's
    * efConstruction, a CONSTANT independent of corpus size (the whole
    * point: insert cost is O(|Δ| · budget), never corpus-shaped).
    * Link quality compounds into serve recall, so budget sits well
    * above the serve-time beam budget; on near-random fixtures (no
    * manifold locality) recall tracks the VISITED FRACTION instead,
    * and GraphIndexInsertSpec passes a generous explicit budget while
    * pinning the contract (insert-then-serve within 0.1 recall of a
    * rebuild).
    */
  def insertPublish(spark: SparkSession, path: String, corpus: DataFrame,
      newVectors: DataFrame, idCol: String, vecCol: String, m: Int = 16,
      budget: Int = 400, entries: Int = 8, beam: Int = 4,
      maxBroadcastRows: Long = 4_000_000L,
      tag: Option[String] = None,
      maxProbeBatch: Int = 0): Unit = {
    // the walk reads the CAPPED serving adjacency (load's default):
    // insert cost under drift stays bounded by the cap, not by
    // accumulated hub degree
    val adj = load(spark, path)
    val newV = newVectors.select(col(idCol), col(vecCol)).localCheckpoint()
    val dN = newV.count()
    if (dN == 0L) return
    // probeJoin's contract requires a BOUNDED query slice (it
    // broadcasts the batch and does nQ-scale driver collects per
    // round) — an oversized Δ is chunked through it in probe-batch
    // slices and the results unioned (ADVICE r15 #2: the
    // maxBroadcastRows gate below only degraded the Δ×Δ pair source;
    // the same Δ flowed into the walk whole). The chunk is sized from
    // the WALK BUDGET (ADVICE r16): probeJoin's per-round state is
    // ~nQ × budget rows, force-broadcast at the final emit — a fixed
    // 65,536-query chunk at budget=400 meant ~26M-row state on the
    // 8 GB driver profile. ~3.2M state rows per chunk keeps the
    // broadcast and the ≤nQ×k collect bounded regardless of budget
    // (8,000 queries per chunk at the default budget=400).
    // maxProbeBatch > 0 overrides (tests pin chunk-split invariance).
    val chunkRows =
      if (maxProbeBatch > 0) maxProbeBatch.toLong
      else math.max(1024L, 3_200_000L / math.max(1, budget))
    val nChunks = ((dN + chunkRows - 1) / chunkRows).max(1L)
    val oldCand = (0L until nChunks).map { c =>
      val slice = if (nChunks == 1L) newV
        else newV.filter(pmod(xxhash64(col(idCol)), lit(nChunks)) === c)
      probeJoin(adj, corpus, idCol, vecCol,
        slice, idCol, vecCol, k = m, budget = budget,
        entries = entries, beam = beam)
        .select(col("query_id").as("src"), col(idCol).as("nb"),
          col("cosine").as("_c"))
    }.reduce(_ unionAll _)
    // Δ-internal pairs: exact Δ×Δ below the broadcast gate; above it
    // the LSH-bucketed linear pair source (approximate — the same
    // locality-biased candidates the build seeds from), never an
    // ungated n² (VERDICT r14 what's-wrong #3a)
    val dvecs = newV.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
    val newNew =
      if (dN <= maxBroadcastRows) {
        val l = newV.select(col(idCol).as("src"), col(vecCol).as("_lv"))
        val r = newV.select(col(idCol).as("nb"), col(vecCol).as("_rv"))
        val cos = VectorOps.cosineFor(newV, vecCol)
        l.crossJoin(broadcast(r))
          .filter(col("src") =!= col("nb"))
          .select(col("src"), col("nb"),
            cos(col("_lv"), col("_rv")).as("_c"))
          .filter(col("_c").isNotNull)
      } else {
        val dim = newV.select(size(col(vecCol))).limit(1).collect()
          .headOption.map(_.getInt(0)).getOrElse(0)
        val pairs = lshInitPairs(dvecs, dN, dim, nProj = 4, w = 8)
          .filter(col("src") =!= col("nb"))
        val sym = pairs.unionAll(
          pairs.select(col("nb").as("src"), col("src").as("nb")))
          .distinct()
        scorePairs(sym, dvecs)
      }
    // Δ edges land SCORED (the capDegree ranking evidence): the
    // forward links carry their walk cosine, the reverse links the
    // same value (cosine is direction-free)
    val links = topMEdges(oldCand.unionAll(newNew), m)
    val delta = links.unionAll(
      links.select(col("nb").as("src"), col("src").as("nb"), col("_c")))
      .groupBy(col("src"), col("nb")).agg(max(col("_c")).as("_c"))
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val pool = graft.tools.Artifacts.newPoolDir(path)
    delta.write.parquet(pool)
    val adjDirs = graft.tools.Artifacts.migrateToPool(spark, path,
      adjDirsOf(spark, path, gen)) :+ pool
    // vector-carrying artifacts append Δ vectors in the same publish
    val vDirs = vecDirsOf(spark, path, gen)
    val newVecDirs =
      if (vDirs.isEmpty) None
      else {
        val vpool = graft.tools.Artifacts.newPoolDir(path)
        newV.write.parquet(vpool)
        Some(graft.tools.Artifacts.migrateToPool(spark, path, vDirs) :+ vpool)
      }
    publishGen(spark, path, adjDirs, newVecDirs,
      carryFrom = Some((gen, Set.empty)), tag = tag)
  }

  /** Self-contained Δ publish for vector-carrying artifacts
    * ([[saveWithVectors]]): the corpus side is read from the artifact
    * itself — the face [[graft.streaming.IndexMaintStream]]'s
    * Kind.Graph drives per trigger.
    */
  def insertPublishSelf(spark: SparkSession, path: String,
      newVectors: DataFrame, idCol: String, vecCol: String, m: Int = 16,
      budget: Int = 400, entries: Int = 8, beam: Int = 4,
      tag: Option[String] = None): Unit = {
    val corpus = loadVectors(spark, path).getOrElse(throw
      new IllegalStateException(
        s"graph artifact at $path carries no vectors (vec_dirs) — " +
          "save it with saveWithVectors, or call insertPublish with an " +
          "explicit corpus"))
      .toDF(idCol, vecCol)
    insertPublish(spark, path, corpus, newVectors, idCol, vecCol, m,
      budget, entries, beam, tag = tag)
  }

  /** The operational RETRAIN face for a vector-carrying artifact —
    * what the skewRatio/convergence cadence triggers call: WARM-START
    * NN-descent ([[buildWarmWithStats]]) seeded from the artifact's
    * own current adjacency (raw view — every stored edge is seed
    * evidence) over its own current corpus ([[loadVectors]], so
    * tombstoned ids are already absent and the rebuild FOLDS deletes
    * — the published generation starts with a clean sidecar), then
    * one atomic generation publish with the fresh convergence stats.
    * `freshIds` narrows round-1's local join to the neighborhoods
    * that actually changed (pass the ids inserted since the last
    * build); None = full-strength refinement from the warm init.
    * Serving reads keep resolving the previous generation until the
    * commit marker lands.
    */
  def rebuildPublish(spark: SparkSession, path: String,
      freshIds: Option[DataFrame] = None, m: Int = 16, iters: Int = 10,
      maxList: Int = 64, skips: Seq[Int] = Seq(1, 2, 4, 8, 16, 32),
      convergeTol: Double = 0.02,
      tag: Option[String] = None): Seq[BuildRound] = {
    val corpus = loadVectors(spark, path).getOrElse(throw
      new IllegalStateException(
        s"graph artifact at $path carries no vectors (vec_dirs) — " +
          "rebuildPublish needs the corpus in the artifact; use " +
          "buildWarmWithStats + saveWithVectors with an explicit corpus"))
    val idCol = corpus.columns(0); val vecCol = corpus.columns(1)
    val seed = load(spark, path, maxDegree = 0)
    val (adj, stats) = buildWarmWithStats(corpus, idCol, vecCol, seed,
      freshIds, m, iters, maxList, skips, convergeTol)
    saveWithVectors(adj, corpus, idCol, vecCol, path, stats, tag)
    stats
  }

  /** Per-round convergence stats committed with the artifact
    * ([[buildWithStats]] → [[save]]) — empty for artifacts published
    * before the observable existed.
    */
  def buildRounds(spark: SparkSession, path: String): Seq[BuildRound] = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    if (!graft.tools.Artifacts.exists(spark, s"$gen/build_stats")) Nil
    else spark.read.parquet(s"$gen/build_stats")
      .orderBy("round").collect()
      .map(r => BuildRound(r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** The committed build's TERMINAL fresh-edge fraction — the cheap
    * convergence observable (VERDICT r14 next-round #1, the
    * [[skewRatio]] pattern): ≈0 means the last build's descent
    * converged (more rounds would not improve the graph); a value
    * near the build's `convergeTol` ceiling means the round cap bound
    * it and a retrain at higher `iters`/`maxList` buys real recall.
    * None when the artifact predates the observable. Bounded: reads
    * the ≤iters-row stats table, never a data scan.
    */
  def convergence(spark: SparkSession, path: String): Option[Double] =
    buildRounds(spark, path).lastOption.map(_.freshFraction)

  /** Degree view of an adjacency: (src, degree) — the graph index's
    * occupancy observable (IvfIndex.occupancy / PqIndex.codeUsage /
    * the blocking indexes' bucket counts are the siblings). Bounded
    * by n rows; one aggregate over the edge scan.
    */
  def occupancy(adj: DataFrame): DataFrame =
    adj.groupBy(col("src")).agg(count(lit(1)).as("degree"))

  /** Navigability-drift diagnostic over [[occupancy]]: max degree /
    * mean degree. ≈1–2 on a healthy build (kNN gives every node m
    * out-edges; reverse links add variance); a hub whose degree
    * balloons is where beam searches converge and recall/latency
    * degrade — the retrain ([[build]] + [[save]]) trigger, the same
    * cadence contract as `IvfIndex.skewRatio`. Inserts without prune
    * ([[insertPublish]]) are the expected driver of drift here.
    */
  def skewRatio(adj: DataFrame): Double = {
    val r = occupancy(adj)
      .agg(max(col("degree")).cast("double"), avg(col("degree")))
      .collect()(0)
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 0.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** End-to-end graph top-k: beam candidates, then the exact cosine
    * re-rank of the candidate set via a broadcast semi join — output
    * schema matches [[Similarity.bruteForceTopK]] ((id, cosine), ties
    * by id), the shared four-engine contract.
    */
  def topK(adj: DataFrame, emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, budget: Int, entries: Int = 8,
      beam: Int = 4, hops: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cand =
      searchCandidates(adj, emb, idCol, vecCol, query, budget, entries,
        beam, hops = hops)
        .toDF(idCol)
    val q = typedlit(query)
    val cos = VectorOps.cosineFor(emb, vecCol)
    emb.join(broadcast(cand), Seq(idCol), "left_semi")
      .select(col(idCol), cos(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
