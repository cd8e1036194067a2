package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Build-once / serve-many IVF index — the production half of
  * [[Similarity.ivfTopK]], which (deliberately, for the oracle)
  * retrains its centroids on every call.
  *
  * At corpus scale the clustering is amortized: `build` trains the
  * centroids and assigns every vector its cell ONCE; `save` writes the
  * corpus **partitioned by cell** plus a tiny centroid table; `topK`
  * on a loaded index plans the nProbe cell cut as a PARTITION FILTER —
  * the scan reads only nProbe/nCentroids of the files, which is the
  * entire point of IVF on a 100 TB corpus (spec-asserted via
  * `PartitionFilters` in IvfIndexSpec, the same plan-shape guard
  * PlanSpec uses for the pruned date scan).
  *
  * Centroid training is shared with [[Similarity.ivfTopK]]
  * (deterministic hash-ordered init, fixed Lloyd rounds, decimal-exact
  * means), so a fresh index returns exactly the per-call result.
  */
object IvfIndex {

  /** centroids(i) = cell i's center; `corpus` carries (id, vec, cell).
    * `pruned` is true when `corpus` comes from a cell-partitioned
    * on-disk layout (cell cuts become partition pruning). `cached` is
    * the upstream snapshot [[build]] pinned for its multi-pass
    * training — [[save]] (or [[Index.unpersist]]) releases it.
    */
  final case class Index(centroids: Array[Array[Double]], corpus: DataFrame,
      idCol: String, vecCol: String, pruned: Boolean,
      cached: Option[DataFrame] = None) {
    def unpersist(): Unit = cached.foreach(_.unpersist())
  }

  /** Train centroids and assign cells in one distributed pass.
    * The returned corpus is NOT persisted to disk — call [[save]] for
    * the pruned layout.
    *
    * `work` is cached for the duration (mirroring
    * [[Similarity.ivfTopK]]): training makes iters+1 passes and the
    * assignment one more — uncached, each pass would recompute the
    * upstream embedding pipeline, and a nondeterministic upstream
    * would train and assign on INCONSISTENT snapshots. [[save]]
    * releases the cache after the write; callers that never save must
    * call [[Index.unpersist]] once the corpus is materialized.
    */
  def build(emb: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, iters: Int = 2): Index = {
    val work = emb.select(col(idCol), col(vecCol)).cache()
    val centroids = Similarity.trainCentroids(work, idCol, vecCol, nCentroids, iters)
    Index(centroids,
      work.withColumn("cell", Similarity.cellColumn(col(vecCol), centroids)),
      idCol, vecCol, pruned = false, cached = Some(work))
  }

  /** Persist: corpus partitioned by cell (one directory per cell —
    * the unit of query-time pruning) written into an immutable POOL
    * dir, plus a generation holding the (cell, centroid) table and a
    * `corpus_dirs` manifest pointing at the pool (ADVICE r12: with
    * the corpus INSIDE the generation dir, incremental maintenance
    * either mutated a committed generation in place — torn reads — or
    * had to copy the whole corpus per append; the manifest lets
    * [[appendPublish]] reference the frozen parts by pointer).
    * Releases [[build]]'s training cache once the write completes.
    *
    * ATOMIC PUBLISH (VERDICT r11 next-round #2): the generation is
    * committed by marker ([[graft.tools.Artifacts.publish]]) — a
    * rebuild over a live index can never be read torn (new centroids,
    * old corpus) by a concurrent [[load]], which resolves the last
    * COMMITTED generation. The previous generation and every pool dir
    * it references stay on disk for in-flight readers until the next
    * publish.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.corpus.sparkSession
    val pool = graft.tools.Artifacts.newPoolDir(path)
    try index.corpus.write.mode("overwrite")
      .partitionBy("cell").parquet(pool)
    finally index.unpersist()
    publishGen(spark, path, index.centroids, Seq(pool), carryFrom = None)
  }

  /** One generation write: centroids + the (ord, dir) corpus-dirs
    * manifest (+ tombstones carried forward from `carryFrom`, + the
    * optional idempotency `tag`), then pool prune. Dirs are stored
    * root-relative in PUBLISH ORDER ([[graft.tools.Artifacts
    * .writeDirManifest]]): the layout stays valid when copied or
    * moved, and "the newest dir" is the highest ord — never a lexical
    * sort of random pool tokens (ADVICE r13).
    */
  private def publishGen(spark: SparkSession, path: String,
      centroids: => Array[Array[Double]], corpusDirs: Seq[String],
      carryFrom: Option[(String, Set[String])],
      tag: Option[String] = None,
      copyCentroidsFrom: Option[String] = None): Unit = {
    import spark.implicits._
    graft.tools.Artifacts.publish(spark, path) { gen =>
      // frozen-centroid publishes (append/compact) re-commit the SAME
      // centroid table — copy the parent's parquet bytes instead of
      // paying a Spark write job per trigger (optimization r17)
      copyCentroidsFrom match {
        case Some(parent) =>
          graft.tools.Artifacts.copyGenFile(spark, parent, gen, "centroids")
        case None => centroids.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) }.toSeq
          .toDF("cell", "centroid")
          .repartition(1).write.mode("overwrite").parquet(s"$gen/centroids")
      }
      graft.tools.Artifacts.writeDirManifest(spark, gen, "corpus_dirs",
        path, corpusDirs)
      // tombstones travel with the generation: copy the parent's
      // sidecar files (minus any the caller already folded) so a
      // delete stays deleted across maintenance publishes
      carryFrom.foreach { case (parent, folded) =>
        graft.tools.Artifacts.carryTombstones(spark, gen, parent, folded)
      }
      tag.foreach(t => graft.tools.Artifacts.writeTag(spark, gen, t))
    }
    graft.tools.Artifacts.prunePool(spark, path,
      graft.tools.Artifacts.committedGens(spark, path)
        .flatMap(g => corpusDirsOf(spark, path, g)))
  }

  /** The generation's corpus data dirs in publish order, resolved
    * against `root`; a pre-r13 layout (corpus inside the generation)
    * falls back to `gen/corpus`.
    */
  private[graft] def corpusDirsOf(spark: SparkSession, root: String,
      gen: String): Seq[String] =
    graft.tools.Artifacts.readDirManifest(spark, root, gen,
      "corpus_dirs", "corpus")

  /** The CURRENT committed generation's corpus dirs — the spec-facing
    * physical-layout accessor.
    */
  def corpusDirs(spark: SparkSession, path: String): Seq[String] =
    corpusDirsOf(spark, path,
      graft.tools.Artifacts.requireGen(spark, path))

  private def readCorpus(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map(spark.read.parquet(_)).reduce(_ unionAll _)

  private def centroidsOf(spark: SparkSession,
      gen: String): Array[Array[Double]] =
    spark.read.parquet(s"$gen/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)

  /** Incremental maintenance, IN PLACE: assign ONLY the new vectors to
    * the FROZEN centroid layout and append them to the current
    * generation's newest corpus dir — cost ∝ |newVectors|, never a
    * retrain or corpus re-encode (the `refreshStats`
    * scans-only-what-changed property applied to the vector index;
    * daily ingest on a 100 TB corpus cannot pay a full rebuild per
    * batch). Centroids are read from the saved artifact (nCells×dim
    * values, bounded) and NOT retrained, so cell assignment of the
    * new vectors is the same pure function of (vector, centroids) the
    * original build used: a probe over the appended index is EXACTLY
    * the probe over a rebuild of corpus ∪ Δ at the same centroids
    * (spec-proven in IvfIndexSpec, alongside an old-files-untouched
    * assertion).
    *
    * CONCURRENCY CONTRACT (ADVICE r12 + r13): this mutates committed
    * data — single-writer maintenance only, and a load racing the
    * append may observe part of Δ (never a torn centroids/corpus mix
    * — centroids are untouched). The mutation targets the newest dir
    * EXCLUSIVE to the current generation (post-r13, pool dirs are
    * shared across generations: appending into a shared dir would
    * also widen what a reader pinned to the RETAINED PREVIOUS
    * generation sees — ADVICE r13); when every dir is shared, the
    * append degrades gracefully to one [[appendPublish]] instead.
    * When concurrent probes must see atomic appends — the
    * streaming-maintenance shape — use [[appendPublish]] directly.
    *
    * The layout consequence of freezing: cell occupancy can drift
    * from the trained balance as the distribution shifts — the
    * standard IVF production trade; retrain on a cadence (full
    * [[build]]) when drift materializes, append between cadences.
    */
  def append(spark: SparkSession, path: String, newVectors: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val gens = graft.tools.Artifacts.committedGens(spark, path)
    require(gens.nonEmpty,
      s"no committed index generation under $path — publish (save) first")
    val gen = gens.last
    val curDirs = corpusDirsOf(spark, path, gen)
    val prevDirs = gens.dropRight(1).lastOption
      .map(g => corpusDirsOf(spark, path, g).toSet).getOrElse(Set.empty)
    // newest dir the previous generation does NOT reference — the one
    // place an in-place append is invisible to its pinned readers
    curDirs.filterNot(prevDirs).lastOption match {
      case Some(target) =>
        val centroids = centroidsOf(spark, gen)
        newVectors.select(col(idCol), col(vecCol))
          .withColumn("cell", Similarity.cellColumn(col(vecCol), centroids))
          .write.mode("append").partitionBy("cell").parquet(target)
      case None => appendPublish(spark, path, newVectors, idCol, vecCol)
    }
  }

  /** Incremental maintenance, GENERATION-PUBLISHED (VERDICT r12
    * next-round #3 + ADVICE r12): same frozen-centroid Δ-assignment
    * as [[append]], but the new codes land in a fresh immutable pool
    * dir and a NEW generation is committed whose manifest = the
    * parent's dirs + the Δ dir (tombstones carried forward). Write
    * cost is still ∝ Δ — the frozen parts pass by reference — and a
    * concurrent [[load]] resolves either the parent or the child
    * generation, never a mix and never a partial Δ: the per-trigger
    * ingest loop a serving index runs under live probes
    * (IndexMaintStreamSpec drives it from foreachBatch and asserts
    * mid-stream loads are always complete committed prefixes).
    * Long chains of appends accumulate manifest entries; [[compact]]
    * (or a retrain [[save]]) folds them back to one dir.
    */
  def appendPublish(spark: SparkSession, path: String,
      newVectors: DataFrame, idCol: String, vecCol: String,
      tag: Option[String] = None): Unit = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val centroids = centroidsOf(spark, gen)
    val pool = graft.tools.Artifacts.newPoolDir(path)
    newVectors.select(col(idCol), col(vecCol))
      .withColumn("cell", Similarity.cellColumn(col(vecCol), centroids))
      .write.partitionBy("cell").parquet(pool)
    publishGen(spark, path, centroids,
      graft.tools.Artifacts.migrateToPool(spark, path,
        corpusDirsOf(spark, path, gen)) :+ pool,
      carryFrom = Some((gen, Set.empty)), tag = tag,
      copyCentroidsFrom = Some(gen))
  }

  def load(spark: SparkSession, path: String,
      idCol: String, vecCol: String): Index = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val centroids = centroidsOf(spark, gen)
    val raw = readCorpus(spark, corpusDirsOf(spark, path, gen))
    // tombstone sidecar (if any) consulted at load: probes anti-join
    // the bounded deleted-id set AFTER the cell partition filter (the
    // cell predicate pushes through the anti-join's streamed side, so
    // pruning is intact — IvfIndexSpec asserts PartitionFilters on the
    // deleted index too)
    val corpus = tombstones(spark, gen) match {
      case Some(t) => raw.join(t, raw(idCol) === t("id"), "left_anti")
      case None => raw
    }
    Index(centroids, corpus, idCol, vecCol, pruned = true)
  }

  private def tombstoneFiles(spark: SparkSession, gen: String): Set[String] =
    graft.tools.Artifacts.tombstoneFiles(spark, gen)

  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] =
    if (graft.tools.Artifacts.exists(spark, s"$path/tombstones"))
      Some(spark.read.parquet(s"$path/tombstones"))
    else None

  /** Logical delete — the retraction half of index maintenance
    * ([[append]] is the ingest half): append ids to the current
    * generation's tombstone sidecar, touch no corpus file
    * (spec-asserted). A probe over the loaded index then equals a
    * probe over the SAME frozen centroids with the deleted vectors
    * removed — centroids are deliberately NOT retrained (deletes
    * shift the distribution exactly like appends do; [[skewRatio]]
    * stays the retrain trigger for both). Cost ∝ |ids|; [[compact]]
    * folds the sidecar in on the retrain cadence. A tombstoned id
    * stays deleted until compaction — maintenance publishes
    * ([[appendPublish]]) carry the sidecar forward.
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").parquet(
        s"${graft.tools.Artifacts.requireGen(spark, path)}/tombstones")

  /** Fold tombstones into the layout AND collapse the manifest:
    * rewrite the corpus minus the snapshotted tombstone ids into ONE
    * fresh pool dir, publish a new generation pointing at it. The
    * tombstone snapshot is FILE-level (the
    * [[graft.tools.Artifacts.foldTombstones]] protocol): a delete()
    * landing mid-compact is carried forward into the new generation's
    * sidecar instead of being resurrected or lost. Centroids
    * untouched — compaction is a physical cleanup, not a retrain.
    */
  def compact(spark: SparkSession, path: String,
      idCol: String, vecCol: String): Unit = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val snapFiles = tombstoneFiles(spark, gen)
    val raw = readCorpus(spark, corpusDirsOf(spark, path, gen))
    val folded =
      if (snapFiles.isEmpty) raw
      else {
        val snap = spark.read.parquet(snapFiles.toSeq: _*).localCheckpoint()
        raw.join(snap, raw(idCol) === snap("id"), "left_anti")
      }
    val pool = graft.tools.Artifacts.newPoolDir(path)
    folded.write.partitionBy("cell").parquet(pool)
    publishGen(spark, path, centroidsOf(spark, gen), Seq(pool),
      carryFrom = Some((gen, snapFiles)), copyCentroidsFrom = Some(gen))
  }

  /** The operational RETRAIN face — what the [[skewRatio]] cadence
    * calls (VERDICT r16 next-round #1): re-run Lloyd over the
    * artifact's own CURRENT live corpus (tombstones folded at the
    * file-level snapshot, so the published generation starts with a
    * clean sidecar), re-assign every vector to the fresh centroids,
    * and commit one atomic generation with the optional idempotency
    * `tag`. The centroid count defaults to the committed layout's
    * (`nCentroids = 0`); serving reads keep resolving the previous
    * generation until the commit marker lands. This is the full-build
    * cost by design — the cadence pays it when the frozen structure
    * has drifted past usefulness, never per Δ.
    */
  def rebuildPublish(spark: SparkSession, path: String, idCol: String,
      vecCol: String, nCentroids: Int = 0, iters: Int = 2,
      tag: Option[String] = None): Unit = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val snapFiles = tombstoneFiles(spark, gen)
    val raw = readCorpus(spark, corpusDirsOf(spark, path, gen))
      .select(col(idCol), col(vecCol))
    val live =
      if (snapFiles.isEmpty) raw
      else {
        val snap = spark.read.parquet(snapFiles.toSeq: _*).localCheckpoint()
        raw.join(snap, raw(idCol) === snap("id"), "left_anti")
      }
    val k = if (nCentroids > 0) nCentroids else centroidsOf(spark, gen).length
    val idx = build(live, idCol, vecCol, k, iters)
    val pool = graft.tools.Artifacts.newPoolDir(path)
    try idx.corpus.write.mode("overwrite").partitionBy("cell").parquet(pool)
    finally idx.unpersist()
    publishGen(spark, path, idx.centroids, Seq(pool),
      carryFrom = Some((gen, snapFiles)), tag = tag)
  }

  /** Cell-occupancy view of an index: (cell, n) for every trained
    * cell, including empties — the observable that drives the
    * retrain-vs-append decision for a frozen-centroid index. One
    * cell-domain aggregate (nCentroids rows), never corpus-shaped.
    */
  def occupancy(index: Index): DataFrame = {
    val spark = index.corpus.sparkSession
    import spark.implicits._
    val counted = index.corpus.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
    index.centroids.indices.toDF("cell")
      .join(counted, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Balance diagnostic over [[occupancy]]: (maxCell / mean) — 1.0 is
    * perfect balance; drift under appends shows as this ratio
    * climbing, which degrades probe cost (the biggest cell bounds a
    * probe's worst case) and recall (a bloated cell means its
    * centroid no longer describes its members). Production cadence:
    * append while the ratio holds, full [[build]] retrain when it
    * crosses the caller's threshold (2–4 is the usual band). Bounded:
    * one aggregate over the nCentroids-row occupancy.
    */
  def skewRatio(index: Index): Double = {
    val occ = occupancy(index).agg(
      max(col("n")).cast("double").as("mx"),
      avg(col("n")).as("mean")).collect()(0)
    val mean = occ.getDouble(1)
    if (mean == 0.0) 0.0 else occ.getDouble(0) / mean
  }

  /** Probe COST estimator: the fraction of corpus rows a
    * [[topK]](query, nProbe) call reads — the probed cells' share of
    * [[occupancy]]. On a balanced index this is ≈ nProbe/nCentroids;
    * under drift a query near a bloated frozen cell pays that cell's
    * whole population, which is how skew shows up as per-query cost
    * at scale (the rehearsal's drift section reads this alongside
    * [[skewRatio]]). Bounded: one occupancy aggregate.
    */
  def probedFraction(index: Index, query: Seq[Float], nProbe: Int = 4): Double = {
    val probes =
      Similarity.nearestCentroids(index.centroids, query, nProbe).toSet
    val occ = occupancy(index).collect()
    val total = occ.map(_.getLong(1)).sum
    if (total == 0L) 0.0
    else occ.filter(r => probes.contains(r.getInt(0)))
      .map(_.getLong(1)).sum.toDouble / total
  }

  /** Batched probe — the online-serving twin of [[topK]]: classify a
    * bounded micro-batch of queries against the index in ONE
    * distributed plan instead of a driver-side loop per query (the
    * loop would serialize nQueries jobs; a retrieval service answers
    * a trigger's worth of queries together).
    *
    * Shape at scale: the query side is trigger-bounded and rides as a
    * BROADCAST — first against the nCentroids-row centroid table
    * (per-query nProbe cell cut, batch×nCentroids rows, window
    * ranked), then against the corpus scan. The union of probed cells
    * (≤ nCentroids values, bounded collect) is applied as a STATIC
    * `isin` before the join, so on a loaded index the scan still
    * prunes non-probed cells at the partition level (spec-asserted
    * via PartitionFilters, same guard as the single-query path); the
    * per-query restriction then rides the broadcast-hash join on
    * `cell`. Scoring is the fused native cosine kernel and the
    * per-query top-k is [[graft.functions.TopKAgg]] — at most k rows
    * per (query, partition) reach the shuffle, never the full
    * probed-cells × batch score matrix.
    *
    * Per-query results are a pure function of (query vector, frozen
    * index) — cell distances replay [[Similarity.nearestCentroids]]'
    * exact fold order and (distance, cell) tie rule, scoring and the
    * (cosine desc, id) tie rule replay [[topK]] — so batching (and
    * any micro-batch split of a stream) is invisible: probeJoin of a
    * union ≡ union of probeJoins ≡ per-query [[topK]] (spec-pinned).
    * One deliberate divergence: zero-norm corpus vectors (null
    * cosine) are never answers here — [[topK]]'s `orderBy desc`
    * sorts them last and only surfaces them when a probed cell has
    * fewer than k scoreable candidates; a retrieval answer with no
    * defined similarity is noise, so this path filters them (the
    * q_knn_join convention). On corpora without zero-norm vectors —
    * every real embedding table — the equivalence is exact.
    *
    * Output: (query_id, rk, <idCol>, cosine), rk 1-based by
    * (cosine desc, id asc) within each query; idCol must be integral
    * (the TopKAgg (score, id) contract).
    */
  def probeJoin(index: Index, queries: DataFrame, qIdCol: String,
      qVecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val spark = index.corpus.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("pcell", "pcentroid")
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qvec"))
    // replay Similarity.nearestCell's fold exactly: d accumulates
    // (centroid(i) - query(i))^2 left-to-right from 0.0
    val d2 = aggregate(
      zip_with(col("pcentroid"), col("qvec"),
        (b, a) => (b - a.cast("double")) * (b - a.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d2").asc, col("pcell").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("d2", d2)
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("pcell").as("cell"), col("qvec"))
    // bounded collect (≤ nCentroids ints): the static partition cut
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val pruned =
      if (cells.isEmpty) index.corpus.filter(lit(false)) // empty trigger
      else index.corpus.filter(col("cell").isin(cells: _*))
    val cos = VectorOps.cosineFor(index.corpus, index.vecCol)
    val scored = pruned.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col(index.idCol),
        cos(col(index.vecCol), col("qvec")).as("cosine"))
      .filter(col("cosine").isNotNull)
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(k)(col("cosine"), col(index.idCol)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("hit._2").as(index.idCol), col("hit._1").as("cosine"))
  }

  /** Approximate top-k: scan only the nProbe cells nearest the query.
    * On a loaded index the `cell` predicate is a partition filter —
    * non-probed cells are never read.
    */
  def topK(index: Index, query: Seq[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val probes = Similarity.nearestCentroids(index.centroids, query, nProbe)
    val q = typedlit(query)
    val cos = VectorOps.cosineFor(index.corpus, index.vecCol)
    index.corpus
      .filter(col("cell").isin(probes: _*))
      .select(col(index.idCol), cos(col(index.vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(index.idCol))
      .limit(k)
  }
}
