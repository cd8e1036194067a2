package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Graph-based ANN — the fourth serving engine next to IVF
  * ([[IvfIndex]]), PQ ([[PqIndex]]) and the Matryoshka prefix cut
  * (VERDICT r12 next-round #7): the industry-default navigable-graph
  * family (Malkov/Yashunin's NSW/HNSW line, public literature), built
  * DETERMINISTIC so the recall gate and the exact-scan oracle hold.
  *
  * Structure: each vector keeps its m nearest neighbors (exact kNN
  * edges by default — the navigable core; `bucketBits > 0` restricts
  * the kNN to sign-LSH buckets, the bounded-build approximation whose
  * production form is NN-descent), plus
  * ring skip links at offsets 2^j through the md5 ordering of ids — a
  * deterministic stand-in for NSW's random long-range links
  * (Kleinberg small-world shape), which keeps the graph navigable
  * across buckets. Search is multi-entry BEAM expansion: start at the
  * md5-first entry points, repeatedly fetch the frontier's neighbors,
  * score ONLY those vectors against the query, keep the top-`beam` as
  * the next frontier, and accumulate everything scored as the
  * candidate set; an exact re-rank of the candidates emits the final
  * ranking (the IVF/PQ/MRL serving shape).
  *
  * Scale shape: the adjacency table (n×(m+skips) edge rows) is the
  * serving artifact; per-query work is rounds × beam × degree vector
  * reads — INDEPENDENT of corpus size, the property that makes graph
  * indexes the serving default. The default exact-kNN build is the
  * known-expensive step of every graph index (corpus × corpus per
  * retrain — measured tolerable at the fixture sizes); at 100 TB the
  * build drops to `bucketBits > 0` (all-pairs within a bucket only,
  * n²/2^bits comparisons, recall traded for build cost) or the
  * NN-descent refinement loop from the public literature.
  * Frontier/candidate collects are bounded by `budget` ids.
  *
  * Everything is deterministic: bucket kNN ties by (cosine desc, id),
  * entry points and ring by (md5 hex, id), beam by (cosine desc, id)
  * — so candidates, gate and final ranks replay exactly, at any
  * parallelism.
  */
object GraphIndex {

  private def md5Of(c: org.apache.spark.sql.Column) =
    md5(c.cast("string").cast("binary"))

  /** Deterministic neighbor graph as a symmetric (src, nb) edge
    * table: per-sign-bucket m-NN plus md5-ring skips at `skips`
    * offsets.
    */
  def build(emb: DataFrame, idCol: String, vecCol: String, m: Int = 16,
      bucketBits: Int = 0,
      skips: Seq[Int] = Seq(1, 2, 4, 8, 16, 32)): DataFrame = {
    val cos = VectorOps.cosineFor(emb, vecCol)
    // the pair source: exact mode (bucketBits <= 0) is a BROADCAST
    // cross join — a constant-key equi-join would hash every pair
    // through ONE task (the rehearsal caught the single-thread wall
    // at 20×); the bucketed mode equi-joins on the sign bucket
    val pairs =
      if (bucketBits <= 0) {
        // left side spread across the cluster: a single-file corpus
        // would otherwise drive the whole n² compute from 1 partition
        val l = emb.select(col(idCol).as("src"), col(vecCol).as("_lv"))
          .repartition(emb.sparkSession.sparkContext.defaultParallelism)
        val r = emb.select(col(idCol).as("nb"), col(vecCol).as("_rv"))
        l.crossJoin(broadcast(r))
      } else {
        val l = emb.select(col(idCol).as("src"), col(vecCol).as("_lv"),
          VectorOps.signBucket(col(vecCol), bucketBits).as("_bkt"))
        val r = emb.select(col(idCol).as("nb"), col(vecCol).as("_rv"),
          VectorOps.signBucket(col(vecCol), bucketBits).as("_bkt"))
        l.join(r, Seq("_bkt"))
      }
    // the m-NN cut is a BOUNDED HEAP (TopKAgg: ≤m rows per (src,
    // partition) reach the shuffle, same (cos desc, id) ties as a
    // window), never a row_number window — the window SORTS the full
    // candidate-pair set, which at 20× rehearsal scale meant a
    // 1.6B-row sort the rehearsal caught as a wall. Null cosines
    // (zero vectors) are filtered: they can never be nearest
    // neighbors.
    val local = pairs
      .filter(col("src") =!= col("nb"))
      .select(col("src"), col("nb"), cos(col("_lv"), col("_rv")).as("_c"))
      .filter(col("_c").isNotNull)
      .groupBy(col("src"))
      .agg(graft.functions.TopKAgg.topK(m)(col("_c"), col("nb")).as("_top"))
      .select(col("src"), explode(col("_top")).as("_hit"))
      .select(col("src"), col("_hit").getField("_2").as("nb"))
    val n = emb.count()
    val wPos = Window.orderBy(md5Of(col(idCol)), col(idCol))
    val pos = emb.select(col(idCol))
      .withColumn("_pos", row_number().over(wPos).cast("long") - 1)
    val ring = skips.filter(_ < n).map { off =>
      pos.select(col(idCol).as("src"), ((col("_pos") + off) % n).as("_p2"))
        .join(pos.select(col(idCol).as("nb"), col("_pos").as("_p2")),
          Seq("_p2"))
        .select(col("src"), col("nb"))
    }.reduceOption(_ unionAll _)
      .getOrElse(local.filter(lit(false)))
    val fwd = local.unionAll(ring)
    fwd.unionAll(fwd.select(col("nb").as("src"), col("src").as("nb")))
      .distinct()
  }

  /** The md5-first entry points — the deterministic stand-in for
    * NSW's random entry.
    */
  def entryPoints(emb: DataFrame, idCol: String, n: Int): Seq[Long] =
    emb.select(col(idCol)).orderBy(md5Of(col(idCol)), col(idCol))
      .limit(n).collect().map(_.getLong(0)).toSeq

  /** Deterministic BEST-FIRST beam expansion (the NSW search order):
    * each round expands the `beam` best-scoring nodes not yet
    * expanded — over ALL visited nodes, not just the newest batch
    * (batch-local frontiers saturate: a round of duds would end the
    * walk even with promising nodes banked). Candidates = every id
    * whose exact cosine the walk computed; stops once `budget` ids
    * are visited, the reachable set is exhausted, or `maxRounds`
    * rounds ran. All collects are budget-bounded.
    */
  def searchCandidates(adj: DataFrame, emb: DataFrame, idCol: String,
      vecCol: String, query: Seq[Float], budget: Int,
      entries: Int = 8, beam: Int = 4, maxRounds: Int = 64): Seq[Long] = {
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
    while (visited.size < budget && !exhausted && round < maxRounds) {
      val frontier = visited.toSeq.filterNot(p => expanded(p._1))
        .sortBy { case (id, c) => (-c, id) }.take(beam).map(_._1)
      if (frontier.isEmpty) exhausted = true
      else {
        expanded ++= frontier
        val newIds = adj.filter(col("src").isin(frontier: _*))
          .select(col("nb")).distinct()
          .collect().map(_.getLong(0))
          .filterNot(visited.contains).toSeq.sorted
        score(newIds).foreach { case (id, c) => visited(id) = c }
      }
      round += 1
    }
    visited.keys.toSeq
  }

  /** Persist the adjacency artifact — the serving structure a graph
    * index amortizes per retrain, published by commit marker like the
    * other serving indexes ([[graft.tools.Artifacts.publish]]): a
    * rebuild racing a concurrent [[load]] is never read torn, the
    * previous generation stays for in-flight readers. Incremental
    * INSERT (the NSW add-node walk: beam-search the new vector's
    * neighbors, link, symmetrize) is deliberately not offered yet —
    * unlike the frozen-centroid/frozen-codebook appends of
    * IVF/PQ, a correct graph insert changes EXISTING nodes' edge
    * lists (the reverse links), so the append≡rebuild contract the
    * other indexes spec needs its own design; rebuild on the retrain
    * cadence is the current maintenance story.
    */
  def save(adj: DataFrame, path: String): Unit = {
    val spark = adj.sparkSession
    graft.tools.Artifacts.publish(spark, path) { gen =>
      adj.write.mode("overwrite").parquet(s"$gen/adj")
    }
    ()
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(
      s"${graft.tools.Artifacts.requireGen(spark, path)}/adj")

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
    * cadence contract as `IvfIndex.skewRatio`.
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
      beam: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cand =
      searchCandidates(adj, emb, idCol, vecCol, query, budget, entries, beam)
        .toDF(idCol)
    val q = typedlit(query)
    val cos = VectorOps.cosineFor(emb, vecCol)
    emb.join(broadcast(cand), Seq(idCol), "left_semi")
      .select(col(idCol), cos(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
