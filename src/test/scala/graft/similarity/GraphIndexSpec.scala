package graft.similarity

import graft.SparkTestBase

class GraphIndexSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")

  test("adjacency is deterministic, symmetric, and navigable (one connected component)") {
    val a1 = GraphIndex.build(emb, "vec_id", "embedding")
      .select("src", "nb").as[(Long, Long)].collect().toSet
    val a2 = GraphIndex.build(emb, "vec_id", "embedding")
      .select("src", "nb").as[(Long, Long)].collect().toSet
    assert(a1 == a2, "build is not deterministic")
    assert(a1.forall { case (s, n) => a1((n, s)) }, "adjacency not symmetric")
    // the md5 ring guarantees global navigability: one component
    val edges = a1.toSeq.toDF("a", "b")
    val comps = graft.dedup.ConnectedComponents.componentsAdaptive(edges)
      .select("component").distinct().count()
    assert(comps == 1L, s"graph has $comps components — ring links broken")
    // every node has at least the ring degree, at most m + 2*skips-ish
    val deg = a1.groupBy(_._1).map(_._2.size)
    assert(deg.min >= 2)
  }

  test("durable artifact: save/load round-trip, atomic publish, degree observables") {
    val path = java.nio.file.Files.createTempDirectory("graph_idx").toString
    try {
      val adj = GraphIndex.build(emb, "vec_id", "embedding")
      GraphIndex.save(adj, path)
      // RAW load (maxDegree = 0) round-trips the stored edges exactly;
      // the default serving load applies the degree cap (asserted below)
      val loaded = GraphIndex.load(spark, path, maxDegree = 0)
      assert(loaded.select("src", "nb").as[(Long, Long)].collect().toSet ==
        adj.select("src", "nb").as[(Long, Long)].collect().toSet)
      // the serving view (default cap): per-src degree bounded, and a
      // fresh build passes essentially uncut (degree ~m*2 + ring*2)
      val capped = GraphIndex.load(spark, path)
      val maxDeg = GraphIndex.occupancy(capped)
        .agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.col("degree")))
        .head().getLong(0)
      assert(maxDeg <= GraphIndex.DefaultServeDegreeCap,
        s"capped load left degree $maxDeg > cap")
      // served answers from the loaded artifact = in-memory answers
      val q = emb.filter($"vec_id" === 5).select("embedding").as[Seq[Float]].head()
      val budget = math.max(200L, emb.count() / 5).toInt
      val a = GraphIndex.topK(adj, emb, "vec_id", "embedding", q, 10, budget)
        .as[(Long, Double)].collect().toSeq
      val b = GraphIndex.topK(loaded, emb, "vec_id", "embedding", q, 10, budget)
        .as[(Long, Double)].collect().toSeq
      assert(a == b)
      // observability: every node has a degree row; skew in a sane band
      val occ = GraphIndex.occupancy(loaded)
      assert(occ.count() == emb.count())
      val skew = GraphIndex.skewRatio(loaded)
      assert(skew >= 1.0 && skew < 10.0, s"degree skew $skew")
      // an uncommitted higher generation is invisible to load
      emb.limit(3).select($"vec_id".as("src"), $"vec_id".as("nb"))
        .write.parquet(s"$path/g00000001/adj")
      assert(GraphIndex.load(spark, path).count() == adj.count())
    } finally graft.tools.Scratch.deleteRecursively(new java.io.File(path))
  }

  test("beam search: budget-bounded candidates, deterministic, recall@10 >= 0.8; exact re-rank") {
    val q = emb.filter($"vec_id" === 0).select("embedding").as[Seq[Float]].head()
    val adj = GraphIndex.build(emb, "vec_id", "embedding").cache()
    try {
      val budget = math.max(200L, emb.count() / 5).toInt
      val c1 = GraphIndex.searchCandidates(adj, emb, "vec_id", "embedding",
        q, budget)
      val c2 = GraphIndex.searchCandidates(adj, emb, "vec_id", "embedding",
        q, budget)
      assert(c1 == c2, "search is not deterministic")
      // bounded: can overshoot by at most one round's expansion
      assert(c1.size <= budget + adj.count().toInt, s"candidates ${c1.size}")
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
        .as[(Long, Double)].collect().toSeq
      val recall = c1.toSet.intersect(brute.map(_._1).toSet).size / 10.0
      assert(recall >= 0.8, s"graph recall@10 = $recall")
      // the emitted ranking is the EXACT cosine over candidates
      val got = GraphIndex.topK(adj, emb, "vec_id", "embedding", q,
        k = 10, budget = budget).as[(Long, Double)].collect().toSeq
      val bruteMap = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 1000)
        .as[(Long, Double)].collect().toMap
      got.foreach { case (id, c) => assert(c == bruteMap(id)) }
      assert(got.head._1 == 0L, "self-query should rank itself first")
    } finally { adj.unpersist(); () }
  }
}
