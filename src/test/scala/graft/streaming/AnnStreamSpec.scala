package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.IvfIndex

class AnnStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("probeJoin equals the per-query topK for every query") {
    val emb = graft.Tables.embeddings(spark, sf)
    val path = tmpDir("ann_probe")
    IvfIndex.save(
      IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 8, iters = 2), path)
    val idx = IvfIndex.load(spark, path, "vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id", $"embedding")
    val batched = IvfIndex.probeJoin(idx, queries, "vec_id", "embedding",
      k = 5, nProbe = 3)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
      .toMap
    val qs = queries.as[(Long, Seq[Float])].collect()
    assert(qs.length >= 3, "fixture too small to exercise batching")
    qs.foreach { case (qid, qv) =>
      val single = IvfIndex.topK(idx, qv, k = 5, nProbe = 3)
        .as[(Long, Double)].collect().toSeq
      assert(batched(qid) == single, s"probeJoin != topK for query $qid")
    }
  }

  test("probeJoin still prunes non-probed cells at the SCAN (PartitionFilters)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val path = tmpDir("ann_prune")
    IvfIndex.save(
      IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 8, iters = 1), path)
    val idx = IvfIndex.load(spark, path, "vec_id", "embedding")
    val queries = emb.filter($"vec_id" === 0).select($"vec_id", $"embedding")
    val plan = IvfIndex.probeJoin(idx, queries, "vec_id", "embedding",
      k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    // the plan has TWO scans (queries side + corpus side) — the
    // corpus one must carry the probed-cell cut as a partition filter
    val filters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(filters.exists(_.contains("cell")),
      s"probed-cell cut did not become a partition filter:\n$plan")
  }

  test("stream≡batch row-for-row across a forced multi-trigger run, both table layouts") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" % 20 === 0)

    for (multiFile <- Seq(false, true)) {
      val d = tmpDir("ann_stream")
      if (multiFile) // directory layout: several part files → several triggers
        emb.repartition(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      else { // single-FILE layout (the driver testdata shape)
        emb.coalesce(1).write.mode("overwrite").parquet(s"$d/_tmp")
        val part = new java.io.File(s"$d/_tmp").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$d/embeddings.parquet"))
        graft.tools.Scratch.deleteRecursively(new java.io.File(s"$d/_tmp"))
      }
      // OUTSIDE the streamed dir: the cell=N partition layout would
      // otherwise confuse the stream source's partition discovery
      val idxPath = s"${tmpDir("ann_stream_idx")}/idx"
      IvfIndex.save(
        IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 8, iters = 2),
        idxPath)
      val idx = IvfIndex.load(spark, idxPath, "vec_id", "embedding")
      val expected = IvfIndex.probeJoin(idx, queries, "vec_id", "embedding",
        k = 5, nProbe = 3)
        .orderBy("query_id", "rk")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(expected.nonEmpty, "planting failed: no streamed queries")
      val got = AnnStream.probeFile(spark, d, idxPath, k = 5, nProbe = 3,
        maxFilesPerTrigger = if (multiFile) Some(1) else None)
        .orderBy("query_id", "rk")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(got == expected, s"stream != batch (multiFile=$multiFile)")
    }
  }

  test("answers through the stream honor index tombstones") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val d = tmpDir("ann_stream_del")
    emb.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val idxPath = s"${tmpDir("ann_stream_del_idx")}/idx"
    IvfIndex.save(
      IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 8, iters = 2),
      idxPath)
    val full = AnnStream.probeFile(spark, d, idxPath, k = 5, nProbe = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // delete every rank-1 hit (each query's self-match among them)
    val deleted = full.filter(_._2 == 1L).map(_._3).distinct
    assert(deleted.nonEmpty)
    IvfIndex.delete(spark, idxPath, deleted.toDF("vec_id"), "vec_id")
    val after = AnnStream.probeFile(spark, d, idxPath, k = 5, nProbe = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(after.map(_._3).intersect(deleted).isEmpty,
      "stream served a tombstoned corpus vector")
    assert(after.nonEmpty && after.map(_._1).distinct.sorted ==
      full.map(_._1).distinct.sorted,
      "tombstoning corpus ids must not drop queries")
  }

  test("PQ twin: probeJoin equals the per-query PqIndex.topK for every query") {
    import graft.similarity.PqIndex
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val path = s"${tmpDir("ann_pq_probe")}/idx"
    val cb0 = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 8, iters = 1)
    PqIndex.save(cb0, PqIndex.encode(cb0, emb, "vec_id", "embedding"), path)
    val (cb, codes) = PqIndex.load(spark, path)
    val queries = emb.filter($"vec_id" % 100 === 0)
    val batched = PqIndex.probeJoin(cb, codes, emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, c = 40)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
      .toMap
    val qs = queries.as[(Long, Seq[Float])].collect()
    assert(qs.length >= 3, "fixture too small to exercise batching")
    qs.foreach { case (qid, qv) =>
      val single = PqIndex.topK(cb, codes, emb, "vec_id", "embedding", qv,
        k = 5, c = 40).as[(Long, Double)].collect().toSeq
      assert(batched(qid) == single, s"PQ probeJoin != topK for query $qid")
    }
  }

  test("PQ twin: stream≡batch across a forced multi-trigger run; tombstones honored") {
    import graft.similarity.PqIndex
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" % 20 === 0)
    val d = tmpDir("ann_pq_stream")
    emb.repartition(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val idxPath = s"${tmpDir("ann_pq_stream_idx")}/idx"
    val cb0 = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 8, iters = 1)
    PqIndex.save(cb0, PqIndex.encode(cb0, emb, "vec_id", "embedding"), idxPath)
    val (cb, codes) = PqIndex.load(spark, idxPath)
    val expected = PqIndex.probeJoin(cb, codes, emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, c = 40)
      .orderBy("query_id", "rk")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(expected.nonEmpty)
    val got = AnnStream.probePqFile(spark, d, idxPath, k = 5, c = 40,
      maxFilesPerTrigger = Some(1)) // force a genuinely multi-trigger run
      .orderBy("query_id", "rk")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected, "PQ stream != batch")
    // tombstone every rank-1 hit; a restarted stream must never serve one
    val deleted = expected.filter(_._2 == 1L).map(_._3).distinct
    assert(deleted.nonEmpty)
    PqIndex.delete(spark, idxPath, deleted.toDF("vec_id"), "vec_id")
    val after = AnnStream.probePqFile(spark, d, idxPath, k = 5, c = 40)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(after.map(_._3).intersect(deleted).isEmpty,
      "PQ stream served a tombstoned corpus vector")
    assert(after.nonEmpty && after.map(_._1).distinct.sorted ==
      expected.map(_._1).distinct.sorted)
  }

  test("graph twin: stream≡batch across a forced multi-trigger run") {
    import graft.similarity.GraphIndex
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val queries = emb.filter($"vec_id" % 20 === 0)
    val d = tmpDir("ann_graph_stream")
    emb.repartition(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val idxPath = s"${tmpDir("ann_graph_stream_idx")}/idx"
    GraphIndex.save(GraphIndex.build(emb, "vec_id", "embedding"), idxPath)
    val adj = GraphIndex.load(spark, idxPath)
    val budget = math.max(200L, emb.count() / 5).toInt
    val expected = GraphIndex.probeJoin(adj, emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, budget = budget)
      .orderBy("query_id", "rk")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(expected.nonEmpty)
    val got = AnnStream.probeGraphFile(spark, d, idxPath, k = 5,
      budget = budget,
      maxFilesPerTrigger = Some(1)) // force a genuinely multi-trigger run
      .orderBy("query_id", "rk")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected, "graph stream != batch")
  }
}
