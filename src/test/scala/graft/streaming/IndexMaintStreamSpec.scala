package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.similarity.IvfIndex
import graft.tools.Scratch

class IndexMaintStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toAbsolutePath.toString

  test("stream-appended index ≡ one-shot batch append; mid-stream loads see only complete committed prefixes") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val cut = emb.selectExpr("percentile(vec_id, 0.8)").head().getDouble(0).toLong
    val base = emb.filter($"vec_id" <= cut)
    val delta = emb.filter($"vec_id" > cut)
    val nBase = base.count()
    assert(delta.count() > 0)

    val streamed = tmp("idx_maint_streamed")
    val batched = tmp("idx_maint_batched")
    val deltaDir = tmp("idx_maint_delta")
    try {
      IvfIndex.save(IvfIndex.build(base, "vec_id", "embedding",
        nCentroids = 8, iters = 2), streamed)
      Scratch.copyRecursively(streamed, batched) // byte-identical twin
      // Δ as a 3-file directory table: maxFilesPerTrigger=1 forces a
      // genuinely multi-trigger, multi-publish run
      delta.repartition(3).write.parquet(s"$deltaDir/embeddings.parquet")

      // the concurrent reader: before every trigger's append, load the
      // index as a probe would and record what it sees
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
      val triggers = IndexMaintStream.appendFile(spark, deltaDir, streamed,
        maxFilesPerTrigger = Some(1), onTrigger = mb => {
          val l = IvfIndex.load(spark, streamed, "vec_id", "embedding")
          seen += ((l.corpus.count(),
            l.centroids.flatten.toSeq.hashCode, mb.count()))
        })
      assert(triggers == 3, s"expected 3 triggers, got $triggers")

      // every mid-stream load saw base + a COMPLETE prefix of the
      // already-committed triggers — never a fraction of one
      val prefixes = seen.map(_._3).scanLeft(0L)(_ + _)
      seen.map(_._1).zip(prefixes).foreach { case (got, expect) =>
        assert(got == nBase + expect,
          s"mid-stream load saw $got rows; committed prefix was ${nBase + expect}")
      }
      // and centroids never moved (frozen layout — a torn read would
      // pair new corpus with different centroids)
      assert(seen.map(_._2).distinct.size == 1)

      // stream of 3 triggers ≡ one batch append of the whole Δ
      IvfIndex.append(spark, batched, delta, "vec_id", "embedding")
      val probes = emb.filter($"vec_id" % 17 === 0).limit(5)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
        .localCheckpoint()
      def answers(path: String) = IvfIndex.probeJoin(
        IvfIndex.load(spark, path, "vec_id", "embedding"),
        probes, "query_id", "qv", k = 10, nProbe = 4)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(answers(streamed) == answers(batched),
        "streamed maintenance diverged from batch append")
      // the generation chain is real: 1 save + 3 publishes, last two
      // retained
      val gens = graft.tools.Artifacts.committedGens(spark, streamed)
      assert(gens.last.endsWith("g00000003"), gens.toString)
    } finally {
      Scratch.deleteRecursively(new java.io.File(streamed))
      Scratch.deleteRecursively(new java.io.File(batched))
      Scratch.deleteRecursively(new java.io.File(deltaDir))
    }
  }

  test("tombstones survive maintenance publishes: a takedown stays deleted across stream appends") {
    val emb = graft.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
    val cut = emb.selectExpr("percentile(vec_id, 0.8)").head().getDouble(0).toLong
    val base = emb.filter($"vec_id" <= cut)
    val delta = emb.filter($"vec_id" > cut)
    val path = tmp("idx_maint_tomb")
    val deltaDir = tmp("idx_maint_tomb_delta")
    try {
      IvfIndex.save(IvfIndex.build(base, "vec_id", "embedding",
        nCentroids = 8, iters = 1), path)
      val victim = base.select($"vec_id").as[Long].head()
      IvfIndex.delete(spark, path, Seq(victim).toDF("vec_id"), "vec_id")
      delta.repartition(2).write.parquet(s"$deltaDir/embeddings.parquet")
      IndexMaintStream.appendFile(spark, deltaDir, path,
        maxFilesPerTrigger = Some(1))
      val served = IvfIndex.load(spark, path, "vec_id", "embedding")
        .corpus.select($"vec_id").as[Long].collect().toSet
      assert(!served.contains(victim), "takedown resurrected by maintenance publish")
      assert(delta.select($"vec_id").as[Long].collect().toSet.subsetOf(served))
    } finally {
      Scratch.deleteRecursively(new java.io.File(path))
      Scratch.deleteRecursively(new java.io.File(deltaDir))
    }
  }
}
