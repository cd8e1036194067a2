package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.{Dedup, MinHashIndex}

class NeardupStreamSpec extends SparkTestBase {
  import spark.implicits._

  // the MinHashIndexSpec planting: overlapping vocab ⇒ several
  // exact ≥ 0.5 batch×corpus pairs
  private def doc(g: Long) =
    (g, (0 until 12).map(w => s"w${(g * 5 + w * 3) % 17}").mkString(" "))

  test("stream≡batch row-for-row across a forced multi-trigger run, both table layouts") {
    // doc_id % 10 == 0 rows are the batch, the rest the corpus —
    // 40 docs gives 4 streamed batch docs and a matching corpus
    val docs = (0L until 40L).map(doc).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val batch = docs.filter($"doc_id" % 10 === 0)
    val expected = Dedup.minhashIncremental(corpus, batch, "doc_id", "text",
      threshold = 0.5, shingleK = 5, bands = 16, rowsPerBand = 2)
      .orderBy("doc_id")
      .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(expected.exists(_._2 == "near_dup"), "planting failed: no match")

    for (multiFile <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory("neardup_stream").toFile
      dir.deleteOnExit()
      val d = dir.getAbsolutePath
      if (multiFile) // directory layout: several part files → several triggers
        docs.repartition(4).write.mode("overwrite").parquet(s"$d/documents.parquet")
      else { // single-FILE layout (the driver testdata shape)
        docs.coalesce(1).write.mode("overwrite").parquet(s"$d/_tmp")
        val part = new java.io.File(s"$d/_tmp").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$d/documents.parquet"))
        graft.tools.Scratch.deleteRecursively(new java.io.File(s"$d/_tmp"))
      }
      val idxPath = s"$d/idx"
      MinHashIndex.save(MinHashIndex.build(corpus, "doc_id", "text",
        shingleK = 5, bands = 16, rowsPerBand = 2), idxPath)
      val got = NeardupStream.classifyFile(spark, d, idxPath, threshold = 0.5,
        maxFilesPerTrigger = if (multiFile) Some(1) else None)
        .orderBy("doc_id")
        .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
      assert(got == expected, s"stream != batch (multiFile=$multiFile)")
    }
  }

  test("classification through the stream honors index tombstones") {
    val docs = (0L until 40L).map(doc).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream_del").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val idxPath = s"$d/idx"
    MinHashIndex.save(MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 5, bands = 16, rowsPerBand = 2), idxPath)
    val full = NeardupStream.classifyFile(spark, d, idxPath, threshold = 0.5)
      .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
    val deleted = full.flatMap(_._3).distinct
    assert(deleted.nonEmpty)
    MinHashIndex.delete(spark, idxPath, deleted.toDF("doc_id"), "doc_id")
    val after = NeardupStream.classifyFile(spark, d, idxPath, threshold = 0.5)
      .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(after.flatMap(_._3).intersect(deleted).isEmpty,
      "stream served a tombstoned corpus doc")
  }

  test("stream restarts cleanly across an index rebuild (atomic publish)") {
    val docs = (0L until 40L).map(doc).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("neardup_stream_gen").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val idxPath = s"$d/idx"
    MinHashIndex.save(MinHashIndex.build(corpus, "doc_id", "text",
      shingleK = 5, bands = 16, rowsPerBand = 2), idxPath)
    val v1 = NeardupStream.classifyFile(spark, d, idxPath, threshold = 0.5)
      .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(v1.exists(_._2 == "near_dup"))
    // rebuild over an EMPTY-overlap corpus publishes a new generation;
    // a restarted stream resolves it (never a torn mix) — every match
    // disappears because the new corpus shares no vocabulary
    val rebuilt = (16L until 20L)
      .map(g => (g, (0 until 12).map(w => s"z${(g * 5 + w * 3) % 17}").mkString(" ")))
      .toDF("doc_id", "text")
    MinHashIndex.save(MinHashIndex.build(rebuilt, "doc_id", "text",
      shingleK = 5, bands = 16, rowsPerBand = 2), idxPath)
    val v2 = NeardupStream.classifyFile(spark, d, idxPath, threshold = 0.5)
      .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(v2.nonEmpty && v2.forall(_._2 == "new"),
      s"restarted stream still matched the old generation: $v2")
  }
}
