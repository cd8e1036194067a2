package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup

class SemdedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  // planted vectors: id%10==0 rows are the streamed batch; 40/50 are
  // exact copies of corpus vectors 1/2 (guaranteed near-dups at any τ)
  private def vec(g: Long): Seq[Float] =
    (0 until 8).map(i => (((g * 7 + i * 3) % 13) - 6).toFloat / 6f)
  private def planted = ((0L until 40L).map(g => (g, vec(g))) ++
    Seq((40L, vec(1L)), (50L, vec(2L))))
    .toDF("vec_id", "embedding")

  test("stream≡batch row-for-row across a forced multi-trigger run") {
    val emb = planted
    val corpus = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
    val expected = Dedup.semanticIncremental(corpus, batch,
      "vec_id", "embedding", threshold = 0.35)
      .orderBy("vec_id")
      .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(expected.count(_._2 == "near_dup") >= 2, "planting failed")

    val dir = java.nio.file.Files.createTempDirectory("semdedup_stream").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    // directory layout + one file per trigger → genuinely multi-batch
    emb.repartition(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // the stream serves the SAVED index — build it the way production
    // (and the bench warm phase) does, on the corpus slice only
    graft.dedup.SemanticIndex.save(graft.dedup.SemanticIndex.build(
      corpus, "vec_id", "embedding", threshold = 0.35), s"$d/semidx")
    val got = SemdedupStream.classifyFile(spark, d, s"$d/semidx",
      maxFilesPerTrigger = Some(1))
      .orderBy("vec_id")
      .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(got == expected)
    // and the exact-copy plants behave as designed: a copy's cosine to
    // its original is 1, so both MUST classify near_dup
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(40L)._2 == "near_dup" && byId(50L)._2 == "near_dup")

    // tombstone honoring (the NeardupStreamSpec symmetry): retract
    // every id the stream resolved to — the next stream over the SAME
    // saved index must never serve them as dup_of
    val dead = got.flatMap(_._3).distinct
    assert(dead.nonEmpty)
    graft.dedup.SemanticIndex.delete(spark, s"$d/semidx",
      dead.toDF("vec_id"), "vec_id")
    val afterDelete = SemdedupStream.classifyFile(spark, d, s"$d/semidx",
      maxFilesPerTrigger = Some(1))
      .orderBy("vec_id")
      .as[(Long, String, Option[Long], Option[Double])].collect().toSeq
    assert(afterDelete.flatMap(_._3).intersect(dead).isEmpty,
      "stream served a tombstoned id")
    assert(afterDelete != got, "delete changed nothing — vacuous")
  }
}
