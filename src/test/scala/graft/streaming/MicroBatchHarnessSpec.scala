package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MicroBatchHarnessSpec extends SparkTestBase {
  import spark.implicits._

  test("zero-trigger stream returns perBatch over an empty frame, not PATH_NOT_FOUND") {
    // a source that never fires a trigger: foreachBatch never runs,
    // no sink directory is ever created (ADVICE r11) — the harness
    // must answer with perBatch applied to an empty batch of the
    // source's schema, including perBatch-added columns
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val src = ms.toDF().withColumnRenamed("value", "doc_id")
    val out = MicroBatchHarness.run(spark, src, "graft_zero_trigger", 2) {
      mb => mb.withColumn("flag", lit(1))
    }
    assert(out.columns.toSeq == Seq("doc_id", "flag"))
    assert(out.count() == 0L)
  }

  test("non-empty stream still unions per-trigger outputs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    ms.addData(1L, 2L, 3L)
    val src = ms.toDF().withColumnRenamed("value", "doc_id")
    val out = MicroBatchHarness.run(spark, src, "graft_nonzero_trigger", 2) {
      mb => mb.withColumn("flag", lit(1))
    }
    assert(out.orderBy("doc_id").as[(Long, Int)].collect().toSeq ==
      Seq((1L, 1), (2L, 1), (3L, 1)))
  }
}
