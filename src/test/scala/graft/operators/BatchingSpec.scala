package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BatchingSpec extends SparkTestBase {
  import spark.implicits._

  test("batches are size 5 except a partial final batch (syllabus_ai_graph.py:169-173)") {
    val df = (1L to 23L).toDF("k")
    val sizes = Batching.withBatchId(df, 5, col("k"))
      .groupBy("batch_id").count()
      .orderBy("batch_id").as[(Long, Long)].collect()
    assert(sizes.map(_._2).toSeq == Seq(5L, 5L, 5L, 5L, 3L))
    // sum of batch sizes = plan size
    assert(sizes.map(_._2).sum == 23)
  }

  test("scalable batch ids match the window formulation") {
    val df = (1L to 101L).map(i => (i * 37 % 101, i)).toDF("k", "v")
    val a = Batching.withBatchId(df, 7, col("k"))
      .select("k", "batch_id").as[(Long, Long)].collect().toMap
    val b = Batching.withBatchIdScalable(df, 7, col("k"))
      .select("k", "batch_id").as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
