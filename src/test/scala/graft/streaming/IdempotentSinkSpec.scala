package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IdempotentSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("replaying an epoch overwrites it — no duplicates (the at-least-once fix)") {
    val root = Files.createTempDirectory("idem_sink").toString
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    IdempotentSink.writeEpoch(batch, 0L, root)
    // simulate failure-after-write / commit-lost: the SAME epoch replays
    IdempotentSink.writeEpoch(batch, 0L, root)
    IdempotentSink.writeEpoch(Seq((3L, "c")).toDF("id", "v"), 1L, root)
    val all = IdempotentSink.readAll(spark, root)
    assert(all.count() == 3) // 2 + 1, not 2 + 2 + 1
    assert(all.select("epoch").distinct().count() == 2)
  }

  test("wired through a real foreachBatch stream, restarts do not duplicate") {
    val root = Files.createTempDirectory("idem_stream").toString
    val ckpt = Files.createTempDirectory("idem_ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(1L, 2L, 3L)
    val q = mem.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, e: Long) =>
        IdempotentSink.writeEpoch(b, e, root))
      .start()
    q.processAllAvailable(); q.stop()
    val n1 = IdempotentSink.readAll(spark, root).count()
    // restart from the same checkpoint with new data only
    val q2 = mem.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((b: org.apache.spark.sql.DataFrame, e: Long) =>
        IdempotentSink.writeEpoch(b, e, root))
      .start()
    mem.addData(4L)
    q2.processAllAvailable(); q2.stop()
    val all = IdempotentSink.readAll(spark, root)
    assert(n1 == 3)
    assert(all.count() == 4)
    assert(all.select("value").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }
}
