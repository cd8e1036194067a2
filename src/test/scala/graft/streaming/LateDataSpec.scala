package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Watermark late-data semantics, driven batch-by-batch through a
  * MemoryStream: rows older than (max event time − delay) that arrive
  * AFTER the watermark has advanced past their window are dropped from
  * append-mode windowed aggregation.
  */
class LateDataSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60L * 1000L)

  test("append-mode windowed agg drops late rows below the watermark") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Timestamp, Long)]
      val agg = input.toDF().toDF("ts", "v")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .select(col("window.start").as("ws"), col("n"), col("sv"))
      val q = agg.writeStream.outputMode("append")
        .format("memory").queryName("late_data_out").start()
      try {
        // batch 1: two windows' worth; watermark after batch = 35-10 = 25min
        input.addData((ts(2), 1L), (ts(12), 10L), (ts(35), 100L))
        q.processAllAvailable()
        // batch 2: ts(5) is LATE (window [0,10) closed at watermark 25)
        // and must be dropped; ts(38) is on time
        input.addData((ts(5), 1000L), (ts(38), 100L))
        q.processAllAvailable()
        // batch 3: push watermark far ahead to flush remaining windows
        input.addData((ts(120), 0L))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("late_data_out")
        .orderBy("ws").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000L, r.getLong(1), r.getLong(2)))
      // window 0: ONLY the on-time row (late 1000 dropped); window 10:
      // the 10; window 30: both on-time rows
      assert(rows.toSeq == Seq((0L, 1L, 1L), (10L, 1L, 10L), (30L, 2L, 200L)),
        s"got ${rows.toSeq}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
