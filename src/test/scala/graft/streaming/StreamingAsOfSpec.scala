package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The streaming as-of join must equal the batch as-of join on every
  * row the watermark lets it emit, regardless of arrival order.
  */
class StreamingAsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("stream equals the batch as-of join on the watermark-ripe rows") {
    val streamed = StreamingAsOf.asofFile(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val ev = graft.Tables.events(spark, sf)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val cutMs = maxTs.getTime - 10L * 60 * 1000
    val lft = ev.filter(col("event_type") =!= "signup")
      .filter(col("ts") < lit(new Timestamp(cutMs + 1)))
      .select("event_id", "user_id", "ts")
    val rgt = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts").agg(max("event_id").as("signup_id"))
    val batch = graft.operators.AsOfJoin
      .backward(lft, rgt, "user_id", "ts", Seq("signup_id"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("forward stream equals the batch forward as-of on the watermark-finalized rows") {
    val streamed = StreamingAsOf.asofForwardFile(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val ev = graft.Tables.events(spark, sf)
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val cutMs = maxTs.getTime - 10L * 60 * 1000
    val lft = ev.filter(col("event_type") === "signup")
      .select("event_id", "user_id", "ts")
    val rgt = ev.filter(col("event_type") =!= "signup")
      .groupBy("user_id", "ts").agg(max("event_id").as("next_id"))
    val batch = graft.operators.AsOfJoin
      .forward(lft, rgt, "user_id", "ts", Seq("next_id"))
      // only matches the final watermark finalizes are emittable
      .filter(col("asof_ts").isNotNull &&
        col("asof_ts") < lit(new Timestamp(cutMs + 1)))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("forward: an earlier reference arriving LATER still wins; ties take max event_id") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx = spark.sqlContext
      def ts(minute: Int) = new Timestamp(minute * 60L * 1000L)
      val input = MemoryStream[SegEvent]
      val out = StreamingAsOf.asofForward(
        input.toDS().withWatermark("ts", "10 minutes").as[SegEvent])
      val q = out.toDF().writeStream.outputMode("append")
        .format("memory").queryName("asof_fwd_ooo").start()
      try {
        // batch 1: probe S1 (user 1, t=5) and a FAR reference (t=26)
        // arrive first; an unmatched probe for user 2; watermark -> 16
        input.addData(
          SegEvent(101L, ts(5), 1L, "signup", 0.0),
          SegEvent(201L, ts(26), 1L, "purchase", 0.0),
          SegEvent(300L, ts(6), 2L, "signup", 0.0))
        q.processAllAvailable()
        // batch 2: references at t=18 arrive AFTER t=26 in processing
        // order but earlier in event time (above the watermark 16 —
        // NOT late data) — the earliest-at-or-after contract must
        // pick t=18 over t=26, and among the t=18 tie the max
        // event_id (203). Probe S2 (t=17) joins the queue; wm -> 30
        input.addData(
          SegEvent(202L, ts(18), 1L, "purchase", 0.0),
          SegEvent(203L, ts(18), 1L, "purchase", 0.0),
          SegEvent(102L, ts(17), 1L, "signup", 0.0),
          SegEvent(901L, ts(40), 9L, "purchase", 0.0))
        q.processAllAvailable()
        // batch 3: watermark 30 passes the t=18 match -> both probes
        // finalize on it; the user-2 probe stays withheld (no forward
        // reference can ever be proven absent on an unbounded stream)
        input.addData(SegEvent(902L, ts(120), 9L, "purchase", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("asof_fwd_ooo").orderBy("event_id").collect()
        .map(r => (r.getLong(0),
          Option(r.getTimestamp(3)).map(_.getTime / 60000L),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
      assert(rows == Seq(
        (101L, Some(18L), Some(203L)), // later-arriving earlier ref wins; tie -> max id
        (102L, Some(18L), Some(203L))))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  test("a reference row arriving AFTER its probe still wins the match (out-of-order)") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx = spark.sqlContext
      def ts(minute: Int) = new Timestamp(minute * 60L * 1000L)
      val input = MemoryStream[SegEvent]
      val out = StreamingAsOf.asof(
        input.toDS().withWatermark("ts", "10 minutes").as[SegEvent])
      val q = out.toDF().writeStream.outputMode("append")
        .format("memory").queryName("asof_ooo").start()
      try {
        // batch 1: probe P1 (user 1, t=20) arrives BEFORE the signup
        // that should win it; S1 (t=5) is the early signup; the user-9
        // row advances the watermark to 15
        input.addData(
          SegEvent(201L, ts(20), 1L, "purchase", 0.0),
          SegEvent(101L, ts(5), 1L, "signup", 0.0),
          SegEvent(202L, ts(6), 2L, "purchase", 0.0),
          SegEvent(900L, ts(25), 9L, "purchase", 0.0))
        q.processAllAvailable()
        // batch 2: S2 (t=18) arrives LATE in processing order but above
        // the watermark — it must beat S1 for P1; watermark → 30
        input.addData(
          SegEvent(102L, ts(18), 1L, "signup", 0.0),
          SegEvent(901L, ts(40), 9L, "purchase", 0.0))
        q.processAllAvailable()
        // batch 3: flush everything below watermark 110
        input.addData(SegEvent(902L, ts(120), 9L, "purchase", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("asof_ooo").orderBy("event_id").collect()
        .map(r => (r.getLong(0),
          Option(r.getTimestamp(3)).map(_.getTime / 60000L),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
      assert(rows == Seq(
        (201L, Some(18L), Some(102L)), // S2 wins although it arrived later
        (202L, None, None), // user 2 has no signup
        (900L, None, None),
        (901L, None, None))) // t=120 row above final watermark: withheld
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
