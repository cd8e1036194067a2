package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The streaming EWMA detector must fold events in EVENT-TIME order
  * whatever the arrival order, match the batch recurrence on every
  * watermark-ripe row, and keep O(1) state per key.
  */
class AnomalyStreamSpec extends SparkTestBase {
  import spark.implicits._

  /** The reference recurrence, folded in-memory in event-time order. */
  private def foldBatch(evs: Seq[SegEvent]): Seq[AnomalyRow] = {
    val a = AnomalyStream.Alpha
    evs.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
      var (ewma, ewvar, n) = (0.0, 0.0, 0L)
      es.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).map { e =>
        val first = n == 0L
        val d = e.value - ewma
        val row = AnomalyRow(e.event_id, uid, e.ts, e.value,
          if (first) None else Some(ewma),
          if (first) None else Some(ewvar),
          !first && n >= AnomalyStream.WarmupEvents &&
            d * d > AnomalyStream.SigmaSqLimit * ewvar)
        if (first) { ewma = e.value; ewvar = 0.0 }
        else { ewvar = (1.0 - a) * (ewvar + a * d * d); ewma = a * e.value + (1.0 - a) * ewma }
        n += 1
        row
      }
    }.sortBy(_.event_id)
  }

  test("stream equals the in-memory recurrence on the watermark-ripe rows (bit-exact)") {
    val streamed = AnomalyStream.detectFile(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getBoolean(6))).toSeq
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[SegEvent].collect()
    val maxMs = ev.map(_.ts.getTime).max
    val ripe = ev.filter(_.ts.getTime <= maxMs - 10L * 60 * 1000).toSeq
    val expect = foldBatch(ripe)
      .map(r => (r.event_id, r.ewma_prev, r.ewvar_prev, r.is_anomaly))
    assert(streamed.nonEmpty && streamed == expect)
  }

  test("out-of-order arrival across microbatches folds in event-time order") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx = spark.sqlContext
      def ts(minute: Int) = new Timestamp(minute * 60L * 1000L)
      val input = MemoryStream[SegEvent]
      val out = AnomalyStream.detect(
        input.toDS().withWatermark("ts", "10 minutes").as[SegEvent])
      val q = out.toDF().writeStream.outputMode("append")
        .format("memory").queryName("anomaly_ooo").start()
      try {
        // batch 1: user 1's t=6 event ARRIVES before its t=2 one —
        // both ripen together (the t=30 row pushes the watermark to
        // 20) and must fold in EVENT-time order, t=2 first
        input.addData(
          SegEvent(3L, ts(6), 1L, "e", 10.0),
          SegEvent(1L, ts(2), 1L, "e", 2.0),
          SegEvent(900L, ts(30), 9L, "e", 0.0))
        q.processAllAvailable()
        // batch 2: a later event continues the fold from the carried
        // (ewma, n) state, across the microbatch boundary
        input.addData(SegEvent(5L, ts(25), 1L, "e", 6.0),
          SegEvent(901L, ts(50), 9L, "e", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("anomaly_ooo").orderBy("event_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toSeq
      // fold order for user 1: id1 (t=2, first, prev None), id3 (t=6,
      // prev 2.0), id5 (t=25, prev 0.3*10+0.7*2 = 4.4)
      assert(rows.filter(_._1 < 100L) == Seq(
        (1L, None), (3L, Some(2.0)), (5L, Some(0.3 * 10.0 + 0.7 * 2.0))))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  test("a LATE event (below the watermark on arrival) is dropped, not folded") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx = spark.sqlContext
      def ts(minute: Int) = new Timestamp(minute * 60L * 1000L)
      val input = MemoryStream[SegEvent]
      val out = AnomalyStream.detect(
        input.toDS().withWatermark("ts", "10 minutes").as[SegEvent])
      val q = out.toDF().writeStream.outputMode("append")
        .format("memory").queryName("anomaly_late").start()
      try {
        // batch 1: t=2 and t=6 fold once the t=30 row pushes wm to 20
        input.addData(
          SegEvent(1L, ts(2), 1L, "e", 2.0),
          SegEvent(3L, ts(6), 1L, "e", 10.0),
          SegEvent(900L, ts(30), 9L, "e", 0.0))
        q.processAllAvailable()
        // batch 2: t=4 arrives BELOW the watermark (20) — the lateness
        // contract excludes it: it must neither emit nor perturb the
        // already-final fold state; t=25 continues the fold normally
        input.addData(
          SegEvent(2L, ts(4), 1L, "e", 999.0),
          SegEvent(5L, ts(25), 1L, "e", 6.0),
          SegEvent(901L, ts(50), 9L, "e", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("anomaly_late").orderBy("event_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toSeq.filter(_._1 < 100L)
      // the late id=2 row is absent, and id=5's baseline reflects only
      // ids 1 and 3: 0.3*10 + 0.7*2 = 4.4 (a folded 999 would shift it)
      assert(rows == Seq(
        (1L, None), (3L, Some(2.0)), (5L, Some(0.3 * 10.0 + 0.7 * 2.0))),
        s"got $rows")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  test("anomaly flag: warm-up suppresses, genuine spike after warm-up fires") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx = spark.sqlContext
      def ts(minute: Int) = new Timestamp(minute * 60L * 1000L)
      val input = MemoryStream[SegEvent]
      val out = AnomalyStream.detect(
        input.toDS().withWatermark("ts", "1 minute").as[SegEvent])
      val q = out.toDF().writeStream.outputMode("append")
        .format("memory").queryName("anomaly_spike").start()
      try {
        // steady series 10,10,10,10,10,10 then a 100 spike; a far-
        // future row advances the watermark past everything
        val steady = (1 to 6).map(i => SegEvent(i.toLong, ts(i), 1L, "e", 10.0))
        input.addData(steady :+ SegEvent(7L, ts(7), 1L, "e", 100.0)
          :+ SegEvent(900L, ts(1000), 9L, "e", 0.0): _*)
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("anomaly_spike").orderBy("event_id")
        .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
      // events 1-6: warm-up or zero deviation — never anomalous; the
      // spike at 7 deviates 90 from a zero-variance baseline
      assert((1L to 6L).forall(id => !rows(id)))
      assert(rows(7L))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
