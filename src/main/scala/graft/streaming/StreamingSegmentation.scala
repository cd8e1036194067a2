package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time row for the segmentation state machine. */
final case class SegEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Output row: the input event plus its assigned segment. */
final case class SegmentedEvent(user_id: Long, ts: Timestamp, event_id: Long,
    event_type: String, value: Double, segment: Long)

/** Per-user state: markers seen so far + events still above the
  * watermark (not yet safe to order).
  */
final case class SegBufferState(markerCount: Long, buffer: List[SegEvent])

/** Structured-Streaming twin of the reference's ordered segmentation
  * (O4, syllabus_parser.py:118-154; batch form:
  * graft.operators.Segmentation). SURVEY.md §7.2 M5.
  *
  * The batch operator is a running sum over a per-key ordered window —
  * an order the stream cannot assume, since events arrive out of
  * order. `flatMapGroupsWithState` restores it with bounded state: per
  * user, buffer events until the watermark passes them, then sort the
  * ripe prefix by (ts, event_id), continue the running marker count
  * from state, and emit rows with segment ≥ 1 (pre-first-marker rows
  * dropped, exactly the batch semantics).
  *
  * Guarantees: identical output to the batch operator restricted to
  * events at or below the final watermark, for any arrival order with
  * lateness ≤ the watermark delay (proved batch-vs-stream in
  * StreamingSegmentationSpec). Events later than the watermark would
  * be mis-ordered — the standard watermark contract.
  *
  * Scale: state per user = markers count + only the sub-watermark-
  * delay tail of events; keys distribute across executors by hash —
  * the same per-key parallelism as the batch window.
  */
object StreamingSegmentation {

  /** Apply the stateful segmentation to a (possibly streaming)
    * Dataset[SegEvent] already carrying a watermark on `ts`.
    */
  def segment(events: Dataset[SegEvent], markerType: String): Dataset[SegmentedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SegBufferState, SegmentedEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SegEvent], state: GroupState[SegBufferState]) =>
          val st = state.getOption.getOrElse(SegBufferState(0L, Nil))
          val all = st.buffer ++ it
          val wmMs = state.getCurrentWatermarkMs()
          // ripe = safely orderable: nothing earlier can still arrive
          val (ripe, pending) = all.partition(_.ts.getTime <= wmMs)
          val sorted = ripe.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var cnt = st.markerCount
          val out = sorted.flatMap { e =>
            if (e.event_type == markerType) cnt += 1
            if (cnt >= 1)
              Some(SegmentedEvent(uid, e.ts, e.event_id, e.event_type, e.value, cnt))
            else None
          }
          state.update(SegBufferState(cnt, pending))
          // without a timeout the key is never revisited once data
          // stops, and the buffer would sit above the watermark forever
          // — an event-time timeout just past the current watermark
          // re-invokes this function (empty iterator) whenever the
          // watermark moves, flushing newly-ripe events
          state.setTimeoutTimestamp(wmMs + 1)
          out.iterator
      }
  }

  /** Run the segmentation as a real streaming query over the events
    * parquet (file-source stream, memory sink) and return the emitted
    * rows. Deterministic: same input → same rows.
    */
  def segmentFile(spark: SparkSession, dir: String, markerType: String = "signup",
      watermarkDelay: String = "10 minutes",
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    import spark.implicits._
    val src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[SegEvent]
    val name = s"stream_seg_${System.nanoTime()}"
    // the shuffle-partition conf at stream start fixes the state-store
    // partition count for the query's lifetime: each store pays a
    // per-microbatch commit, so it must track key cardinality /
    // throughput, not the batch session default (32 stores on a small
    // stream = 5x pure overhead, measured)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = segment(src, markerType).toDF()
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("user_id", "ts", "event_id")
  }

  /** Batch twin with the stream's watermark cutoff applied: events at
    * or below floor-to-ms(max ts) − delay, filtered BEFORE segmenting
    * (the stream never counts markers above the cutoff). Mirrors the
    * DuckDB oracle of q_stream_seg.
    */
  def segmentBatch(spark: SparkSession, dir: String, markerType: String = "signup",
      delayMs: Long = 10 * 60 * 1000L): DataFrame = {
    val events = graft.Tables.events(spark, dir)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val cutoffMs = (maxTs.getTime) - delayMs // getTime floors to ms
    // the stream's ripeness test is floor-to-ms(ts) <= watermark-ms;
    // ts < cutoff+1ms is the same predicate on the full-precision ts
    val ripe = events.filter(col("ts") < timestamp_millis(lit(cutoffMs + 1)))
    graft.operators.Segmentation
      .segment(ripe, col("user_id"), col("event_type") === lit(markerType),
        col("ts"), col("event_id"))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"), col("segment"))
      .orderBy("user_id", "ts", "event_id")
  }
}
