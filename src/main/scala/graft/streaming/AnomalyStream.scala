package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Output row: an event scored against its user's running EWMA
  * baseline BEFORE the event was folded in. `ewma_prev`/`ewvar_prev`
  * are NULL for the user's first event (no baseline exists yet).
  */
final case class AnomalyRow(event_id: Long, user_id: Long, ts: Timestamp,
    value: Double, ewma_prev: Option[Double], ewvar_prev: Option[Double],
    is_anomaly: Boolean)

/** Per-user anomaly state: the running exponentially-weighted mean /
  * variance over the `n` events already folded in, plus events still
  * above the watermark (their fold position is not final).
  */
final case class AnomalyState(ewma: Double, ewvar: Double, n: Long,
    pending: List[SegEvent])

/** Streaming anomaly detection over a per-key EWMA baseline — the
  * canonical metrics-monitoring operator (EWMA control chart), as a
  * custom stateful streaming operator: each event is compared to its
  * user's running exponentially-weighted mean/variance, and flagged
  * when its squared deviation exceeds 9× the EW variance (a 3-sigma
  * control limit) after a 5-event warm-up.
  *
  * The recurrence is order-sensitive (an EWMA folds events in event-
  * time order), so out-of-order safety comes from the watermark, not
  * arrival order: an event is scored and folded only once the
  * watermark passes its event time — at that point every earlier
  * event has either been folded or is excluded by the lateness
  * contract, so the baseline it is scored against is final (the
  * [[StreamingAsOf]] finality argument, applied to a fold instead of
  * a join).
  *
  * State per user is O(1) + the sub-watermark tail: the entire
  * history compacts into (ewma, ewvar, n) — this is why EWMA (and
  * not a windowed mean) is the streaming-native baseline — and only
  * events above the watermark buffer. Idle users go quiet: the
  * event-time timeout re-fires only while events are actually
  * pending.
  *
  * Recurrence (α = 0.3), seeded at the first event (ewma = x₁,
  * ewvar = 0):  ewma' = α·x + (1−α)·ewma;
  * ewvar' = (1−α)·(ewvar + α·(x − ewma)²) — every arithmetic step an
  * IEEE754 double, restated literally by the DuckDB recursive-CTE
  * oracle (with every constant forced to DOUBLE, the q_pagerank
  * float-parity rule).
  */
object AnomalyStream {

  val Alpha = 0.3
  val WarmupEvents = 5L
  val SigmaSqLimit = 9.0

  def detect(events: Dataset[SegEvent]): Dataset[AnomalyRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def key(e: SegEvent) = (e.ts.getTime, e.ts.getNanos, e.event_id)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomalyState, AnomalyRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SegEvent], state: GroupState[AnomalyState]) =>
          val st = state.getOption.getOrElse(AnomalyState(0.0, 0.0, 0L, Nil))
          val wmMs = state.getCurrentWatermarkMs()
          // ripe = the watermark passed them: every earlier event is
          // already folded (or excluded as late) — the baseline is final
          val (ripe, pending) = (st.pending ++ it.toList)
            .partition(_.ts.getTime <= wmMs)
          var (ewma, ewvar, n) = (st.ewma, st.ewvar, st.n)
          val out = ripe.sortBy(key).map { e =>
            val first = n == 0L
            val d = e.value - ewma
            val row = AnomalyRow(e.event_id, uid, e.ts, e.value,
              if (first) None else Some(ewma),
              if (first) None else Some(ewvar),
              !first && n >= WarmupEvents && d * d > SigmaSqLimit * ewvar)
            if (first) { ewma = e.value; ewvar = 0.0 }
            else {
              ewvar = (1.0 - Alpha) * (ewvar + Alpha * d * d)
              ewma = Alpha * e.value + (1.0 - Alpha) * ewma
            }
            n += 1
            row
          }
          state.update(AnomalyState(ewma, ewvar, n, pending))
          // re-fire on watermark advance only while events wait — the
          // [[StreamingAsOf]] quiet-group rule
          if (pending.nonEmpty) state.setTimeoutTimestamp(wmMs + 1)
          out.iterator
      }
  }

  /** Run the detector over the events parquet as a file-source stream
    * into a memory sink. `ewma_prev`/`ewvar_prev` are emitted
    * UNrounded on purpose: both engines fold the identical IEEE754
    * recurrence in the identical order, so the doubles are bit-exact
    * — whereas round(x, 6) is the one operation that DIVERGES at
    * half-way points (Spark rounds the shortest decimal string,
    * DuckDB the exact binary value; 6 of 100k rows hit the boundary
    * at sf0.1). Deterministic: same input → same rows.
    */
  def detectFile(spark: SparkSession, dir: String,
      watermarkDelay: String = "10 minutes",
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    import spark.implicits._
    val src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[SegEvent]
    val name = s"stream_anomaly_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = detect(src).toDF()
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("ewma_prev"), col("ewvar_prev"), col("is_anomaly"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("event_id")
  }
}
