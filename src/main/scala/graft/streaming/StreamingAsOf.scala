package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Output row: a left event with its backward as-of match (NULL
  * columns when the user has no signup at or before the event).
  */
final case class AsOfRow(event_id: Long, user_id: Long, ts: Timestamp,
    asof_ts: Option[Timestamp], asof_signup_id: Option[Long])

/** Per-user state: reference-side rows seen so far (compacted below
  * the watermark) + left rows still above the watermark.
  */
final case class AsOfJoinState(signups: List[SegEvent], pending: List[SegEvent])

/** Output row of the FORWARD streaming as-of: a probe event with the
  * earliest reference at or after it (emitted only once that match is
  * watermark-final — see [[StreamingAsOf.asofForward]]).
  */
final case class AsOfFwdRow(event_id: Long, user_id: Long, ts: Timestamp,
    asof_ts: Option[Timestamp], asof_next_id: Option[Long])

/** Per-user forward state: reference rows still above the watermark +
  * probe rows whose match is not yet final.
  */
final case class AsOfFwdState(refs: List[SegEvent], pending: List[SegEvent])

/** Streaming backward AS-OF join — the temporal-join shape batch
  * [[graft.operators.AsOfJoin]] covers, as a custom stateful
  * streaming operator (Structured Streaming has stream-stream
  * interval joins but no as-of join; Flink calls this a temporal
  * join). Each non-reference event is matched to its user's LATEST
  * reference event at or before it (ties per (user, ts) resolve to
  * the max event_id, the batch q_asof contract).
  *
  * Out-of-order safety comes from the watermark, not arrival order:
  * a left event is emitted only once the watermark passes its event
  * time — at that point every reference row at or before it has
  * either arrived or is excluded by the lateness contract, so the
  * match is final (same guarantee shape as
  * [[StreamingSegmentation]], proved batch-vs-stream in its spec).
  *
  * State is bounded on BOTH sides: left rows buffer only while above
  * the watermark, and reference rows at or below it compact to the
  * single best candidate — any future left event has a later event
  * time, so only the latest matured reference row can ever win.
  * State per user = 1 compacted row + the sub-watermark-delay tails.
  */
object StreamingAsOf {

  /** Apply the stateful as-of join to a (possibly streaming)
    * Dataset[SegEvent] already carrying a watermark on `ts`. Rows
    * with `event_type == rightType` form the reference side; all
    * other rows are the probe side.
    */
  def asof(events: Dataset[SegEvent], rightType: String = "signup"): Dataset[AsOfRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def key(e: SegEvent) = (e.ts.getTime, e.ts.getNanos, e.event_id)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfJoinState, AsOfRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SegEvent], state: GroupState[AsOfJoinState]) =>
          val st = state.getOption.getOrElse(AsOfJoinState(Nil, Nil))
          val (newR, newL) = it.toList.partition(_.event_type == rightType)
          val signups = st.signups ++ newR
          val wmMs = state.getCurrentWatermarkMs()
          // ripe = the watermark passed them: every matching reference
          // row is in `signups` (or excluded as late) — match is final
          val (ripe, pending) = (st.pending ++ newL)
            .partition(_.ts.getTime <= wmMs)
          val out = ripe.map { e =>
            val best = signups.filter(_.ts.compareTo(e.ts) <= 0) match {
              case Nil => None
              case cs => Some(cs.maxBy(key))
            }
            AsOfRow(e.event_id, uid, e.ts,
              best.map(_.ts), best.map(_.event_id))
          }
          // compact matured reference rows to the single best: future
          // left events sit above the watermark, so older ones lost
          val (matured, live) = signups.partition(_.ts.getTime <= wmMs)
          val compacted =
            (if (matured.nonEmpty) List(matured.maxBy(key)) else Nil) ++ live
          state.update(AsOfJoinState(compacted, pending))
          // re-fire on the next watermark advance ONLY while probe
          // rows are actually waiting: a drained group goes quiet
          // (GroupState clears the timeout on every invocation, so
          // not re-setting it here is what stops the re-fires; new
          // data re-invokes the function regardless) — otherwise
          // every user ever seen pays a state round-trip per batch
          // for the stream's lifetime
          if (pending.nonEmpty) state.setTimeoutTimestamp(wmMs + 1)
          out.iterator
      }
  }

  /** Streaming FORWARD as-of join — the mirror of [[asof]] (VERDICT
    * r7 next-round #4; batch twin: [[graft.operators.AsOfJoin.forward]]):
    * each probe row (`event_type == probeType`) matches its user's
    * EARLIEST reference row at or after it (ties per (user, ts)
    * resolve to the max event_id, the batch q_asof_forward contract).
    *
    * Finality is the reflected argument: probe p's best-so-far
    * reference b is final once the watermark passes b — any
    * later-arriving reference has event time above the watermark
    * ≥ b.ts, so it cannot beat b; references between p.ts and b.ts at
    * or below the watermark have either arrived or are excluded by
    * the lateness contract. A probe with NO at-or-after reference can
    * never be finalized on an unbounded stream (its match may still
    * arrive) — it simply never emits, which is what the oracle
    * restates (`asof_ts IS NOT NULL AND asof_ts <= final watermark`).
    *
    * State is bounded on both sides: references at or below the
    * watermark are dropped after the emission step (a pending probe
    * by construction has no candidate there — one would have
    * finalized it — and every future probe arrives above the
    * watermark), and probes buffer only while unmatched (they drain
    * as their forward match matures, the steady-state of any stream
    * that keeps producing reference rows).
    */
  def asofForward(events: Dataset[SegEvent], probeType: String = "signup"): Dataset[AsOfFwdRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    // min over (ts, -event_id): earliest ts, max event_id among ties
    def refKey(e: SegEvent) = (e.ts.getTime, e.ts.getNanos, -e.event_id)
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfFwdState, AsOfFwdRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SegEvent], state: GroupState[AsOfFwdState]) =>
          val st = state.getOption.getOrElse(AsOfFwdState(Nil, Nil))
          val (newP, newR) = it.toList.partition(_.event_type == probeType)
          val refs = st.refs ++ newR
          val wmMs = state.getCurrentWatermarkMs()
          def best(p: SegEvent): Option[SegEvent] =
            refs.filter(_.ts.compareTo(p.ts) >= 0) match {
              case Nil => None
              case cs => Some(cs.minBy(refKey))
            }
          val (ripe, pending) = (st.pending ++ newP)
            .partition(p => best(p).exists(_.ts.getTime <= wmMs))
          val out = ripe.map { p =>
            val b = best(p).get
            AsOfFwdRow(p.event_id, uid, p.ts, Some(b.ts), Some(b.event_id))
          }
          // matured references can never serve again (argument above)
          state.update(AsOfFwdState(refs.filter(_.ts.getTime > wmMs), pending))
          // re-fire on watermark advance only while probes wait — the
          // same quiet-group rule as [[asof]]
          if (pending.nonEmpty) state.setTimeoutTimestamp(wmMs + 1)
          out.iterator
      }
  }

  /** Run the streaming as-of join over the events parquet as a
    * file-source stream into a memory sink. Deterministic: same
    * input → same rows.
    */
  def asofFile(spark: SparkSession, dir: String, rightType: String = "signup",
      watermarkDelay: String = "10 minutes",
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    import spark.implicits._
    val src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[SegEvent]
    val name = s"stream_asof_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = asof(src, rightType).toDF()
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("event_id")
  }

  /** [[asofForward]] over the events parquet as a file-source stream
    * into a memory sink — probes are the signup rows, references
    * everything else ("first activity after signup", the batch
    * q_asof_forward surface). Deterministic: same input → same rows.
    */
  def asofForwardFile(spark: SparkSession, dir: String,
      probeType: String = "signup", watermarkDelay: String = "10 minutes",
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    import spark.implicits._
    val src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[SegEvent]
    val name = s"stream_asof_fwd_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = asofForward(src, probeType).toDF()
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("event_id")
  }
}
