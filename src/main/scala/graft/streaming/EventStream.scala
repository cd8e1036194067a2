package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming over the `events` table (SURVEY.md §2.C
  * Q-STREAM): tumbling event-time windows with a watermark, run here
  * against the static parquet as a file-source stream so the result is
  * checkable against a batch/DuckDB oracle.
  *
  * Append-mode semantics: a window is emitted only once the watermark
  * (max event time − delay) passes its end, so the trailing windows of
  * a bounded input are intentionally withheld — the oracle encodes the
  * same cutoff. Spark's no-data microbatch (on by default) advances
  * the watermark after the final data batch, flushing everything
  * below max(ts) − delay.
  */
object EventStream {

  /** Tumbling 1h window × event_type counts/sums with a 10m watermark,
    * executed as a real streaming query into a memory sink and
    * returned as a DataFrame. Deterministic: same input → same
    * emitted windows.
    */
  def windowedCounts(spark: SparkSession, dir: String,
      window_ : String = "1 hour", watermark: String = "10 minutes",
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    // layout-aware source (single-file testdata vs Spark-written
    // directory — see EventSource)
    val src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
    val agg = src
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
    val name = s"stream_out_${System.nanoTime()}"
    // state-store partition count = shuffle partitions at stream start;
    // size to the stream, not the batch default (see
    // StreamingSegmentation.segmentFile)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = agg.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("window_start", "event_type")
  }

  /** Streaming exact dedup: each event duplicated in-stream (explode
    * ×2 — planted duplicates, the corpus itself is unique), then
    * `dropDuplicates(event_id)` with the watermark bounding state:
    * key state for ids older than the watermark is evicted, which is
    * what makes streaming dedup viable on an unbounded stream. Append
    * mode emits the first sighting immediately, so the result is
    * exactly the distinct input (q_stream_dedup's oracle is a plain
    * batch DISTINCT).
    */
  def dedupStream(spark: SparkSession, dir: String,
      watermark: String = "10 minutes",
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    val src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .withColumn("_dup", explode(array(lit(1), lit(2)))).drop("_dup")
      .withWatermark("ts", watermark)
      // the event-time column MUST be part of the dedup key: Spark
      // builds the state-eviction predicate only from event-time key
      // columns — dropDuplicates("event_id") alone would retain every
      // id forever (unbounded state). Duplicates share their ts, so
      // the semantics are unchanged.
      .dropDuplicates("event_id", "ts")
    val name = s"stream_dedup_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = src.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("event_id")
  }

  /** Stream-static join: the event stream enriched against a static
    * dimension (customer) — the stateless streaming join Spark plans
    * as a per-microbatch broadcast, no state store at all. Key is a
    * modulo mapping of user_id into the customer key domain (the
    * synthetic tables share no natural key); the oracle states the
    * same join in SQL.
    */
  /** Streaming top-k: complete-mode per-user event counts, then the
    * k heaviest users off the result table. The stateful op is the
    * keyed count (state = one row per user); the top-k itself is a
    * bounded post-pass over the complete-mode sink — ranking INSIDE
    * the stream would re-sort the whole aggregate every micro-batch
    * for the same answer. Deterministic ties: (count desc, user_id).
    */
  def topKStream(spark: SparkSession, dir: String, k: Int = 10,
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    val src = EventSource.stream(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val name = s"stream_topk_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = src.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy(col("n_events").desc, col("user_id")).limit(k)
  }

  def enrichedStream(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    val customers = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val nCust = customers.count()
    val src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("c_custkey", pmod(col("user_id"), lit(nCust)) + 1)
      .join(broadcast(customers), "c_custkey")
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val name = s"stream_join_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      // complete mode: the stream-static join itself is stateless; the
      // grouped count is the only stateful op and the domain is tiny
      val q = src.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("c_mktsegment", "event_type")
  }

  /** Stream-stream inner join with an event-time interval condition:
    * signups joined to the purchases that follow within `window_`.
    * Both sides carry watermarks and the join condition bounds the
    * time range, so Spark derives state-eviction predicates for BOTH
    * state stores — the state held is O(events inside the watermark
    * horizon), not O(stream) — this is the canonical scalable
    * stream-stream join shape. Inner-join matches emit as soon as both
    * rows arrive (append mode), so on a bounded input the sink equals
    * the batch join — the DuckDB oracle states exactly that join.
    */
  def intervalJoinStream(spark: SparkSession, dir: String,
      window_ : String = "2 hours", watermark: String = "1 hour",
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    def src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
    val signups = src.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"),
        col("event_id").as("signup_event"))
      .withWatermark("signup_ts", watermark)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_event"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    val joined = signups.join(purchases, expr(
      s"s_user = p_user AND purchase_ts >= signup_ts AND " +
        s"purchase_ts <= signup_ts + interval ${window_}"))
      .select(col("s_user").as("user_id"), col("signup_event"),
        col("purchase_event"), col("signup_ts"), col("purchase_ts"),
        col("purchase_value"))
    val name = s"stream_ssjoin_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("user_id", "signup_event", "purchase_event")
  }

  /** Streaming gap-sessionization: session_window per user (the
    * streaming twin of Q-SESSION's 30-minute-gap merge). Append mode
    * emits a session only once the watermark passes its end (last
    * event + gap), so the bounded input yields exactly the sessions
    * whose end ≤ max(ts) − watermark delay — the oracle applies the
    * same cutoff to the relational session merge. Session state is
    * bounded by the watermark horizon, which is what makes
    * gap-sessions viable on an unbounded stream.
    */
  def sessionStream(spark: SparkSession, dir: String,
      gap: String = "30 minutes", watermark: String = "10 minutes",
      statePartitions: Int = 8): DataFrame = ConfScope.nanosAsLong(spark) {
    val src = EventSource.stream(spark, dir)
      .transform(graft.Tables.normalizeTs)
    val sess = src
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sess_value"))
      .select(col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"), col("sess_value"))
    val name = s"stream_sess_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = sess.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("user_id", "sess_start")
  }

  /** Batch twin of [[windowedCounts]] including the append-mode
    * watermark cutoff — used by tests to prove stream/batch
    * equivalence, and mirrored by the DuckDB oracle.
    */
  def windowedCountsBatch(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.events(spark, dir)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"),
        col("window.end").as("window_end"))
      .filter(col("window_end") <= lit(maxTs) - expr("INTERVAL 10 MINUTES"))
      .drop("window_end")
      .orderBy("window_start", "event_type")
  }
}
