package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IntervalJoinStreamSpec extends SparkTestBase {

  test("stream-stream interval join equals the batch interval join") {
    val streamed = EventStream.intervalJoinStream(spark, sf)
      .select("user_id", "signup_event", "purchase_event").collect().toSet
    val ev = graft.Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
        col("event_id").as("signup_event"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_event"))
    val batch = l.join(r, expr(
      "s_user = p_user AND p_ts >= s_ts AND p_ts <= s_ts + interval 2 hours"))
      .select(col("s_user").as("user_id"), col("signup_event"), col("purchase_event"))
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("both join state stores carry watermark eviction (bounded state)") {
    // the plan must show event-time watermarks on BOTH inputs — without
    // them a stream-stream join buffers each side forever
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    def src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .transform(graft.Tables.normalizeTs)
    val lhs = src.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "1 hour")
    val rhs = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = lhs.join(rhs, expr(
      "s_user = p_user AND purchase_ts >= signup_ts AND purchase_ts <= signup_ts + interval 2 hours"))
    val analyzed = joined.queryExecution.analyzed.toString
    assert(analyzed.contains("EventTimeWatermark"))
    assert("EventTimeWatermark".r.findAllIn(analyzed).size == 2,
      s"expected watermarks on both join inputs:\n$analyzed")
  }
}
