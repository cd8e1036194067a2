package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables
  * (/root/repo/TESTDATA.md). Every query takes the sf directory as a
  * parameter so the same code runs at any scale factor; at cluster
  * scale the same `spark.read.parquet` call reads a partitioned
  * directory tree and Catalyst prunes partitions/columns as usual.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** Normalize `events.ts` to the engine's session-zone
    * TimestampType whatever the physical parquet encoding — the
    * driver has shipped two generations of test data:
    *
    *  - nanosecond timestamps, which Spark's vectorized reader
    *    rejects ([PARQUET_TYPE_ILLEGAL]) and the legacy nanosAsLong
    *    conf surfaces as raw LONG epoch-nanos: floor-convert with
    *    integer `div` (NOT double division — epoch-nanos ~1.7e18
    *    exceeds double's 53-bit mantissa and a float path would
    *    corrupt microseconds). DuckDB truncates ns→µs the same way.
    *  - native microsecond timestamps without UTC adjustment, which
    *    Spark infers as TIMESTAMP_NTZ: cast to TimestampType, an
    *    identity wall-time mapping under the UTC session — exactly
    *    how DuckDB's naive TIMESTAMP treats the same values.
    *
    * Works on batch and streaming DataFrames alike (schema-driven,
    * no action).
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** documents, repartitioned to the session's full parallelism.
    *
    * The test corpus is one small parquet file → one input partition →
    * CPU-heavy per-row work (shingling, hashing, decode) runs on a
    * single core no matter how many the session has. A round-robin
    * repartition before such work costs one narrow-ish shuffle of the
    * raw text and buys full-core scaling. On a real multi-file corpus
    * the scan is already parallel and this becomes a no-op choice —
    * callers doing cheap columnar work should keep using documents().
    */
  def documentsParallel(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(s.sparkContext.defaultParallelism)
}
