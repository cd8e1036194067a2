package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Source/sink breadth: the engine round-trips its tables through
  * every format a training-data pipeline meets (parquet is the
  * default path everywhere else; CSV and JSON are the interchange
  * formats). Schema fidelity + row equality asserted.
  */
class RoundTripSpec extends SparkTestBase {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("csv round-trip preserves rows (header + explicit schema read-back)") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "source", "n_chars") // text has newlines; csv needs quoting
    val dir = tmp("graft_csv")
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(dir)
    assert(back.count() == docs.count())
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
  }

  test("json round-trip preserves rows incl. nested arrays") {
    val emb = graft.Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>")) // json has no float32
    val dir = tmp("graft_json")
    emb.write.mode("overwrite").json(dir)
    val back = spark.read.schema(emb.schema).json(dir)
    assert(back.count() == emb.count())
    assert(back.except(emb).count() == 0 && emb.except(back).count() == 0)
  }

  test("orc round-trip preserves rows incl. nested arrays") {
    val emb = graft.Tables.embeddings(spark, sf)
    val dir = tmp("graft_orc")
    emb.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == emb.count())
    assert(back.select("vec_id", "label").except(emb.select("vec_id", "label")).count() == 0)
  }

  test("streaming file sink writes exactly-once parquet with a checkpoint") {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val out = tmp("graft_stream_sink")
    val ckpt = tmp("graft_stream_ckpt")
    val q = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
      .transform(graft.Tables.normalizeTs)
      .select("event_id", "ts", "event_type", "value")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val written = spark.read.parquet(out)
    assert(written.count() == graft.Tables.events(spark, sf).count())
  }

  test("partitioned parquet write prunes partitions on read") {
    val docs = graft.Tables.documents(spark, sf)
    val dir = tmp("graft_part")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val scanned = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scanned.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pushed:\n$scanned")
    assert(one.count() == docs.filter(col("lang") === "en").count())
  }
}
