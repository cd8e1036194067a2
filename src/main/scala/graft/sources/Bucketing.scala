package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the co-located-join lever for repeated
  * large⋈large joins on a stable key (SURVEY.md §7 scale mandate).
  *
  * Writing both sides bucketed by the join key with the same bucket
  * count lets Spark plan a SortMergeJoin with NO shuffle exchange on
  * either side — at 100 TB the bucketed layout amortizes the one-time
  * shuffle across every subsequent join/aggregation on that key.
  * (Verified no-Exchange in BucketingSpec.)
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed: spark.sql.warehouse.dir

  /** [[writeBucketed]], replacing any previous incarnation: drops the
    * catalog entry AND clears a leftover managed location. A managed
    * table written by an earlier session leaves its warehouse
    * directory behind after the in-memory catalog is gone, and
    * saveAsTable then fails with LOCATION_ALREADY_EXISTS even in
    * overwrite mode.
    */
  def replaceBucketed(spark: SparkSession, df: DataFrame, table: String,
      key: String, buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    writeBucketed(df, table, key, buckets)
  }

  /** Join two bucketed tables on their bucket key. When both are
    * bucketed by `key` with equal bucket counts, the plan contains no
    * shuffle Exchange.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
