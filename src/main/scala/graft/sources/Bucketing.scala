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

  /** Join two bucketed tables on their bucket key. When both are
    * bucketed by `key` with equal bucket counts, the plan contains no
    * shuffle Exchange.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
