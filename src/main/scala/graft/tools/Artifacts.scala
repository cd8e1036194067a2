package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hadoop-FS helpers for DURABLE serving artifacts (saved indexes) —
  * unlike [[Scratch]]'s java.io locals, these resolve the path's own
  * FileSystem, so the same maintenance code runs against HDFS/object
  * stores at cluster scale.
  */
object Artifacts {

  private def fs(spark: SparkSession,
      path: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (f, p) = fs(spark, path)
    f.exists(p)
  }

  def deleteDir(spark: SparkSession, path: String): Unit = {
    val (f, p) = fs(spark, path)
    f.delete(p, true)
    ()
  }

  /** Atomically-ish replace a parquet directory with `df`'s rows:
    * write to a `_compact_tmp` sibling FIRST (the expensive,
    * failure-prone step — the original layout stays intact if it
    * dies), then delete + rename. The compaction primitive of the
    * tombstone-delete protocol: readers between the delete and the
    * rename see either the old layout or the new, never a partial
    * write.
    */
  def replaceDir(spark: SparkSession, dir: String, df: DataFrame,
      partitionCols: Seq[String] = Nil): Unit = {
    val tmp = dir + "_compact_tmp"
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp)
    val (f, dP) = fs(spark, dir)
    f.delete(dP, true)
    f.rename(new org.apache.hadoop.fs.Path(tmp), dP)
    ()
  }
}
