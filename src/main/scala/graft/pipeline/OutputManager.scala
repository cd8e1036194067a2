package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

/** Sink seam (reference O18, output_manager/base_output_manager.py:6-13
  * — the ABC injected at main.py:18-21).
  */
trait OutputManager extends Serializable {
  def save(questions: Dataset[Question]): Unit
}

/** Per-topic JSON sink (reference O13,
  * output_manager/file_output_manager.py:34-69).
  *
  * The reference read-modify-writes one `{topic}.json` per topic —
  * which both merges duplicate topic titles into one file (observable
  * semantics kept: partitioning by title does the same) and races
  * under parallelism (deliberately NOT kept: append-mode partitioned
  * writes accumulate without rewriting, SURVEY.md §7.5). Each record
  * still carries its full Question payload including `topic` — the
  * partition column is a duplicate so the golden schema
  * (README.md:248-277) survives in the files.
  */
final class JsonOutputManager(dir: String) extends OutputManager {
  ensureValidDirectory()

  /** O16 (file_output_manager.py:17-32): target must not be an
    * existing regular file; directories are created by the writer.
    */
  private def ensureValidDirectory(): Unit = {
    val p = new Path(dir)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf()).getOrElse(new Configuration())
    val fs = p.getFileSystem(conf)
    if (fs.exists(p) && fs.getFileStatus(p).isFile)
      throw new IllegalArgumentException(s"output path is a file, not a directory: $dir")
  }

  override def save(questions: Dataset[Question]): Unit =
    questions
      .withColumn("topic_dir", col("topic"))
      .write.partitionBy("topic_dir").mode("append").json(dir)
}

/** Parquet sink — the scale-path default for a 100 TB corpus. */
final class ParquetOutputManager(dir: String) extends OutputManager {
  override def save(questions: Dataset[Question]): Unit =
    questions.write.mode("append").parquet(dir)
}

/** Idempotent per-topic JSON sink for the resumable pipeline
  * ([[SyllabusPipeline.runResumable]]): DYNAMIC partition overwrite
  * replaces exactly the topic partitions present in this save and
  * leaves every other topic's files untouched. Re-saving a topic
  * (the at-least-once window when a run dies between the sink write
  * and its manifest commit) therefore converges to the same files a
  * clean run writes — at-least-once execution + idempotent sink =
  * exactly-once output, the same trick the streaming side's
  * [[graft.streaming.IdempotentSink]] plays per epoch.
  */
final class ResumableJsonOutputManager(dir: String) extends OutputManager {
  override def save(questions: Dataset[Question]): Unit =
    questions
      .withColumn("topic_dir", col("topic"))
      .write.partitionBy("topic_dir")
      // writer-local option — takes precedence over the session conf,
      // so no session-global mutation (static default mode would wipe
      // the whole directory on every group save)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").json(dir)
}
