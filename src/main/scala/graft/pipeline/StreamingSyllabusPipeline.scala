package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.docx.{DocxDataSource, DocxParser}

/** Incremental document ingestion: syllabi dropped into a watched
  * directory are parsed, segmented, planned and generated as they
  * arrive — the always-on deployment shape of the reference's batch
  * run (its per-topic iterator generalizes to "per new document",
  * exactly the "Streaming Document Parser" story, reference
  * README.md:39-42, minus the manual re-runs).
  *
  * Design: Spark's `binaryFile` source already does incremental
  * file discovery + exactly-once offsets, so the docx-specific code
  * is ONE flatMap (DocxParser over the payload bytes). A docx is
  * complete the moment it appears, so no cross-batch element state is
  * needed — each micro-batch runs the ordinary BATCH pipeline stages
  * inside foreachBatch and appends through the sink. One moving part,
  * all the tested batch semantics.
  */
final class StreamingSyllabusPipeline(
    pipeline: SyllabusPipeline) extends Serializable {

  /** elements stream: one row per body-level element of each newly
    * arrived .docx (same schema as the batch docx source).
    */
  def elementsStream(spark: SparkSession, watchDir: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", "*.docx")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(watchDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val docId = path.substring(path.lastIndexOf('/') + 1)
        val in = new java.io.ByteArrayInputStream(bytes)
        try DocxParser.parse(in).map(e =>
          (docId, e.idx, e.elementType, e.text, e.tableRows))
        finally in.close()
      }
      .toDF("doc_id", "element_idx", "element_type", "text", "table_rows")
  }

  /** Start the incremental pipeline: every micro-batch of newly
    * arrived documents flows through the batch stages and is appended
    * via `sink`. Returns the running query (caller stops it).
    */
  def start(spark: SparkSession, watchDir: String, sink: OutputManager,
      checkpointDir: String): StreamingQuery =
    elementsStream(spark, watchDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val topics = Topics.segmentTopics(batch, pipeline.marker)
          val subs = pipeline.extractSubtopics(topics).localCheckpoint()
          val plan = Planner.plan(subs, pipeline.perSubtopic, idsPerTopic = true)
          sink.save(pipeline.generate(plan, subs))
        }
      }
      .start()
}
