package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.docx.DocxParser

/** Incremental document ingestion: syllabi dropped into a watched
  * directory are parsed, segmented, planned and generated as they
  * arrive — the always-on deployment shape of the reference's batch
  * run (its per-topic iterator generalizes to "per new document",
  * exactly the "Streaming Document Parser" story, reference
  * README.md:39-42, minus the manual re-runs).
  *
  * Design: Spark's `binaryFile` source does incremental file
  * discovery with exactly-once SOURCE offsets, so the docx-specific
  * code is ONE flatMap (DocxParser over the payload bytes). A docx is
  * complete the moment it appears (writers must move/rename files in
  * atomically — the standard file-source contract), so no cross-batch
  * element state is needed: each micro-batch runs the ordinary BATCH
  * pipeline stages inside foreachBatch.
  *
  * Delivery semantics, stated honestly: with a blind-append sink the
  * end-to-end guarantee is AT-LEAST-ONCE — a crash between the sink
  * append and the checkpoint commit replays the batch. For exactly-
  * once, use a sink that is idempotent per epoch (e.g. overwrite an
  * epoch=<batchId> partition, which replays harmlessly).
  *
  * Per-arrival scoping: question ids are prefixed with the epoch, so
  * ids stay unique across micro-batches even when later documents
  * repeat a topic title; the per-topic batch cap likewise applies per
  * arrival (each arrival is its own pipeline run, exactly as re-running
  * the reference on a new file would).
  */
final class StreamingSyllabusPipeline(
    pipeline: SyllabusPipeline) extends Serializable {

  /** elements stream: one row per body-level element of each newly
    * arrived .docx (same schema as the batch docx source). A file
    * whose bytes fail to parse (corrupt / truncated upload) is
    * reported to stderr and skipped — one bad document must not
    * crash-loop the query and block everything behind it.
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
        try {
          val in = new java.io.ByteArrayInputStream(bytes)
          try DocxParser.parse(in).map(e =>
            (docId, e.idx, e.elementType, e.text, e.tableRows))
          finally in.close()
        } catch {
          case e: Exception =>
            System.err.println(s"[docx-stream] skipping unparseable $path: ${e.getMessage}")
            Nil
        }
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
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val topics = Topics.segmentTopics(batch, pipeline.marker)
          val subs = pipeline.extractSubtopics(topics).localCheckpoint()
          val plan = Planner.plan(subs, pipeline.perSubtopic, idsPerTopic = true)
          val spark2 = plan.sparkSession
          import spark2.implicits._
          // epoch prefix: later arrivals repeating a topic title would
          // otherwise restart that topic's numbering and collide
          val scopedPlan = plan.toDF()
            .withColumn("question_id", concat(lit(s"e$epochId-"), col("question_id")))
            .as[PlannedQuestion]
          sink.save(pipeline.generate(scopedPlan, subs))
        }
      }
      .start()
}
