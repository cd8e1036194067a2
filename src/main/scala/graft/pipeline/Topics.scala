package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Segmentation

/** elements → topics: the reference's streaming topic segmentation
  * (O2–O6, document_parser/syllabus_parser.py:48-154) as one
  * declarative query over the `elements` schema emitted by the docx
  * source.
  *
  * Semantics preserved exactly (SegmentationSpec + the golden fixture
  * test assert each):
  *  - empty/whitespace-only paragraphs are dropped BEFORE segmentation
  *    (syllabus_parser.py:61) — order matters, a whitespace marker
  *    can't open a topic;
  *  - a marker paragraph closes the previous topic and belongs to the
  *    NEW topic (syllabus_parser.py:138-146);
  *  - the preamble before the first marker is discarded
  *    (syllabus_parser.py:147-149);
  *  - the last topic is flushed at end of document
  *    (syllabus_parser.py:151-153);
  *  - duplicate titles stay per-occurrence, keyed (doc_id, topic_seq)
  *    (fixture: 13 markers over 6 distinct titles, FIXTURES.md).
  *
  * Scale: the window and the grouped collect both partition by doc_id
  * — the document is the parallel unit; one hash shuffle end-to-end
  * (the groupBy reuses the window's partitioning).
  */
object Topics {

  /** Marker-title extraction (syllabus_parser.py:85-93): strip the
    * marker substring (spaced or not — "Core elementChemical
    * reactions" occurs in the fixture) and trim ` -:`.
    */
  def titleOf(text: org.apache.spark.sql.Column, marker: String): org.apache.spark.sql.Column =
    Segmentation.cleanTitle(trim(text), marker)

  /** Segment an `elements` DataFrame (docx-source schema) into a
    * `Dataset[SyllabusTopic]`.
    */
  def segmentTopics(elements: DataFrame, marker: String = "Core element"): Dataset[SyllabusTopic] = {
    val spark = elements.sparkSession
    import spark.implicits._
    val kept = elements.filter(
      (col("element_type") === "paragraph" && trim(col("text")) =!= "") ||
        col("element_type") === "table")
    val isMarker = col("element_type") === "paragraph" && col("text").contains(marker)
    Segmentation.segment(kept, col("doc_id"), isMarker, col("element_idx"))
      .withColumn("marker_title", when(isMarker, titleOf(col("text"), marker)))
      .groupBy(col("doc_id"), col("segment").as("topic_seq"))
      .agg(
        // the marker is the segment's first row; it is the only row
        // with a non-null marker_title within rows-unbounded windows
        // opened by it, so min_by on element_idx over non-null titles
        // recovers it without a second window pass
        min_by(col("marker_title"), when(col("marker_title").isNotNull, col("element_idx")))
          .as("title"),
        sort_array(collect_list(struct(
          col("element_idx"), col("element_type"),
          col("text"), col("table_rows")))).as("elements"))
      .as[SyllabusTopic]
  }

  /** Convenience: docx file(s) → topics. */
  def fromDocx(spark: org.apache.spark.sql.SparkSession, path: String,
      marker: String = "Core element"): Dataset[SyllabusTopic] =
    segmentTopics(spark.read.format("docx").load(path), marker)
}
