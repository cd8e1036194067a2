package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered segmentation (sessionization by marker rows).
  *
  * Spark-native restatement of the reference's single-pass stateful
  * topic segmentation (reference: document_parser/syllabus_parser.py:118-154):
  * a marker row closes the previous segment and opens a new one, the
  * marker row belongs to the NEW segment, and rows before the first
  * marker are dropped.
  *
  * The classic relational encoding is a running sum of the marker
  * indicator over the per-partition event order:
  *
  * {{{
  *   segment = sum(is_marker) over (partition by key order by ord
  *                                  rows unbounded preceding)
  *   ... where segment >= 1
  * }}}
  *
  * Scale notes: the window partitions by the grouping key (document /
  * user), so parallelism = number of keys — segments never cross keys,
  * no global sort is needed, and the shuffle is a single hash
  * repartition on the key. Catalyst cannot push filters through an
  * order-dependent running sum, so callers must pre-filter rows that
  * should not participate (the reference does the same: its empty-
  * paragraph filter runs before segmentation).
  */
object Segmentation {

  /** Adds a `segment` column: running count of marker rows per key in
    * `ord` order, with pre-first-marker rows removed (segment >= 1).
    * `ord` must be a deterministic total order within each key — pass
    * a tiebreaker column if the primary order column can collide.
    */
  def segment(df: DataFrame, key: Column, isMarker: Column, ord: Column*): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("segment", sum(isMarker.cast("long")).over(w))
      .filter(col("segment") >= 1)
  }

  /** Marker-title cleanup (reference: syllabus_parser.py:85-93):
    * remove the marker substring, then python-.strip() ALL whitespace
    * (Spark's trim() strips spaces only — the fixture's titles carry
    * tabs), then strip the ` -:` charset; the two strips stay
    * sequential for exact reference parity. Built-ins only — stays
    * inside whole-stage codegen.
    */
  def cleanTitle(text: Column, marker: String): Column = {
    val noMarker = regexp_replace(text, java.util.regex.Pattern.quote(marker), "")
    trim(regexp_replace(noMarker, "^\\s+|\\s+$", ""), " -:")
  }
}
