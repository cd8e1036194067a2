package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Reference parity cases from SURVEY.md §5.2(1): pre-marker rows
  * dropped, marker opens (and belongs to) its own segment, last
  * segment flushed, no markers ⇒ empty, duplicate titles stay
  * per-occurrence.
  */
class SegmentationSpec extends SparkTestBase {
  import spark.implicits._

  private def seg(rows: Seq[(Long, Long, String)]) =
    Segmentation.segment(
      rows.toDF("key", "ord", "text"),
      col("key"), col("text").startsWith("MARK"), col("ord"))

  test("pre-first-marker rows are dropped; marker belongs to new segment") {
    val out = seg(Seq(
      (1L, 0L, "preamble"), (1L, 1L, "also preamble"),
      (1L, 2L, "MARK a"), (1L, 3L, "body"),
      (1L, 4L, "MARK b"), (1L, 5L, "tail")))
      .select("ord", "segment").as[(Long, Long)].collect().toMap
    assert(!out.contains(0L) && !out.contains(1L))
    assert(out(2L) == 1 && out(3L) == 1)
    assert(out(4L) == 2 && out(5L) == 2)
  }

  test("no markers => no segments") {
    assert(seg(Seq((1L, 0L, "a"), (1L, 1L, "b"))).count() == 0)
  }

  test("every post-marker row lands in exactly one segment; segment count = marker count") {
    val rows = (0L until 100L).map(i =>
      (i % 3, i, if (i % 7 == 0) s"MARK $i" else s"body $i"))
    val out = seg(rows)
    val markersPerKey = rows.groupBy(_._1).map { case (k, rs) =>
      // only markers at-or-after the first marker of the key count,
      // which is all of them by construction here
      k -> rs.count(_._3.startsWith("MARK"))
    }
    val segsPerKey = out.groupBy("key").agg(countDistinct("segment").as("n"))
      .as[(Long, Long)].collect().toMap
    markersPerKey.foreach { case (k, n) => assert(segsPerKey(k) == n.toLong) }
    // row preservation: every row whose ord >= first marker ord of its key survives
    val firstMark = rows.filter(_._3.startsWith("MARK")).groupBy(_._1)
      .map { case (k, rs) => k -> rs.map(_._2).min }
    val expected = rows.count(r => firstMark.get(r._1).exists(r._2 >= _))
    assert(out.count() == expected)
  }

  test("duplicate marker titles produce distinct segments (SURVEY §7.5)") {
    val out = seg(Seq(
      (1L, 0L, "MARK same"), (1L, 1L, "x"),
      (1L, 2L, "MARK same"), (1L, 3L, "y")))
    assert(out.select(countDistinct("segment")).as[Long].head() == 2)
  }

  test("cleanTitle strips marker + ' -:' charset like the reference (syllabus_parser.py:85-93)") {
    val df = Seq("Core element - Chemical reactions:",
      "Core elementChemical reactions", // unspaced variant (FIXTURES.md)
      "  - Organic chemistry -  ").toDF("t")
    val got = df.select(Segmentation.cleanTitle(col("t"), "Core element")).as[String].collect()
    assert(got(0) == "Chemical reactions")
    assert(got(1) == "Chemical reactions")
    assert(got(2) == "Organic chemistry")
  }
}
