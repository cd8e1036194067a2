package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Error-bound checks for the sketch aggregates exposed as q_approx. */
class ApproxSpec extends SparkTestBase {

  test("approx_count_distinct within 5% of exact; percentiles bracket the data") {
    val rows = graft.SparkEntry.queries("q_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL error too high: $approx vs $exact")
      val p50 = r.getAs[Double]("p50")
      val p99 = r.getAs[Double]("p99")
      assert(p50 <= p99)
    }
    // percentile sanity vs exact on the whole column
    val li = graft.Tables.lineitem(spark, sf)
    val exactP50 = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.0).head
    val p50s = rows.map(_.getAs[Double]("p50"))
    assert(p50s.min <= exactP50 * 1.5 && p50s.max >= exactP50 * 0.5)
  }
}
