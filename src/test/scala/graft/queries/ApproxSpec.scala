package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Error-bound checks for the sketch aggregates exposed as q_approx.
  * Since round 8 the bounds are asserted IN the query (boolean flag
  * columns the oracle states as TRUE); this spec checks the flags and
  * independently recomputes the raw sketch values against exact.
  */
class ApproxSpec extends SparkTestBase {

  test("all in-query sketch bounds hold; raw recompute agrees") {
    val rows = graft.SparkEntry.queries("q_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"), s"approx_count_distinct out of bounds: $r")
      assert(r.getAs[Boolean]("p50_ok"), s"p50 out of bounds: $r")
      assert(r.getAs[Boolean]("p99_ok"), s"p99 out of bounds: $r")
    }
    // independent raw recompute: HLL within 5% of exact per group
    val li = graft.Tables.lineitem(spark, sf)
    li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect().foreach { r =>
        val a = r.getLong(1).toDouble; val e = r.getLong(2).toDouble
        assert(math.abs(a - e) / e <= 0.05, s"HLL error too high: $a vs $e")
      }
  }
}
