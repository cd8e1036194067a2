package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class PageRankSpec extends SparkTestBase {

  private def edges = Tables.lineitem(spark, sf)
    .select(col("l_suppkey").as("src"), pmod(col("l_partkey"), lit(100)).as("dst"))

  test("0 iterations is the uniform distribution") {
    val r = PageRank.run(edges, "src", "dst", iters = 0)
    val n = r.count()
    val distinct = r.select(round(col("rank"), 12)).distinct().count()
    assert(distinct == 1)
    val total = r.agg(sum(col("rank"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, s"n=$n total=$total")
  }

  test("ranks are bounded: >= (1-d)/n each; total <= 1 (dangling mass leaks)") {
    val r = PageRank.run(edges, "src", "dst", iters = 3).cache()
    try {
      val n = r.count()
      val floor = 0.15 / n
      assert(r.filter(col("rank") < floor - 1e-12).count() == 0)
      val total = r.agg(sum(col("rank"))).head().getDouble(0)
      assert(total <= 1.0 + 1e-9 && total > 0.15, s"total=$total")
    } finally r.unpersist()
  }

  test("a known chain graph converges to the expected ordering") {
    import spark.implicits._
    // 1→2→3, plus 4→3: node 3 must rank highest, 1 and 4 lowest
    val e = Seq((1L, 2L), (2L, 3L), (4L, 3L)).toDF("src", "dst")
    val r = PageRank.run(e, "src", "dst", iters = 10)
      .orderBy(col("rank").desc).select("node").as[Long].collect()
    assert(r.head == 3L)
    assert(Set(r(2), r(3)) == Set(1L, 4L))
  }
}
