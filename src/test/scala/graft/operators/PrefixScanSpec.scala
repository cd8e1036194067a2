package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The distributed two-phase prefix scan must equal the
  * single-partition global window for any data/partition-count
  * combination (including partitions left empty by range bounds), and
  * the KS statistic built on it must equal an independent in-memory
  * sorted-merge reference.
  */
class PrefixScanSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    var a = 0L; var b = 0L
    rows.sortBy(_._1).map { case (v, c1, c2) =>
      a += c1; b += c2; (v, a, b)
    }
  }

  test("cumulative sums equal the global-window reference") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 5, 100, 1000); parts <- Seq(4, 32)) {
      val rows = Seq.fill(n)(rnd.nextLong(10000))
        .distinct.map(v => (v, rnd.nextLong(5), rnd.nextLong(5)))
      val got = PrefixScan.withCumSums(
        rows.toDF("v", "c1", "c2"), "v", Seq("c1", "c2"), parts)
        .select("v", "cum_c1", "cum_c2").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      assert(got == reference(rows), s"n=$n parts=$parts")
    }
  }

  test("more partitions than distinct values (empty partitions get offsets)") {
    val rows = Seq((1L, 2L, 0L), (9L, 1L, 3L))
    val got = PrefixScan.withCumSums(rows.toDF("v", "c1", "c2"),
      "v", Seq("c1", "c2"), 16)
      .select("v", "cum_c1", "cum_c2").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 0L), (9L, 3L, 3L)))
  }

  test("no single-partition window in the plan") {
    val df = PrefixScan.withCumSums(
      (1L to 500L).map(v => (v, 1L)).toDF("v", "c"), "v", Seq("c"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), p.take(1200))
    // the range exchange itself sits behind the localCheckpoint (the
    // plan shows its materialized RDD); what must be visible is the
    // running window keyed on the partition id — parallel across
    // partitions, never a global sort-scan
    assert(p.contains("Exchange hashpartitioning(__pid"), p.take(1200))
  }

  test("q_ks_test statistic equals the in-memory sorted-merge reference") {
    // independent KS: pooled sorted values, running ECDF diff
    def ksNum(x: Seq[Double], y: Seq[Double]): Long = {
      val support = (x ++ y).distinct.sorted
      val n2 = y.size.toLong; val n1 = x.size.toLong
      support.map(v =>
        math.abs(x.count(_ <= v) * n2 - y.count(_ <= v) * n1)).max
    }
    val df = graft.Tables.orders(spark, sf).select(
      col("o_totalprice").as("v"),
      (col("o_orderdate") < lit("1998-01-01").cast("timestamp")).as("pre"))
      .as[(Double, Boolean)].collect()
    val expected = ksNum(df.filter(_._2).map(_._1).toSeq,
      df.filterNot(_._2).map(_._1).toSeq)
    val got = graft.SparkEntry.queries("q_ks_test")(spark, sf)
      .select("d_num").as[Long].head()
    assert(got == expected)
  }
}
