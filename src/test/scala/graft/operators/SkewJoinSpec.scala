package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val probe = graft.Tables.lineitem(spark, sf)
    val build = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val plain = probe.join(build, "l_orderkey")
      .groupBy("o_custkey").count()
    val salted = SkewJoin.saltedInnerJoin(probe, build, "l_orderkey",
      probeTiebreak = "l_linenumber", saltFactor = 4)
      .groupBy("o_custkey").count()
    assert(plain.except(salted).count() == 0 && salted.except(plain).count() == 0)
  }

  test("salt splits a hot key across saltFactor groups") {
    val hot = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("k", "id")
    val salted = hot.withColumn("_salt",
      pmod(xxhash64(col("id")), lit(8)).cast("int"))
    assert(salted.select("_salt").distinct().count() == 8)
  }

  test("probe frames with map columns (and null tiebreaks) still join") {
    // xxhash64 rejects MapType — the whole-row null-tiebreak spread
    // must skip unhashable columns instead of failing analysis
    val probe = Seq((1L, Some(10L)), (1L, None), (2L, Some(20L)))
      .toDF("k", "tb")
      .withColumn("props", map(lit("a"), lit("b")))
    val build = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val out = SkewJoin.saltedInnerJoin(probe, build, "k", "tb", saltFactor = 4)
    assert(out.count() == 3)
  }

  test("keyHistogram surfaces the heaviest keys first") {
    val df = Seq.fill(50)((1L, "x")).toDF("k", "v")
      .union(Seq.fill(3)((2L, "y")).toDF("k", "v"))
    val h = SkewJoin.keyHistogram(df, "k").as[(Long, Long)].collect()
    assert(h.head == ((1L, 50L)) && h(1) == ((2L, 3L)))
  }
}
