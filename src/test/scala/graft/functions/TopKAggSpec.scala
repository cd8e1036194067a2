package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("grouped top-k equals the window row_number formulation") {
    val orders = graft.Tables.orders(spark, sf)
    val agg = TopKAgg.topK(3)
    val viaAgg = orders.groupBy(col("o_custkey"))
      .agg(agg(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("t"))
      .select(col("o_custkey"), col("t._1").as("price"), col("t._2").as("key"))
      .as[(Long, Double, Long)].collect().toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("property: reduce/merge equal sort-take on random data, any k") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 60)
      scores <- Gen.listOfN(n, Gen.choose(-5, 5).map(_.toDouble))
    } yield scores.zipWithIndex.map { case (s, i) => (s, i.toLong) }
    (0 until 40).foreach { trial =>
      val rows = gen.pureApply(Gen.Parameters.default, Seed(7L + trial))
      val k = 1 + trial % 7
      val a = new TopKAgg(k)
      // reduce path
      val viaReduce = rows.foldLeft(a.zero)(a.reduce)
      // merge path: fold in two halves, merge (the shuffle combine)
      val (l, r) = rows.splitAt(rows.size / 2)
      val viaMerge = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
      val expect = rows.sortBy { case (s, i) => (-s, i) }.take(k)
      assert(viaReduce == expect, s"reduce trial=$trial k=$k")
      assert(viaMerge == expect, s"merge trial=$trial k=$k")
    }
  }

  test("output is sorted best-first with ties by id, capped at k") {
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 9L), (1L, 7.0, 11L),
      (1L, 1.0, 12L), (1L, 6.0, 13L)).toDF("g", "score", "id")
    val agg = TopKAgg.topK(3)
    val top = df.groupBy(col("g")).agg(agg(col("score"), col("id")).as("top"))
      .select(col("top")).as[Seq[(Double, Long)]].head()
    assert(top == Seq((7.0, 11L), (6.0, 13L), (5.0, 9L)))
  }
}
