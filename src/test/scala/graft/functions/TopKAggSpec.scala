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

  test("output is sorted best-first with ties by id, capped at k") {
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 9L), (1L, 7.0, 11L),
      (1L, 1.0, 12L), (1L, 6.0, 13L)).toDF("g", "score", "id")
    val agg = TopKAgg.topK(3)
    val top = df.groupBy(col("g")).agg(agg(col("score"), col("id")).as("top"))
      .select(col("top")).as[Seq[(Double, Long)]].head()
    assert(top == Seq((7.0, 11L), (6.0, 13L), (5.0, 9L)))
  }
}
