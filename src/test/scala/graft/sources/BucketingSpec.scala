package graft.sources

import org.apache.spark.sql.execution.exchange.Exchange

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {

  test("bucketed tables join with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val o = graft.Tables.orders(spark, sf)
      val c = graft.Tables.customer(spark, sf)
        .withColumnRenamed("c_custkey", "o_custkey")
      Bucketing.writeBucketed(o, "orders_b", "o_custkey", 4)
      Bucketing.writeBucketed(c, "customer_b", "o_custkey", 4)
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty, s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
      // equivalent rows to the plain join
      assert(joined.count() ==
        o.join(c, "o_custkey").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
