package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Plan-SHAPE guards for the NN-descent graph build (VERDICT r13
  * next-round #1): the default build must never materialize n² pairs
  * (no cartesian/nested-loop join), never broadcast the corpus (the
  * only broadcasts are bounded local relations), and never run a
  * single-partition exchange (the r13 ring window's failure mode).
  * Asserted on the UNMATERIALIZED plans of the stages that touch
  * corpus-scale data — the ring-position scan and one descent round —
  * with the auto-broadcast threshold disabled so only EXPLICIT
  * broadcast hints appear in the plan (AQE's small-table broadcasts
  * at fixture size would otherwise mask a real corpus broadcast).
  */
class GraphBuildPlanSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding")

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertScaleSafe(plan: String, what: String): Unit = {
    assert(!plan.contains("Exchange SinglePartition"),
      s"$what plan funnels through one partition:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"$what plan materializes a cartesian pair set:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$what plan nested-loops over a broadcast side:\n$plan")
  }

  private def withNoAutoBroadcast[A](f: => A): A = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try f finally spark.conf.set(k, prev)
  }

  test("ring positions: distributed PrefixScan, no single-partition window, no corpus broadcast") {
    withNoAutoBroadcast {
      val ring = GraphIndex.ringEdges(emb, "vec_id", Seq(1, 2, 4), emb.count())
      val plan = planOf(ring)
      assertScaleSafe(plan, "ringEdges")
      // the only broadcast is PrefixScan's bounded per-partition
      // offset map (a driver-local relation), never a table scan
      val broadcasts = plan.split("\n").filter(_.contains("BroadcastExchange"))
      assert(broadcasts.forall(!_.contains("parquet")),
        s"ringEdges broadcasts a corpus scan:\n$plan")
      // and it is still the RIGHT positions: row_number over (md5, id)
      val expect = emb
        .withColumn("_r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(md5(col("vec_id").cast("string").cast("binary")),
              col("vec_id"))))
        .select(col("vec_id"), (col("_r") - 1).cast("long").as("pos"))
      val n = emb.count()
      val got = ring.filter(lit(true)) // (src, nb) at offsets 1,2,4
      // offset-1 edges: nb is the next id in md5 order (mod n)
      val nextOf = expect.as("a").join(expect.as("b"),
          col("b.pos") === (col("a.pos") + 1) % n)
        .select(col("a.vec_id").as("src"), col("b.vec_id").as("nb"))
        .as[(Long, Long)].collect().toSet
      val off1 = got.as[(Long, Long)].collect().toSet
      assert(nextOf.subsetOf(off1), "PrefixScan ring diverged from the window ordering")
    }
  }

  test("descent round: hash joins + bounded heaps only — no cartesian, no corpus broadcast, no single partition") {
    withNoAutoBroadcast {
      val vecs = emb.select($"vec_id".as("_vid"), $"embedding".as("_vv"))
      val ring = GraphIndex.ringEdges(emb, "vec_id", Seq(1, 2, 4), emb.count())
      val undir = ring.unionAll(ring.select($"nb".as("src"), $"src".as("nb")))
        .distinct()
      val b0 = GraphIndex.topMEdges(GraphIndex.scorePairs(undir, vecs), 8)
        .withColumn("_new", lit(true))
        .localCheckpoint()
      val round = GraphIndex.descentRound(b0, vecs, 16, 16)
      val plan = planOf(round)
      assertScaleSafe(plan, "descentRound")
      assert(!plan.contains("BroadcastExchange"),
        s"descentRound broadcasts a relation — at corpus scale every input here is corpus-sized:\n$plan")
      // the pair cut is the bounded TopKAgg (partial aggregation),
      // never a full window sort
      assert(!plan.contains("RunningWindowFunction") || !plan.contains("row_number"),
        s"descentRound sorts candidates through a window:\n$plan")
    }
  }

  test("buildExact gate: corpus broadcast only below maxBroadcastRows (ADVICE r13)") {
    // contrast arm: gate at 0 forces the non-broadcast fallback
    val gated = GraphIndex.buildExact(emb, "vec_id", "embedding",
      maxBroadcastRows = 0L)
    val open = GraphIndex.buildExact(emb, "vec_id", "embedding")
    // same edges either way (the gate changes the plan, not the result)
    assert(gated.select("src", "nb").as[(Long, Long)].collect().toSet ==
      open.select("src", "nb").as[(Long, Long)].collect().toSet)
  }

  test("NN-descent default build ~= exact kNN edges (quality floor) and full determinism") {
    // exactThreshold = 0 forces the DESCENT branch — the default
    // dispatch routes fixture-sized corpora to buildExact (r15 #3)
    val a1 = GraphIndex.build(emb, "vec_id", "embedding", exactThreshold = 0L)
      .select("src", "nb")
    val a2 = GraphIndex.build(emb, "vec_id", "embedding", exactThreshold = 0L)
      .select("src", "nb")
    assert(a1.as[(Long, Long)].collect().toSet ==
      a2.as[(Long, Long)].collect().toSet, "NN-descent build not deterministic")
    val exact = GraphIndex.buildExact(emb, "vec_id", "embedding")
      .select("src", "nb")
    val overlap = a1.intersect(exact).count().toDouble / exact.count()
    assert(overlap >= 0.8,
      s"NN-descent edge overlap vs exact = $overlap — descent regressed")
  }
}
