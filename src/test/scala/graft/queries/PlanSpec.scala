package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** Physical-plan regression guards: the scale properties each query
  * depends on must survive refactors — a silently regressed plan
  * (lost pushdown, a dropped broadcast, a global sort where a top-k
  * heap should be) is a 100TB incident that a row-equality test will
  * never catch.
  */
class PlanSpec extends SparkTestBase {

  private def plan(q: String): String =
    graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  private def leafScans(q: String): Seq[String] =
    graft.SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
      .collectLeaves().map(_.toString)

  test("q_scan pushes the sargable filter into the parquet scan") {
    val scan = leafScans("q_scan").head
    assert(scan.contains("PushedFilters: [IsNotNull(lang), IsNotNull(text), EqualTo(lang,en)]"),
      scan.take(500))
  }

  test("q_join_broadcast broadcasts every dimension") {
    val p = plan("q_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(800))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_topk plans as a top-k heap, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("q_agg aggregates partially before the shuffle") {
    val p = plan("q_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(800))
  }

  test("dedup signatures stay in whole-stage codegen with no shuffle before the signature") {
    val df: DataFrame = graft.dedup.Dedup.simhash(
      graft.Tables.documents(spark, sf), "doc_id", "text")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(500)) // pure row pipeline
    assert(p.contains("*(1)"), p.take(500)) // the whole-stage-codegen marker
  }

  test("q_asof is a union+window plan — no join operator, bounded shuffles") {
    val p = plan("q_asof")
    assert(!p.contains("Join"), p.take(600)) // union+window formulation
    // one hash exchange for the window, one for the right-side
    // (user, ts) dedup — never a per-row range probe
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(800))
  }

  test("q_join_semi/anti plan as semi/anti hash joins") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("q_knn_join broadcasts the probe side and aggregates top-k partially") {
    val p = plan("q_knn_join")
    // bounded probe set rides a broadcast; the corpus is never shuffled
    // pre-score, and TopKAgg combines map-side (≤k rows/probe/partition
    // through the one exchange)
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("partial_topkagg"), p.take(800))
    assert(!p.contains("CartesianProduct"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(800))
  }

  test("q_unpivot is one scan + partial agg + Expand (no re-scan per metric)") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"), p.take(800))
    assert(p.contains("partial_sum"), p.take(800))
    assert("FileScan parquet".r.findAllIn(p).size == 1, p.take(800))
  }

  test("q_partition_prune lists only the lang=en partition") {
    val p = plan("q_partition_prune")
    assert(p.contains("PartitionFilters: [isnotnull(lang"), p.take(1200))
    // the predicate must NOT survive as a post-scan data filter
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"), p.take(1200))
  }

  test("q_dpp prunes fact partitions DYNAMICALLY from the dim subquery") {
    val p = plan("q_dpp")
    // the fact scan's partition filters must carry a dynamic-pruning
    // subquery — without it the join still returns the same rows
    // (which is why only a plan assertion can catch the regression)
    assert(p.contains("dynamicpruning"), p.take(1500))
  }

  test("q_funnel pushes stage filters into the event scans") {
    val p = plan("q_funnel")
    assert(p.contains("EqualTo(event_type,signup)"), p.take(1200))
    assert(p.contains("EqualTo(event_type,view)"), p.take(1200))
    assert(p.contains("EqualTo(event_type,purchase)"))
  }

  test("q_bloom_join probes the bloom filter below the semi join") {
    val p = plan("q_bloom_join")
    assert(p.contains("graft_bloom_contains"), p.take(1200))
    assert(p.contains("LeftSemi"), p.take(1200))
    // the probe is a Filter under the join, printed after it top-down
    assert(p.indexOf("graft_bloom_contains") > p.indexOf("LeftSemi"), p.take(1500))
  }

  test("q_asof_native plans the custom sorted-merge operator, not a window") {
    val p = plan("q_asof_native")
    assert(p.contains("AsOfJoin"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q_heavyhitters exact count runs over the collected candidate set only") {
    // the cms probe runs in the eager candidate phase (not part of
    // the returned plan); the returned plan must be an IN filter over
    // the bounded candidate list + a partial-aggregated exact count
    val p = plan("q_heavyhitters")
    assert(p.contains("INSET") || p.contains(" IN ("), p.take(1500))
    assert(p.contains("partial_count"), p.take(1500))
    assert(!p.contains("Join"), p.take(1500)) // no semi-join of the token stream
  }

  test("q_zorder computes z-values inline (no UDF, no join) with one partial-agg shuffle") {
    val p = plan("q_zorder")
    assert(p.contains("shiftright"), p.take(800)) // interleave is column arithmetic
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("UDF"), p.take(800))
    assert(p.contains("partial_min"), p.take(800)) // map-side stats combine
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("q_quality_model scores without any vocabulary join (hashing trick)") {
    val p = plan("q_quality_model")
    assert(!p.contains("Join"), p.take(800))
    assert(p.contains("partial_sum"), p.take(800)) // weight sum combines map-side
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("q_phrase prunes postings to the phrase terms before an equi-join (never cartesian)") {
    val p = plan("q_phrase")
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    // the term prune sits under the join, not after it
    assert(p.contains("IN (hash,join)"), p.take(1500))
  }

  test("q_hybrid_search rank windows read only the top-100 leg cuts") {
    val p = plan("q_hybrid_search")
    // each leg is a bounded TakeOrdered heap, then the final fusion cut
    assert("TakeOrderedAndProject\\(limit=100".r.findAllIn(p).size == 2, p.take(1500))
    assert(p.contains("TakeOrderedAndProject(limit=20"), p.take(800))
    // windows sit ABOVE the leg cuts: bounded input, no corpus-wide
    // single-partition window anywhere
    assert(p.indexOf("Window") < p.indexOf("TakeOrderedAndProject(limit=100"), p.take(1500))
  }

  test("q_interleave emits the training order via a top-k heap, not a global sort") {
    val p = plan("q_interleave")
    assert(p.contains("TakeOrderedAndProject(limit=200"), p.take(800))
    assert(!p.contains("rangepartitioning"), p.take(800)) // no materialized global sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("q_token_budget and q_quantile_norm shuffle once on source for their windows") {
    for (q <- Seq("q_token_budget", "q_quantile_norm")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q: ${p.take(600)}")
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"$q: ${p.take(1200)}")
    }
  }

  test("q_substr_dedup never goes all-pairs: window joins are equi-joins on the gram/position") {
    val p = plan("q_substr_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    // the gram-text never shuffles — only its fixed-width md5 appears
    // as a join/aggregate key (the scan projects text, everything
    // wide is keyed on g/doc_id/pos)
    assert(p.contains("md5"), p.take(800))
  }

  test("q_eval_retrieval broadcasts the probe side; ranking windows run after the cut") {
    val p = plan("q_eval_retrieval")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2, p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800)) // broadcast NL is the probe fanout
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("q_sql2 broadcasts every dimension side of the Q5 star (no SMJ on dim keys)") {
    // TPC-H Q5 shape relies on stock join selection — pin it so a
    // broadcast-threshold or stats drift can't silently demote the
    // four dimension joins (supplier/nation/region/customer) to
    // shuffles. sf0.01 (not the suite default) so the fact tables are
    // big enough that the choice is non-trivial.
    val p = graft.SparkEntry.queries("q_sql2")(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q_cluster's census is one partial aggregation over the assignment scan") {
    val p = plan("q_cluster")
    assert(!p.contains("Join"), p.take(600))
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(800))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }

  test("q_neardup_incremental classifies through hash joins only — no pairwise corpus scan") {
    // the scale contract of the incremental classify: candidates come
    // from the (band_idx, band_hash) bucket equi-join and the verify
    // joins are keyed on ids — a cartesian or nested-loop pair scan
    // here would be the O(batch × corpus) failure the operator exists
    // to avoid
    val p = plan("q_neardup_incremental")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("mrl top-k plans BOTH stages as top-k heaps, never a global sort") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").as[Seq[Float]].head()
    val p = graft.similarity.Similarity
      .mrlTopK(emb, "vec_id", "embedding", q, k = 10, prefixDim = 16, c = 50)
      .queryExecution.executedPlan.toString
    // candidate cut AND re-rank are per-partition heaps + a bounded
    // driver merge; a range-exchange global sort on either stage
    // would shuffle the corpus to rank it
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p.take(900))
    assert(!p.contains("rangepartitioning"), p.take(900))
  }
}
