package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase}

/** Semantic invariants for the round-6 retrieval / curation queries —
  * value-level parity is the DuckDB oracle's job; these pin the
  * properties the oracle can't express (internal consistency,
  * maximality, monotonicity).
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("q_hybrid_search: rrf is internally consistent with the emitted ranks") {
    val rows = SparkEntry.queries("q_hybrid_search")(spark, sf)
      .select("id", "rrf", "r_lex", "r_sem")
      .collect()
    assert(rows.length > 0 && rows.length <= 20)
    rows.foreach { r =>
      val rl = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val rs = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(rl.isDefined || rs.isDefined, s"row with no rank: $r")
      val expected = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rs.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(1) - expected) < 1e-6 + 1e-12,
        s"rrf ${r.getDouble(1)} != recomputed $expected for $r")
    }
    // fused list is rrf-descending and both legs contribute ranks
    val rrfs = rows.map(_.getDouble(1)).toSeq
    assert(rrfs == rrfs.sorted.reverse, "output not rrf-descending")
    assert(rows.exists(!_.isNullAt(2)) && rows.exists(!_.isNullAt(3)),
      "one retrieval leg contributed nothing — fusion is degenerate")
  }

  test("q_quality_model: keep flag is exactly the integer-sum sign; scores in (0,1) and monotone in the logit") {
    val rows = SparkEntry.queries("q_quality_model")(spark, sf)
      .select("doc_id", "score", "keep", "w_sum", "n_tokens")
      .as[(Long, Double, Boolean, Long, Long)].collect()
    assert(rows.length > 0)
    rows.foreach { case (id, score, keep, wSum, n) =>
      assert(keep == (wSum > 0), s"doc $id keep=$keep but w_sum=$wSum")
      assert(score > 0.0 && score < 1.0, s"doc $id score $score out of (0,1)")
      assert(n > 0)
    }
    // monotone: sort by logit (w_sum/n); scores must be non-decreasing
    val byLogit = rows.sortBy { case (_, _, _, w, n) => w.toDouble / n }
    val scores = byLogit.map(_._2).toSeq
    assert(scores == scores.sorted, "sigmoid not monotone in the logit")
  }

  test("q_interleave: every emitted round is source-balanced (one doc per source per full round)") {
    val rows = SparkEntry.queries("q_interleave")(spark, sf)
      .select("round", "source", "doc_id")
      .as[(Long, String, Long)].collect()
    assert(rows.length > 0)
    val nSources = graft.Tables.documents(spark, sf)
      .select("source").distinct().count()
    val byRound = rows.groupBy(_._1)
    // complete rounds (all but possibly the cut-off last one) contain
    // each source exactly once — any prefix of the order is balanced
    val full = byRound.filter(_._2.length == nSources)
    assert(full.nonEmpty, "no complete round in the first 200 rows")
    full.foreach { case (r, docs) =>
      assert(docs.map(_._2).distinct.length == nSources,
        s"round $r repeats a source")
    }
    // rounds are a prefix 0..k with only the last possibly partial
    val sizes = byRound.toSeq.sortBy(_._1).map(_._2.length)
    assert(sizes.init.forall(_ == nSources.toInt),
      s"non-final round incomplete: $sizes")
  }

  test("q_quantile_norm: percentiles are per-source calibrated to [0,1] and monotone in the raw score") {
    val rows = SparkEntry.queries("q_quantile_norm")(spark, sf)
      .select("source", "doc_id", "n_chars", "pctl")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length > 0)
    rows.groupBy(_._1).foreach { case (src, docs) =>
      assert(docs.forall(d => d._4 >= 0.0 && d._4 <= 1.0), s"$src pctl out of range")
      assert(docs.minBy(_._3)._4 == 0.0, s"$src min raw score not at pctl 0")
      // percent_rank assigns a tie GROUP its first rank, so the top
      // value reaches exactly 1.0 only when it is unique
      val maxRaw = docs.map(_._3).max
      if (docs.length > 1 && docs.count(_._3 == maxRaw) == 1)
        assert(docs.maxBy(_._3)._4 == 1.0, s"$src unique max raw not at pctl 1")
      // monotone: sorting by raw score sorts pctl
      val byRaw = docs.sortBy(_._3).map(_._4).toSeq
      assert(byRaw == byRaw.sorted, s"$src pctl not monotone in n_chars")
    }
  }

  test("q_token_budget: kept docs are a maximal in-order prefix per source") {
    val kept = SparkEntry.queries("q_token_budget")(spark, sf)
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1)
    assert(kept.nonEmpty)
    // recompute the full per-source quality order independently
    val all = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (src, docs) =>
        src -> docs.sortBy { case (_, id, nc, _) => (-nc, id) }
      }
    all.foreach { case (src, ordered) =>
      val keptIds = kept.get(src).map(_.map(_._2).toSet).getOrElse(Set.empty)
      // prefix: kept set == the first keptIds.size docs in quality order
      val prefix = ordered.take(keptIds.size).map(_._2).toSet
      assert(prefix == keptIds, s"$src kept set is not the quality-order prefix")
      // budget respected, and maximal: the next doc would exceed it
      val cum = ordered.map(_._4).scanLeft(0L)(_ + _).drop(1)
      assert(cum.take(keptIds.size).forall(_ <= 500), s"$src budget exceeded")
      if (keptIds.size < ordered.length)
        assert(cum(keptIds.size) > 500,
          s"$src stopped early: next doc still fits the budget")
    }
  }
}
