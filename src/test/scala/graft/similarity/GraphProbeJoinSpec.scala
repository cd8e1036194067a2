package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The batched graph probe (VERDICT r13 next-round #2): probeJoin runs
  * searchCandidates' walk for a whole query batch in shared per-round
  * plans — the spec pins probeJoin ≡ per-query topK row for row, for
  * EVERY query in the probe slice, and batch-split invariance (the
  * property that makes the streaming face's trigger split invisible).
  */
class GraphProbeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, sf)
    .select($"vec_id", $"embedding").cache()
  private lazy val adj = GraphIndex.build(emb, "vec_id", "embedding")
    .localCheckpoint()
  private lazy val budget = math.max(200L, emb.count() / 5).toInt

  test("probeJoin == per-query topK for every query in the slice") {
    val probes = emb.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = GraphIndex.probeJoin(adj, emb, "vec_id", "embedding",
      probes, "qid", "qvec", k = 10, budget = budget)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq)
      .toMap
    val qs = probes.as[(Long, Seq[Float])].collect()
    assert(qs.nonEmpty)
    qs.foreach { case (qid, qv) =>
      val want = GraphIndex.topK(adj, emb, "vec_id", "embedding", qv,
        k = 10, budget = budget).as[(Long, Double)].collect().toSeq
      assert(got(qid) == want, s"probeJoin diverged from topK for query $qid")
    }
  }

  test("batch-split invariance: probeJoin(a ++ b) == probeJoin(a) ++ probeJoin(b)") {
    val probes = emb.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val a = probes.filter($"qid" % 40 === 0)
    val b = probes.filter($"qid" % 40 =!= 0)
    def run(q: org.apache.spark.sql.DataFrame) =
      GraphIndex.probeJoin(adj, emb, "vec_id", "embedding",
        q, "qid", "qvec", k = 10, budget = budget)
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(run(probes) == run(a) ++ run(b))
  }

  test("empty batch returns the typed empty frame") {
    val none = emb.filter(lit(false))
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = GraphIndex.probeJoin(adj, emb, "vec_id", "embedding",
      none, "qid", "qvec", k = 10, budget = budget)
    assert(out.columns.toSeq == Seq("query_id", "rk", "vec_id", "cosine"))
    assert(out.count() == 0)
  }
}
