package graft.queries

import graft.SparkTestBase

/** Queries that write scratch layouts (q_dpp, q_partition_prune) must
  * key them per DATASET: with the pre-r9 shared lazy-val dir, running
  * the query for a second dataset overwrote the layout a first
  * dataset's lazily-evaluated DataFrame still pointed at, silently
  * changing its rows (ADVICE r8).
  */
class ScratchIsolationSpec extends SparkTestBase {

  private def interleaved(q: String): Unit = {
    val a = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
    val before = a.collect().map(_.toString).toSeq
    // second dataset writes ITS layout; the first frame must not see it
    graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").count()
    val after = a.collect().map(_.toString).toSeq
    assert(after == before,
      s"$q: first dataset's frame changed after second dataset's run")
  }

  test("q_dpp layout is keyed per dataset")(interleaved("q_dpp"))

  test("q_partition_prune layout is keyed per dataset")(
    interleaved("q_partition_prune"))
}
