package graft.tools

import graft.SparkTestBase

/** Guards the committed q_multimodal golden manifest (VERDICT r14
  * next-round #7): the resource must match a fresh direct-codec
  * measurement — a JDK codec or synthesis-formula change must fail
  * HERE, loudly, instead of the engine silently following it — and
  * must cover exactly the fixture's doc ids.
  */
class MultimodalGoldenSpec extends SparkTestBase {
  import spark.implicits._

  test("committed manifest == fresh direct-codec measurement, covering the fixture ids at every sf") {
    val committed = MultimodalGolden.committed()
    val fixtureIds = graft.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    assert(fixtureIds.subsetOf(committed.map(_._1).toSet),
      "golden manifest does not cover the documents fixture")
    // and the sf0.1 ceiling (5,000 docs — TESTDATA.md) is covered too
    assert(committed.map(_._1).toSet == (0L until 5000L).toSet)
    val fresh = MultimodalGolden.measure(committed.map(_._1))
    assert(committed == fresh,
      "live codecs drifted from the committed golden manifest — " +
        "regenerate src/main/resources/graft/multimodal_golden.csv via " +
        "graft.tools.MultimodalGolden AND verify the change is deliberate")
  }

  test("every payload byte size is positive and kind-plausible (PNG > WAV header floor, AVI largest)") {
    val byKind = MultimodalGolden.committed().groupBy(_._1 % 3)
    assert(byKind.keySet == Set(0L, 1L, 2L))
    assert(MultimodalGolden.committed().forall(_._2 > 40L),
      "a payload smaller than any codec header")
  }
}
