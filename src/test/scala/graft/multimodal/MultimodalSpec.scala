package graft.multimodal

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("media features are deterministic, typed, and byte-derived") {
    val docs = graft.Tables.documents(spark, sf)
    val feats = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      assert(Set("image", "audio", "video")(r.kind))
      assert(r.n_bytes > 0)
      assert(r.width >= 64 && r.height >= 64 && r.n_frames >= 1)
      assert(r.feature.length == 8)
    }
    // determinism: second run identical
    val again = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs))
      .collect().map(r => (r.doc_id, r.width, r.height, r.n_frames)).toSet
    assert(again == rows.map(r => (r.doc_id, r.width, r.height, r.n_frames)).toSet)
  }

  test("fake codec varies frames by kind") {
    val payload = "hello world".getBytes("UTF-8")
    val (w1, h1, f1) = Multimodal.FakeCodec.decode("image", payload)
    val (_, _, fv) = Multimodal.FakeCodec.decode("video", payload)
    assert(f1 == 1)
    assert(w1 >= 64 && h1 >= 64)
    assert(fv >= 1)
  }
}
