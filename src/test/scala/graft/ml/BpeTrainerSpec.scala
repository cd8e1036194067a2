package graft.ml

import graft.SparkTestBase

/** BPE merge learning: the planted Sennrich-style corpus must yield
  * the hand-derivable merge sequence, the marked-string re-segment
  * must equal greedy left-to-right merge application, and the whole
  * trainer must agree with an independent in-memory reference on
  * random corpora (the GraphPropertySpec pattern).
  */
class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  private def docsOf(words: Seq[(String, Int)]) =
    Seq(words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" "))
      .toDF("text")

  test("planted corpus learns the hand-computed merge sequence") {
    // low:5 lower:2 newest:6 widest:3 — the classic subword example.
    // Pair counts round 1: es=st=9 (tie -> es by (l,r) order), then
    // est, lo/ow tie -> lo, then (lo,w), then ne/ew/west tie -> ew.
    val docs = docsOf(Seq("low" -> 5, "lower" -> 2,
      "newest" -> 6, "widest" -> 3))
    val t = BpeTrainer.train(docs, "text", 5)
    assert(t.merges.map(m => (m.left, m.right, m.pairCount)) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("l", "o", 7L),
      ("lo", "w", 7L), ("e", "w", 6L)))
    val marked = t.words.select("token", "marked").as[(String, String)]
      .collect().toMap
    assert(marked("low") == "<low>")
    assert(marked("lower") == "<low><e><r>")
    assert(marked("newest") == "<n><ew><est>")
    assert(marked("widest") == "<w><i><d><est>")
    t.release()
  }

  test("merge application is greedy left-to-right (aaaa + (a,a) -> aa|aa)") {
    val t = BpeTrainer.train(docsOf(Seq("aaaa" -> 3, "aaa" -> 2)), "text", 1)
    assert(t.merges.head.left == "a" && t.merges.head.right == "a")
    // aaaa: 3 words x 3 adjacent pairs; aaa: 2 x 2 -> 13
    assert(t.merges.head.pairCount == 13L)
    val marked = t.words.select("token", "marked").as[(String, String)]
      .collect().toMap
    assert(marked("aaaa") == "<aa><aa>") // non-overlapping, not <aa><a><a>
    assert(marked("aaa") == "<aa><a>")
    t.release()
  }

  /** Independent reference: word-count map, overlapping-adjacent pair
    * counts, (count desc, l, r) argmax, greedy scan-skip re-segment.
    * Deliberately a DIFFERENT formulation (lists + scan) than the
    * engine's marked-string replace.
    */
  private def referenceBpe(words: Map[String, Int], n: Int)
      : Seq[(String, String, Long)] = {
    var segs: Map[List[String], Int] =
      words.map { case (w, c) => w.toList.map(_.toString) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- segs; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), k) => (-k, a, b) }
        out += ((l, r, c))
        def apply(s: List[String]): List[String] = s match {
          case a :: b :: rest if a == l && b == r => (a + b) :: apply(rest)
          case a :: rest => a :: apply(rest)
          case Nil => Nil
        }
        segs = segs.groupMapReduce { case (s, _) => apply(s) } { case (_, c) => c }(_ + _)
      }
    }
    out.toSeq
  }

  test("save/load round-trips the durable artifact and reproduces segmentation") {
    val docs = docsOf(Seq("low" -> 5, "lower" -> 2,
      "newest" -> 6, "widest" -> 3))
    val t = BpeTrainer.train(docs, "text", 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_artifact")
      .toString
    try {
      BpeTrainer.save(spark, t.merges, s"$dir/merges")
      val loaded = BpeTrainer.load(spark, s"$dir/merges")
      assert(loaded == t.merges) // rounds, sides, counts — in order
      // the loaded artifact rebuilds the EXACT segmentation with no
      // trainer state (train-once / ship-everywhere)
      val fromLoaded = BpeTrainer.segmentationFor(docs, "text", loaded)
        .select("token", "marked").as[(String, String)].collect().toMap
      val fromTrain = t.words.select("token", "marked")
        .as[(String, String)].collect().toMap
      assert(fromLoaded == fromTrain)
    } finally {
      t.release()
      graft.tools.Scratch.deleteRecursively(new java.io.File(dir))
    }
  }

  test("trainer agrees with the in-memory reference on random corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val vocab = Seq.fill(12 + rnd.nextInt(10))(
        (1 to (2 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(4)).toChar)
          .mkString)
      val words = vocab.groupBy(identity).map { case (w, g) =>
        w -> (g.size + rnd.nextInt(4)) }
      val expected = referenceBpe(words, 8)
      val t = BpeTrainer.train(docsOf(words.toSeq), "text", 8)
      assert(t.merges.map(m => (m.left, m.right, m.pairCount)) == expected,
        s"trial $trial over ${words.mkString(",")}")
      t.release()
    }
  }
}
