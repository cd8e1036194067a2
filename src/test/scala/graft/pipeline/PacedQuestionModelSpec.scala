package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Virtual-clock proof that [[PacedQuestionModel]] bounds the request
  * rate: the clock only advances when the limiter sleeps (or the test
  * advances it), so every timing below is deterministic arithmetic,
  * not wall-clock luck.
  */
class PacedQuestionModelSpec extends AnyFunSuite {
  import PacedQuestionModelSpec._

  private val topic = SyllabusTopic("doc", 0L, "T", Nil)

  private def virtualPaced(rps: Double, burst: Int) = {
    val clock = new VirtualClock
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val inner = new Recorder(() => clock.nowNs)
    val paced = new PacedQuestionModel(inner, rps, burst,
      nanoTime = () => clock.nowNs,
      sleeper = ms => { slept += ms; clock.advanceMs(ms) })
    (paced, inner, slept, clock)
  }

  test("10 calls at 2 rps / burst 1: first immediate, rest paced at 500 ms") {
    val (paced, inner, slept, clock) = virtualPaced(rps = 2.0, burst = 1)
    (1 to 10).foreach(_ => paced.extractSubtopics(topic, "s", "c"))
    assert(inner.calls.size == 10)
    assert(inner.calls.head == 0L) // burst token: no initial wait
    assert(slept.size == 9 && slept.forall(_ == 500L))
    // total span = 9 paced gaps x 500 ms
    assert(clock.nowNs == 9 * 500L * 1000000L)
    // sliding-window bound: any 1 s window carries <= burst + rps calls
    for (w <- inner.calls)
      assert(inner.calls.count(t => t >= w && t < w + 1000000000L) <= 3)
  }

  test("burst capacity passes without sleeping, then pacing kicks in") {
    val (paced, inner, slept, _) = virtualPaced(rps = 1.0, burst = 3)
    (1 to 5).foreach(_ => paced.generateQuestions(Nil, None))
    assert(inner.calls.size == 5)
    assert(inner.calls.take(3).forall(_ == 0L)) // burst of 3: immediate
    assert(slept == Seq(1000L, 1000L)) // then 1 rps
  }

  test("idle time refills the bucket up to burst, never beyond") {
    val (paced, inner, slept, clock) = virtualPaced(rps = 2.0, burst = 2)
    paced.extractSubtopics(topic, "s", "c") // tokens 2 -> 1
    paced.extractSubtopics(topic, "s", "c") // tokens 1 -> 0
    assert(slept.isEmpty)
    clock.advanceMs(10000) // 10 s idle accrues 20 token-equivalents...
    paced.extractSubtopics(topic, "s", "c") // ...but cap = burst: 2 -> 1
    paced.extractSubtopics(topic, "s", "c") // 1 -> 0
    assert(slept.isEmpty, "refill must clamp at burst, not accrue 20 tokens")
    paced.extractSubtopics(topic, "s", "c") // empty again: paced wait
    assert(slept == Seq(500L))
    assert(inner.calls.size == 5)
  }

  test("rate bound holds for any interleaving of the two model methods") {
    val (paced, inner, _, clock) = virtualPaced(rps = 4.0, burst = 2)
    (1 to 12).foreach { i =>
      if (i % 2 == 0) paced.extractSubtopics(topic, "s", "c")
      else paced.generateQuestions(Nil, None)
    }
    assert(inner.calls.size == 12)
    // 12 calls, burst 2, 4 rps -> span >= (12 - 2) / 4 = 2.5 s
    assert(clock.nowNs >= 2500000000L)
    for (w <- inner.calls)
      assert(inner.calls.count(t => t >= w && t < w + 1000000000L) <= 6)
  }

  test("composes under ResilientQuestionModel: retries are paced too") {
    val clock = new VirtualClock
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky = new FlakyModel(failFirst = 2)
    val paced = new PacedQuestionModel(flaky, requestsPerSecond = 1.0,
      burst = 1, nanoTime = () => clock.nowNs,
      sleeper = ms => { slept += ms; clock.advanceMs(ms) })
    val resilient = new ResilientQuestionModel(paced, maxRetries = 2)
    resilient.extractSubtopics(topic, "s", "c")
    assert(flaky.attempts == 3)
    // each retry re-entered the limiter: two paced waits of 1000 ms
    assert(slept == Seq(1000L, 1000L))
  }

  test("deserialized copy starts with a fresh bucket (per-task pacing)") {
    // frozen clock at 0 + a sleeper that THROWS: a fresh bucket never
    // sleeps on its first call (burst token), while a broken
    // readObject sentinel (transient last=0, tokens=0 — and 0 is a
    // VALID nanoTime, so acquire would compute refill-since-0 = 0
    // tokens) enters the sleep branch and trips the sleeper. All
    // lambdas here are capture-free and serializable, mirroring a
    // task closure.
    val paced = new PacedQuestionModel(new StubQuestionModel,
      requestsPerSecond = 1.0, burst = 1,
      nanoTime = () => 0L,
      sleeper = _ => throw new IllegalStateException(
        "fresh bucket must not sleep"))
    paced.extractSubtopics(topic, "s", "c") // drain the original's token
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(paced); oos.close(); bos.toByteArray
    }
    val copy = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject()
      .asInstanceOf[PacedQuestionModel]
    // fresh full bucket: the copy's first call must NOT sleep...
    copy.extractSubtopics(topic, "s", "c")
    // ...and the state really diverged from the original's drained
    // bucket: the ORIGINAL's next call at the frozen clock must sleep
    intercept[IllegalStateException] {
      paced.extractSubtopics(topic, "s", "c")
    }
  }
}

object PacedQuestionModelSpec {
  final class VirtualClock {
    var nowNs: Long = 0L
    def advanceMs(ms: Long): Unit = nowNs += ms * 1000000L
  }

  /** Inner model recording the VIRTUAL timestamp of every call.
    * Top-level (no suite $outer) so paced wrappers stay serializable.
    */
  final class Recorder(now: () => Long) extends QuestionModel {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Long]
    override def extractSubtopics(t: SyllabusTopic, s: String,
        c: String): Seq[Subtopic] = { calls += now(); Nil }
    override def generateQuestions(b: Seq[PlannedQuestion],
        ctx: Option[Subtopic]): Seq[Question] = { calls += now(); Nil }
  }

  final class FlakyModel(failFirst: Int) extends QuestionModel {
    var attempts = 0
    override def extractSubtopics(t: SyllabusTopic, s: String,
        c: String): Seq[Subtopic] = {
      attempts += 1
      if (attempts <= failFirst) throw new RuntimeException("rate limited")
      Seq.empty
    }
    override def generateQuestions(b: Seq[PlannedQuestion],
        ctx: Option[Subtopic]): Seq[Question] = Nil
  }
}
