package graft.pipeline

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestBase

/** Counts model invocations per topic title and optionally throws on
  * a designated title — the "kill after topic N" fault injector for
  * the resume spec. State is JVM-static (executors share the test JVM
  * in local mode).
  */
object CountingPoisonModel {
  val extractCalls = new ConcurrentHashMap[String, AtomicInteger]()
  @volatile var poisonTitle: Option[String] = None
  def callsFor(title: String): Int =
    Option(extractCalls.get(title)).map(_.get()).getOrElse(0)
  def reset(): Unit = { extractCalls.clear(); poisonTitle = None }
}

final class CountingPoisonModel extends QuestionModel {
  private val inner = new StubQuestionModel
  override def extractSubtopics(topic: SyllabusTopic, subject: String,
      academicClass: String): Seq[Subtopic] = {
    CountingPoisonModel.extractCalls
      .computeIfAbsent(topic.title, _ => new AtomicInteger())
      .incrementAndGet()
    if (CountingPoisonModel.poisonTitle.contains(topic.title))
      throw new RuntimeException(s"injected crash at topic '${topic.title}'")
    inner.extractSubtopics(topic, subject, academicClass)
  }
  override def generateQuestions(batch: Seq[PlannedQuestion],
      context: Option[Subtopic]): Seq[Question] =
    inner.generateQuestions(batch, context)
}

/** VERDICT r3 next-round #5: per-topic completion manifest (the
  * `langgraph-checkpoint-sqlite` analogue). Kill at topic N, rerun:
  * output identical to a clean run, topics before N never
  * re-generated.
  */
class ResumeSpec extends SparkTestBase {

  private val fixture = "/root/reference/chemistry_form_1_2.docx"
  // the fixture's 6 distinct titles (13 marker occurrences), sorted =
  // the pipeline's deterministic replay order (FIXTURES.md)
  private val titles = Seq(
    "Analytical skills in chemistry", "Chemical composition of matter",
    "Chemical reactions", "Environmental chemistry",
    "Inorganic compounds", "Organic chemistry")

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("crash at topic 4 of 6, rerun: completed topics skipped, output equals a clean run") {
    CountingPoisonModel.reset()
    val pipeline = new SyllabusPipeline(new CountingPoisonModel,
      subject = "chemistry", academicClass = "Form 1-2")
    val outDir = tmp("resume_out")
    val manifest = tmp("resume_manifest") + "/manifest" // not yet existing
    val sink = new ResumableJsonOutputManager(outDir)

    // run 1: dies on the 4th title in replay order → titles 1..3
    // committed (checkpointEvery=1), 4..6 never reach the sink
    CountingPoisonModel.poisonTitle = Some(titles(3))
    intercept[Exception] {
      pipeline.runResumable(spark, fixture, sink, manifest)
    }
    val committed = spark.read.schema("topic STRING").json(manifest)
      .collect().map(_.getString(0)).sorted
    assert(committed.toSeq == titles.take(3),
      "manifest must hold exactly the pre-crash topics")
    val callsAfterCrash = titles.take(3).map(CountingPoisonModel.callsFor)
    assert(callsAfterCrash.forall(_ > 0))

    // run 2: fault cleared → resumes at title 4 and completes
    CountingPoisonModel.poisonTitle = None
    pipeline.runResumable(spark, fixture, sink, manifest)
    val committed2 = spark.read.schema("topic STRING").json(manifest)
      .collect().map(_.getString(0)).sorted
    assert(committed2.toSeq == titles, "all six topics committed after resume")

    // topics before the crash were NOT re-extracted on resume
    titles.take(3).zip(callsAfterCrash).foreach { case (t, before) =>
      assert(CountingPoisonModel.callsFor(t) == before,
        s"topic '$t' was re-extracted on resume")
    }
    // ...and the post-crash topics were processed
    titles.drop(4).foreach(t => assert(CountingPoisonModel.callsFor(t) > 0))

    // output identical to a clean (never-crashed) resumable run
    val cleanDir = tmp("resume_clean")
    new SyllabusPipeline(new StubQuestionModel, "chemistry", "Form 1-2")
      .runResumable(spark, fixture, new ResumableJsonOutputManager(cleanDir),
        tmp("resume_clean_m") + "/manifest")
    val resumed = spark.read.json(outDir)
    val clean = spark.read.json(cleanDir)
    assert(resumed.count() == clean.count() && clean.count() > 0)
    assert(resumed.exceptAll(clean).isEmpty && clean.exceptAll(resumed).isEmpty)

    // ...and row-identical to the one-pass (non-resumable) path: title
    // commit groups must be invisible in the output
    val onePass = new SyllabusPipeline(new StubQuestionModel, "chemistry", "Form 1-2")
      .run(spark, fixture, sink = None)
    assert(onePass.count() == clean.count())
    assert(resumed.select("question_id", "topic").exceptAll(
      onePass.toDF().select("question_id", "topic")).isEmpty)
  }

  test("checkpointEvery=3, crash inside group 2: whole group re-executes, dynamic overwrite converges") {
    // VERDICT r4 #5: the group path's at-least-once window. 6 titles /
    // checkpointEvery=3 → group 1 = titles 0-2, group 2 = titles 3-5.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    CountingPoisonModel.reset()
    val pipeline = new SyllabusPipeline(new CountingPoisonModel,
      subject = "chemistry", academicClass = "Form 1-2")
    val outDir = tmp("resume3_out")
    val manifest = tmp("resume3_m") + "/manifest"
    val sink = new ResumableJsonOutputManager(outDir)

    // run 1: poison on group 2's SECOND title → group 1 commits, group 2
    // dies mid-extract (nothing of it reaches sink or manifest)
    CountingPoisonModel.poisonTitle = Some(titles(4))
    intercept[Exception] {
      pipeline.runResumable(spark, fixture, sink, manifest, checkpointEvery = 3)
    }
    val committed = spark.read.schema("topic STRING").json(manifest)
      .collect().map(_.getString(0)).sorted
    assert(committed.toSeq == titles.take(3),
      "manifest must hold exactly the committed FIRST group")
    val callsG1 = titles.take(3).map(CountingPoisonModel.callsFor)
    // group 2's first title MAY have been extracted before the poison
    // hit (partition order decides) — record whatever happened; the
    // invariant under test is that rerun re-executes it either way
    val callsT3 = CountingPoisonModel.callsFor(titles(3))

    // run 2: group 1 skipped wholesale; the WHOLE of group 2 re-executes
    // (including its already-extracted first title — the documented
    // group-granularity re-execution cost)
    CountingPoisonModel.poisonTitle = None
    pipeline.runResumable(spark, fixture, sink, manifest, checkpointEvery = 3)
    titles.take(3).zip(callsG1).foreach { case (t, n) =>
      assert(CountingPoisonModel.callsFor(t) == n, s"committed topic '$t' re-extracted")
    }
    assert(CountingPoisonModel.callsFor(titles(3)) > callsT3,
      "group 2's first title must re-execute with its group")
    assert(spark.read.schema("topic STRING").json(manifest)
      .collect().map(_.getString(0)).sorted.toSeq == titles)

    // the OTHER at-least-once window: group 2's sink write is durable
    // but its manifest commit is lost (crash between the two). Simulate
    // by dropping group 2 from the manifest and rerunning: the dynamic
    // overwrite replaces group 2's title partitions in place — output
    // converges instead of duplicating
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(manifest))
    titles.take(3).toDF("topic").coalesce(1).write.mode("overwrite").json(manifest)
    pipeline.runResumable(spark, fixture, sink, manifest, checkpointEvery = 3)

    // output identical to a clean (never-crashed) checkpointEvery=3 run
    val cleanDir = tmp("resume3_clean")
    new SyllabusPipeline(new StubQuestionModel, "chemistry", "Form 1-2")
      .runResumable(spark, fixture, new ResumableJsonOutputManager(cleanDir),
        tmp("resume3_cm") + "/manifest", checkpointEvery = 3)
    val resumed = spark.read.json(outDir)
    val clean = spark.read.json(cleanDir)
    assert(resumed.count() == clean.count() && clean.count() > 0)
    assert(resumed.exceptAll(clean).isEmpty && clean.exceptAll(resumed).isEmpty)
    // group-1 partitions were never touched by the replay
    titles.take(3).zip(callsG1).foreach { case (t, n) =>
      assert(CountingPoisonModel.callsFor(t) == n)
    }
  }
}
