package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Exercises [[HttpQuestionModel]] end-to-end against an IN-PROCESS
  * loopback HTTP stub (JDK `com.sun.net.httpserver`) — zero network
  * egress, but the full request/response wire shape of the
  * reference's `ChatOpenAI` calls (syllabus_ai_graph.py:29,75,260) is
  * proven: auth header, chat-completions body, content extraction,
  * fence stripping, parse-or-empty degradation, and the
  * retry-decorator composition on transport failures.
  */
class HttpQuestionModelSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Boots a one-endpoint stub on an ephemeral loopback port, runs
    * `body` with the endpoint URL, records every request body.
    */
  private def withStub(reply: (Int, String)*)(
      body: (String, () => Seq[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val calls = new AtomicInteger(0)
    val replies = reply.toIndexedSeq
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      val req = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      seen.add(ex.getRequestHeaders.getFirst("Authorization") + "\n" +
        ex.getRequestMethod + "\n" + req)
      val (status, payload) = replies(math.min(calls.getAndIncrement(), replies.size - 1))
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(
      s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions",
      () => { import scala.jdk.CollectionConverters._; seen.asScala.toSeq })
    finally server.stop(0)
  }

  /** Wraps assistant-content JSON in the chat-completions envelope. */
  private def completion(content: String): String = {
    val root = mapper.createObjectNode()
    val msg = root.putArray("choices").addObject().putObject("message")
    msg.put("role", "assistant")
    msg.put("content", content)
    mapper.writeValueAsString(root)
  }

  private val topic = SyllabusTopic("doc1", 1, "Acids and Bases", Seq(
    SyllabusElement(0, "paragraph", Some("Intro to acids."), None),
    SyllabusElement(1, "table", None, Some(Seq(Seq("obj1", "obj2"))))))

  private val subtopicsJson =
    """{"subtopics": [{"subtopic_name": "pH scale", "topic_title": "Acids and Bases",
      |"academic_class": "Form 1", "subject": "Chemistry",
      |"learning_objectives": ["define pH"], "key_concepts": ["pH", "indicator"],
      |"assessment_criteria": ["can compute pH"], "suggested_activities": ["lab"]}]}""".stripMargin

  test("extractSubtopics: full wire round trip — auth, chat body, typed result") {
    withStub((200, completion(subtopicsJson))) { (url, seen) =>
      val m = new HttpQuestionModel(url, apiKey = "sk-test-key")
      val subs = m.extractSubtopics(topic, "Chemistry", "Form 1")
      assert(subs == Seq(Subtopic("pH scale", "Acids and Bases", "Form 1",
        "Chemistry", Seq("define pH"), Seq("pH", "indicator"),
        Seq("can compute pH"), Seq("lab"))))
      val Seq(req) = seen()
      assert(req.startsWith("Bearer sk-test-key\nPOST\n"))
      val body = mapper.readTree(req.linesIterator.drop(2).mkString("\n"))
      // the reference pins model + temperature=0 (syllabus_ai_graph.py:29)
      assert(body.path("model").asText() == "gpt-4o-mini")
      assert(body.path("temperature").asDouble() == 0.0)
      assert(body.path("messages").path(0).path("role").asText() == "user")
      val prompt = body.path("messages").path(0).path("content").asText()
      assert(prompt.contains("Acids and Bases") && prompt.contains("Chemistry"))
      assert(prompt.contains("table_rows")) // topic JSON serialized into the prompt
    }
  }

  test("markdown-fenced content parses (LangChain strips fences; so must we)") {
    withStub((200, completion("```json\n" + subtopicsJson + "\n```"))) { (url, _) =>
      val subs = new HttpQuestionModel(url, "k")
        .extractSubtopics(topic, "Chemistry", "Form 1")
      assert(subs.map(_.subtopic_name) == Seq("pH scale"))
    }
  }

  test("unterminated fence: opening ``` with no close keeps the content") {
    // VERDICT r4 nit: the old reverse-drop strip emptied a reply that
    // opens a fence but never closes it; salvageable JSON must survive
    withStub((200, completion("```json\n" + subtopicsJson))) { (url, _) =>
      val subs = new HttpQuestionModel(url, "k")
        .extractSubtopics(topic, "Chemistry", "Form 1")
      assert(subs.map(_.subtopic_name) == Seq("pH scale"))
    }
  }

  test("unterminated fence with an INTERIOR ``` keeps content past it") {
    // only an END-of-reply fence closes; a ``` inside the JSON (e.g. a
    // markdown block in a field) must not truncate the reply mid-JSON
    val withInterior = subtopicsJson.replace(
      "\"suggested_activities\": [\"lab\"]",
      "\"suggested_activities\": [\"lab ``` titration demo\"]")
    withStub((200, completion("```json\n" + withInterior))) { (url, _) =>
      val subs = new HttpQuestionModel(url, "k")
        .extractSubtopics(topic, "Chemistry", "Form 1")
      assert(subs.map(_.suggested_activities) == Seq(Seq("lab ``` titration demo")))
    }
  }

  test("parse-or-empty: 2xx with unparseable content degrades to Nil, no throw") {
    withStub((200, completion("Sorry, I cannot help with that."))) { (url, _) =>
      assert(new HttpQuestionModel(url, "k")
        .extractSubtopics(topic, "Chemistry", "Form 1").isEmpty)
    }
  }

  test("transport errors throw; ResilientQuestionModel retries to success") {
    // two 500s then 200: the raw client must THROW on a 500 (retry
    // policy belongs to the decorator); the decorated client then
    // eats one 500 itself and recovers on its retry
    withStub((500, """{"error":"rate limit"}"""),
        (500, """{"error":"rate limit"}"""), (200, completion(subtopicsJson))) {
      (url, seen) =>
        val raw = new HttpQuestionModel(url, "k")
        intercept[java.io.IOException] {
          raw.extractSubtopics(topic, "Chemistry", "Form 1")
        }
        val resilient = new ResilientQuestionModel(raw, maxRetries = 2)
        assert(resilient.extractSubtopics(topic, "Chemistry", "Form 1")
          .map(_.subtopic_name) == Seq("pH scale"))
        assert(seen().size == 3) // raw: 500; decorated: 500 then 200
    }
  }

  test("generateQuestions: plan + context in prompt, typed questions out, ids preserved") {
    val questionsJson =
      """{"questions": [{"question_id": "q-7", "text": "Which is an acid?",
        |"topic": "Acids and Bases", "sub_topic": "pH scale",
        |"academic_class": "Form 1", "examination_level": "MSCE",
        |"difficulty": "easy", "tags": ["acids"],
        |"choices": [{"text": "HCl", "is_correct": true},
        |            {"text": "NaOH", "is_correct": false},
        |            {"text": "H2O", "is_correct": false},
        |            {"text": "NaCl", "is_correct": false}],
        |"solution": {"explanation": "HCl donates protons.", "steps": ["recall definition"]},
        |"hint": "Think proton donors."}]}""".stripMargin
    withStub((200, completion(questionsJson))) { (url, seen) =>
      val plan = Seq(PlannedQuestion("q-7", "Acids and Bases", "pH scale",
        "easy", "acid definitions", "generating"))
      val ctx = Some(Subtopic("pH scale", "Acids and Bases", "Form 1", "Chemistry",
        Seq("define pH"), Seq("pH"), Seq("criteria"), Nil))
      val out = new HttpQuestionModel(url, "k").generateQuestions(plan, ctx)
      assert(out.size == 1)
      assert(out.head.question_id == "q-7" && out.head.difficulty == "easy")
      assert(out.head.choices.count(_.is_correct) == 1)
      val prompt = mapper.readTree(seen().head.linesIterator.drop(2).mkString("\n"))
        .path("messages").path(0).path("content").asText()
      // reference prompt invariants (syllabus_ai_graph.py:205-231)
      assert(prompt.contains("\"pH scale\"") && prompt.contains("q-7"))
      assert(prompt.contains("Generate exactly 1 questions"))
      assert(prompt.contains("exact same question_id"))
    }
  }
}
