package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Config-gated HTTP [[QuestionModel]] — the real-API implementation
  * of the model seam the reference backs with
  * `ChatOpenAI(model="gpt-4o-mini", temperature=0)`
  * (syllabus_ai_graph.py:29). Speaks the OpenAI chat-completions
  * wire shape: POST `{model, temperature, messages:[{role:"user",
  * content}]}`, read `choices[0].message.content`
  * (syllabus_ai_graph.py:75,131,260 — `llm.invoke([HumanMessage])`).
  *
  * Built JDK-only (`java.net.http.HttpClient`) + Jackson (already on
  * the Spark classpath) — no new dependencies. Endpoint and key are
  * constructor-injected; nothing reads the environment, so the class
  * is inert unless a caller explicitly wires it:
  * `new ResilientQuestionModel(new HttpQuestionModel(endpoint, key), …)`.
  *
  * Failure contract, matching the reference exactly:
  *  - transport/HTTP-status errors THROW — the retry/backoff decorator
  *    ([[ResilientQuestionModel]]) owns transient-failure policy;
  *  - a 2xx response whose content fails to parse degrades to Nil —
  *    the reference's parse-or-empty contract
  *    (syllabus_ai_graph.py:88-90,269-271), where retrying is useless
  *    because the call "succeeded".
  *
  * Serialization: the class ships to executors inside
  * `mapPartitions` closures; the HTTP client and mapper are
  * `@transient lazy` so each executor builds its own (HttpClient is
  * not serializable) and the instance stays a plain config carrier.
  */
final class HttpQuestionModel(
    endpoint: String,
    apiKey: String,
    model: String = "gpt-4o-mini",
    connectTimeoutMs: Long = 10000L,
    requestTimeoutMs: Long = 60000L) extends QuestionModel {
  require(endpoint.nonEmpty, "endpoint required (e.g. https://…/v1/chat/completions)")

  @transient private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(connectTimeoutMs))
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  /** One chat-completions round trip: returns the assistant content.
    * Non-2xx and transport failures throw (retry policy lives in the
    * decorator, not here).
    */
  private def chat(prompt: String): String = {
    val body = mapper.createObjectNode()
    body.put("model", model)
    body.put("temperature", 0.0) // syllabus_ai_graph.py:29
    val m = body.putArray("messages").addObject()
    m.put("role", "user")
    m.put("content", prompt)
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"model endpoint returned HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    mapper.readTree(resp.body())
      .path("choices").path(0).path("message").path("content").asText("")
  }

  /** Models wrap JSON in ``` fences; LangChain's parser strips them
    * before parsing (the reference relies on that) — so do we. Only a
    * closing fence at the very END of the reply is stripped: a reply
    * that opens a fence but never closes it keeps ALL its content,
    * including any interior ``` (e.g. a markdown code block inside a
    * generated solution) — a lastIndexOf cut would truncate mid-JSON.
    */
  private def stripFences(s: String): String = {
    val t = s.trim
    if (!t.startsWith("```")) t
    else {
      val body = t.stripPrefix("```json").stripPrefix("```").trim
      (if (body.endsWith("```")) body.dropRight(3) else body).trim
    }
  }

  private def strSeq(n: JsonNode): Seq[String] =
    if (n.isArray) n.elements().asScala.map(_.asText()).toSeq else Nil

  // ------------------------------------------------------------ O7
  override def extractSubtopics(topic: SyllabusTopic, subject: String,
      academicClass: String): Seq[Subtopic] = {
    // prompt mirrors syllabus_ai_graph.py:50-61: serialized topic +
    // subject + the expected-JSON format instructions
    val topicJson = {
      val t = mapper.createObjectNode()
      // full topic state, identity fields included — the reference
      // serializes its whole topic dict into the prompt (:50-61), and
      // the model may legitimately mint per-occurrence subtopic names
      // from them (the stub does)
      t.put("doc_id", topic.doc_id)
      t.put("topic_seq", topic.topic_seq)
      t.put("title", topic.title)
      val els = t.putArray("elements")
      topic.elements.foreach { e =>
        val o = els.addObject()
        o.put("element_type", e.element_type)
        e.text.foreach(o.put("text", _))
        e.table_rows.foreach { rows =>
          val ra = o.putArray("table_rows")
          rows.foreach(r => { val c = ra.addArray(); r.foreach(c.add) })
        }
      }
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(t)
    }
    val prompt =
      s"""You are an educational content analyzer. I'm going to provide you with $subject syllabus content,
         |and I need you to extract subtopics along with their learning objectives and other metadata.
         |
         |Here's the syllabus content for the topic:
         |$topicJson
         |
         |Return a JSON object: {"subtopics": [{"subtopic_name": string, "topic_title": string,
         |"academic_class": string, "subject": string, "learning_objectives": [string],
         |"key_concepts": [string], "assessment_criteria": [string], "suggested_activities": [string]}]}
         |
         |Analyze this content and identify distinct subtopics as specified in the format above.
         |Make sure to include the topic of the extracted subtopic.""".stripMargin
    val content = chat(prompt)
    try {
      mapper.readTree(stripFences(content)).path("subtopics").elements().asScala.map { s =>
        Subtopic(
          subtopic_name = s.path("subtopic_name").asText(""),
          topic_title = s.path("topic_title").asText(topic.title),
          academic_class = s.path("academic_class").asText(academicClass),
          subject = s.path("subject").asText(subject),
          learning_objectives = strSeq(s.path("learning_objectives")),
          key_concepts = strSeq(s.path("key_concepts")),
          assessment_criteria = strSeq(s.path("assessment_criteria")),
          suggested_activities = strSeq(s.path("suggested_activities")))
      }.toSeq
    } catch { case NonFatal(_) => Nil } // parse-or-empty (:88-90)
  }

  // ------------------------------------------------------------ O11
  override def generateQuestions(batch: Seq[PlannedQuestion],
      context: Option[Subtopic]): Seq[Question] = {
    if (batch.isEmpty) return Nil
    val ctx = context.getOrElse(
      Subtopic("", batch.head.topic, "", "", Nil, Nil, Nil, Nil))
    val planJson = {
      val arr = mapper.createArrayNode()
      batch.foreach { q =>
        val o = arr.addObject()
        o.put("question_id", q.question_id); o.put("topic", q.topic)
        o.put("subtopic", q.subtopic); o.put("difficulty", q.difficulty)
        o.put("concept_area", q.concept_area); o.put("status", q.status)
      }
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
    }
    // prompt mirrors syllabus_ai_graph.py:205-231 (subtopic context +
    // plan + per-question constraints + exact-count/exact-id demands)
    val prompt =
      s"""Generate multiple-choice questions based on the following planned questions:
         |
         |Subtopic: "${ctx.subtopic_name}" within the main topic "${ctx.topic_title}"
         |
         |Here's information about this subtopic:
         |Learning objectives: ${ctx.learning_objectives.mkString("; ")}
         |Key concepts: ${ctx.key_concepts.mkString("; ")}
         |Assessment criteria: ${ctx.assessment_criteria.mkString("; ")}
         |
         |Now, generate questions according to this specific plan:
         |$planJson
         |
         |Return a JSON object: {"questions": [{"question_id": string, "text": string,
         |"topic": string, "sub_topic": string, "academic_class": string,
         |"examination_level": string, "difficulty": string, "tags": [string],
         |"choices": [{"text": string, "is_correct": bool}],
         |"solution": {"explanation": string, "steps": [string]}, "hint": string}]}
         |
         |For each question:
         |1. Include four answer choices (one correct, three incorrect)
         |2. Provide a detailed explanation for the correct answer
         |3. Include a helpful hint
         |4. Match the difficulty level exactly as specified in the plan
         |5. Address the specific concept area indicated in the plan
         |
         |Use the exact same question_id as provided in the plan.
         |Generate exactly ${batch.size} questions matching the specifications in the plan.""".stripMargin
    val content = chat(prompt)
    try {
      mapper.readTree(stripFences(content)).path("questions").elements().asScala.map { q =>
        Question(
          question_id = q.path("question_id").asText(""),
          text = q.path("text").asText(""),
          topic = q.path("topic").asText(batch.head.topic),
          sub_topic = q.path("sub_topic").asText(batch.head.subtopic),
          academic_class = q.path("academic_class").asText(ctx.academic_class),
          examination_level = q.path("examination_level").asText(""),
          difficulty = q.path("difficulty").asText(""),
          tags = strSeq(q.path("tags")),
          choices = q.path("choices").elements().asScala.map(c =>
            QuestionChoice(c.path("text").asText(""),
              c.path("is_correct").asBoolean(false))).toSeq,
          solution = QuestionSolution(
            q.path("solution").path("explanation").asText(""),
            strSeq(q.path("solution").path("steps"))),
          hint = q.path("hint").asText(""),
          metadata = None)
      }.toSeq
    } catch { case NonFatal(_) => Nil } // parse-or-empty (:269-271)
  }
}
