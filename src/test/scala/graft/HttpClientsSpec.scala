package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.operators.{Enrich, External, HttpClients}
import graft.operators.HttpClients.{HttpConfig, HttpLlmClient, HttpMetricsClient}

/** Integration spec for the production X1/X2 HTTP clients against an
  * in-process JDK HttpServer: request shape, auth, retry-on-5xx, fail-open
  * policy, and the end-to-end mapPartitions lifecycle through the same
  * Enrich operators the oracle queries use with stubs. */
class HttpClientsSpec extends SparkTestBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val metricsCalls = new AtomicInteger(0)
  private val llmCalls = new AtomicInteger(0)
  private val flakyCalls = new AtomicInteger(0)
  private val authCalls = new AtomicInteger(0)
  @volatile private var lastLlmAuth: String = _
  @volatile private var lastLlmBody: String = _

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/metrics", (ex: HttpExchange) => {
      metricsCalls.incrementAndGet()
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val pub = q.split("&").collectFirst {
        case p if p.startsWith("publication=") =>
          java.net.URLDecoder.decode(p.drop("publication=".length), "UTF-8")
      }.getOrElse("")
      respond(ex, 200,
        s"""{"impact_factor": ${pub.length}.5, "quartile": "Q${pub.length % 4 + 1}"}""")
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      // first two requests fail; the third succeeds — exercises the
      // reference's 2^attempt backoff loop end to end over real HTTP
      if (flakyCalls.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, """{"impact_factor": 9.9, "quartile": "Q1"}""")
    })
    server.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      llmCalls.incrementAndGet()
      lastLlmAuth = ex.getRequestHeaders.getFirst("Authorization")
      lastLlmBody = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      // echo a fenced-JSON answer derived from the user content so the
      // repair ladder downstream is exercised like the stub does
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(lastLlmBody)
      val msgs = node.path("messages")
      val user = msgs.path(msgs.size() - 1).path("content").asText("")
      val toks = user.trim.split("\\s+").filter(_.nonEmpty)
      val content = "```json\\n{\\\"summary\\\": \\\"" +
        toks.take(3).mkString(" ") +
        "\\\", \\\"n_words\\\": \\\"" + toks.length + "\\\"}\\n```"
      // OpenAI-style usage actuals so reserve-then-reconcile metering
      // is exercised against a realistic response shape
      respond(ex, 200,
        s"""{"choices": [{"message": {"role": "assistant", "content": "$content"}}],
           | "usage": {"prompt_tokens": ${toks.length},
           |           "completion_tokens": 7,
           |           "total_tokens": ${toks.length + 7}}}""".stripMargin)
    })
    // a provider that reports no usage — the client must keep the
    // conservative worst-case reserve for these
    server.createContext("/nousage/chat", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      respond(ex, 200,
        """{"choices": [{"message": {"role": "assistant", "content": "ok"}}]}""")
    })
    server.createContext("/dead", (ex: HttpExchange) =>
      respond(ex, 500, "nope"))
    server.createContext("/unauthorized", (ex: HttpExchange) => {
      authCalls.incrementAndGet()
      respond(ex, 401, "bad key")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private def fastCfg(path: String) = HttpConfig(
    baseUrl = s"$base$path", apiKey = Some("sekret"),
    timeoutMillis = 5000, maxRetries = 3, retryBaseMillis = 1)

  test("metrics client GETs and parses the generic metrics shape") {
    val c = new HttpMetricsClient(fastCfg("/metrics"))
    val (ifact, quart) = c.fetch("nature medicine")
    assert(ifact === "nature medicine".length + 0.5)
    assert(quart === s"Q${"nature medicine".length % 4 + 1}")
  }

  test("5xx responses are retried with backoff until success") {
    flakyCalls.set(0)
    val c = new HttpMetricsClient(fastCfg("/flaky"))
    val (ifact, _) = c.fetch("x")
    assert(ifact === 9.9)
    assert(flakyCalls.get() === 3)
  }

  test("non-transient 4xx fails fast without burning the retry budget") {
    authCalls.set(0)
    val e = intercept[HttpClients.HttpStatusException] {
      new HttpMetricsClient(fastCfg("/unauthorized")).fetch("x")
    }
    assert(e.code === 401)
    assert(authCalls.get() === 1) // maxRetries=3 but 401 never retried
  }

  test("metrics client fails closed after the retry budget") {
    val cfg = fastCfg("/dead").copy(maxRetries = 1)
    val e = intercept[HttpClients.HttpStatusException] {
      new HttpMetricsClient(cfg).fetch("x")
    }
    assert(e.code === 500)
  }

  test("llm client POSTs chat-completions shape with bearer auth and " +
    "extracts choices[0].message.content") {
    val c = new HttpLlmClient(fastCfg("/v1/chat/completions"),
      model = "test-model", systemPrompt = Some("extract fields"))
    val out = c.complete("alpha beta gamma delta")
    assert(out.startsWith("```json"))
    assert(out.contains("alpha beta gamma"))
    assert(lastLlmAuth === "Bearer sekret")
    val sent = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(lastLlmBody)
    assert(sent.path("model").asText() === "test-model")
    assert(sent.path("messages").path(0).path("role").asText() === "system")
    assert(sent.path("messages").path(1).path("content").asText() ===
      "alpha beta gamma delta")
    assert(sent.path("max_tokens").asInt() === 4096)
  }

  test("llm client fails open to \"\" after the retry budget " +
    "(reference llm_api error policy)") {
    val c = new HttpLlmClient(fastCfg("/dead").copy(maxRetries = 1), "m")
    assert(c.complete("text") === "")
    val strict = new HttpLlmClient(fastCfg("/dead").copy(maxRetries = 0),
      model = "m", failOpen = false)
    intercept[HttpClients.HttpStatusException] { strict.complete("text") }
  }

  test("llm client enforces the declared rpm budget against the real " +
    "server: a burst of rpm requests flows, the next one is paced a " +
    "full refill interval") {
    val clock = new graft.operators.External.FakeClock()
    llmCalls.set(0)
    val c = new HttpLlmClient(
      fastCfg("/v1/chat/completions").copy(rpm = 2),
      model = "m", maxTokens = 50, clock = clock)
    c.complete("one"); c.complete("two")
    assert(clock.sleeps.isEmpty) // the minute's burst
    c.complete("three") // 1 request-unit at 2/60 per sec = 30s pacing
    assert(clock.sleeps.sum >= 30000 && clock.sleeps.sum <= 30100)
    assert(llmCalls.get() === 3) // paced, never rejected
  }

  test("llm client enforces the declared tpm budget: the charge is " +
    "prompt-estimate + completion cap, and with NO usage in the " +
    "response the conservative reserve stands — saturation waits in " +
    "proportion to it") {
    val clock = new graft.operators.External.FakeClock()
    val prompt = "x" * 40 // 40 chars → 10 estimated prompt tokens
    val c = new HttpLlmClient(
      fastCfg("/nousage/chat").copy(tpm = 220),
      model = "m", maxTokens = 100, clock = clock)
    assert(c.tokenCharge(prompt) === 110L)
    c.complete(prompt); c.complete(prompt) // 220-token burst covers both
    assert(clock.sleeps.isEmpty)
    c.complete(prompt) // needs 110 at 220/60 per sec = 30s
    assert(clock.sleeps.sum >= 30000 && clock.sleeps.sum <= 30100)
  }

  test("tpm reconciliation against response usage: sustained " +
    "throughput tracks tpm/actual-tokens, not tpm/(estimate+cap)") {
    val clock = new graft.operators.External.FakeClock()
    val prompt = "x" * 40 // 1 whitespace token → server usage total = 8
    val c = new HttpLlmClient(
      fastCfg("/v1/chat/completions").copy(tpm = 220),
      model = "m", maxTokens = 100, clock = clock)
    // charge-only metering admits exactly 2 calls per burst (110 each,
    // the un-reconciled spec above); with the 8-token actuals refunded
    // after each call, 10 calls draw ~80 tokens total — no pacing sleep
    (1 to 10).foreach(_ => c.complete(prompt))
    assert(clock.sleeps.isEmpty,
      s"reconciled budget paced anyway: ${clock.sleeps}")
  }

  test("a token charge above the tpm burst fails the job loudly: " +
    "non-retryable (no backoff burn) and NOT swallowed by fail-open") {
    val clock = new graft.operators.External.FakeClock()
    llmCalls.set(0)
    val c = new HttpLlmClient(
      fastCfg("/v1/chat/completions").copy(tpm = 220),
      model = "m", maxTokens = 100, clock = clock) // failOpen default
    val e = intercept[IllegalArgumentException] {
      c.complete("y" * 500) // charge 125 + 100 = 225 > burst 220
    }
    assert(e.getMessage.contains("exceeds burst"))
    assert(clock.sleeps.isEmpty, // fail-fast: no exponential backoff
      s"burned backoff on a deterministic failure: ${clock.sleeps}")
    assert(llmCalls.get() === 0) // never reached the server
  }

  test("a completion cap above the tpm budget is rejected at " +
    "construction, before any job runs") {
    val e = intercept[IllegalArgumentException] {
      new HttpLlmClient(fastCfg("/v1/chat/completions").copy(tpm = 50),
        model = "m", maxTokens = 100)
    }
    assert(e.getMessage.contains("exceeds the tpm budget"))
  }

  test("end-to-end X1 enrichment through mapPartitions with the real " +
    "HTTP client") {
    import spark.implicits._
    val df = Seq("Nature", "Cell", "Nature", null)
      .toDF("journal")
    val out = Enrich.journalMetrics(df, "journal",
        new HttpMetricsClient(fastCfg("/metrics")))
      .select("journal", "impact_factor", "quartile").collect()
    val nature = out.find(_.getString(0) == "Nature").get
    assert(nature.getDouble(1) === "nature".length + 0.5)
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1)) // left join keeps unenrichable rows
  }

  test("end-to-end X2 extraction through mapPartitions with the real " +
    "HTTP client + JSON repair") {
    import spark.implicits._
    llmCalls.set(0)
    val df = Seq((1L, "one two three four five"), (2L, ""), (3L, null))
      .toDF("id", "text")
    // no orderBy here: a global sort's RangePartitioner SAMPLES the child
    // plan first, re-running the mapPartitions stage — and so re-issuing
    // every HTTP call (worth knowing for real pipelines: sort AFTER
    // persisting an external-call stage, not directly on top of it)
    val out = Enrich.llmExtract(df, "text", Seq("summary", "n_words"),
        new HttpLlmClient(fastCfg("/v1/chat/completions"), "m"),
        defaults = Map("summary" -> "", "n_words" -> "0"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getString(2) === "one two three")
    assert(out(0).getString(3) === "5")
    // null/empty inputs short-circuit to defaults without an HTTP call
    assert(out(1).getString(2) === "" && out(1).getString(3) === "0")
    assert(out(2).getString(3) === "0")
    assert(llmCalls.get() === 1)
  }
}
