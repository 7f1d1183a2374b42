package graft.rass

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import com.sun.net.httpserver.HttpServer

import graft.SparkSpec
import graft.rass.query.{HttpIntent, HttpNer, Intent, RuleIntentClassifier, RuleNer}

/** Engine-level end-to-end over ALL THREE HTTP seams at once:
  * `RassEngine` wired with HttpIntent + HttpNer + HttpGenerator against
  * one hermetic in-process server, driven through `ask()`/`askStream()`
  * — the full NER → intent → dispatch → context assembly → generation
  * path as a deployment would run it, nothing mocked at the engine
  * boundary. The per-seam hermetic specs (HttpIntentSpec, HttpNerSpec,
  * HttpModelsSpec) cover each client's parsing/retry contract; this
  * spec covers their COMPOSITION, including a mid-ask server outage
  * degrading intent+NER to the rule impls without corrupting the
  * answer, and a mid-STREAM generator fault arriving in-band.
  */
class EngineHttpE2eSpec extends SparkSpec {

  private lazy val corpus = Corpus.corpus(spark, sfDir).cache()

  /** One server, three contexts: /intent and /ner serve strict
    * closed-set completions, /gen serves a completion or an SSE stream
    * depending on the request's `"stream"` flag. `failFrontend` turns
    * /intent + /ner into 500s (the outage scenario); counters record
    * which seams actually carried traffic.
    */
  private def withEngineServer(
      f: (String, AtomicInteger, AtomicInteger, AtomicInteger, AtomicBoolean) => Unit): Unit = {
    val intentCalls = new AtomicInteger(0)
    val nerCalls = new AtomicInteger(0)
    val genCalls = new AtomicInteger(0)
    val failFrontend = new AtomicBoolean(false)
    def completion(content: String): String = {
      val m = HttpJson.mapper
      val root = m.createObjectNode()
      val msg = root.putArray("choices").addObject().putObject("message")
      msg.put("content", content)
      m.writeValueAsString(root)
    }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def ctx(path: String)(handler: String => (Int, String)): Unit =
      server.createContext(path, { ex =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val (code, resp) = handler(body)
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    // "hybrid", not "semantic": the planted CONDITION entity compiles
    // to a conditionCodeText filter, and q2Semantic scores only
    // embedding-bearing unstructured rows where that field is null —
    // the preserved knn-on-null reference quirk — so a semantic label
    // plus this entity would legitimately return zero hits. Hybrid
    // scores the whole corpus, so the filter keeps the structured rows
    // the entity names.
    ctx("/intent") { _ =>
      intentCalls.incrementAndGet()
      if (failFrontend.get()) (500, "intent model down")
      else (200, completion("hybrid"))
    }
    ctx("/ner") { _ =>
      nerCalls.incrementAndGet()
      if (failFrontend.get()) (500, "ner model down")
      else (200, completion(
        """[{"text": "diabetes", "label": "CONDITION"}]"""))
    }
    ctx("/gen") { body =>
      genCalls.incrementAndGet()
      if (body.contains("\"stream\":true")) {
        val sse = Seq(
          """data: {"choices":[{"delta":{"content":"Streamed "}}]}""",
          """data: {"choices":[{"delta":{"content":"llm "}}]}""",
          """data: {"choices":[{"delta":{"content":"answer."}}]}""",
          "").mkString("\n")
        (200, sse)
      } else (200, completion("LLM answer grounded in the context."))
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}",
      intentCalls, nerCalls, genCalls, failFrontend)
    finally server.stop(0)
  }

  private def engine(url: String, store: ChatStore = new InMemoryChatStore) =
    new RassEngine(corpus,
      intentClassifier = new HttpIntent(s"$url/intent", RuleIntentClassifier,
        maxRetries = 1),
      ner = new HttpNer(s"$url/ner", new RuleNer(), maxRetries = 1),
      generator = new HttpGenerator(s"$url/gen", "test-model", maxRetries = 1),
      chatStore = store,
      nowMicros = () => 1748736000000000L)

  test("ask() runs the full pipeline through all three HTTP seams") {
    withEngineServer { (url, intentCalls, nerCalls, genCalls, _) =>
      val store = new InMemoryChatStore
      val a = engine(url, store).ask(
        "Search for diabetes treatment options.", "u1", "e2e1")
      assert(a.intent == Intent.Hybrid,
        "the model's 'hybrid' label must drive dispatch (rules say semantic)")
      assert(a.hits.nonEmpty, "retrieval must still run under HTTP frontends")
      assert(a.answer == "LLM answer grounded in the context.",
        "the HTTP generator's completion IS the answer")
      // ner fires twice per ask by design: entity extraction plus the
      // PERSON pass inside patient resolution (reference resolves the
      // patient from its own NER call, main.py's resolve path)
      assert(intentCalls.get() == 1 && nerCalls.get() == 2 && genCalls.get() == 1,
        s"seam traffic (got intent=${intentCalls.get()} " +
          s"ner=${nerCalls.get()} gen=${genCalls.get()}, want 1/2/1)")
      assert(store.history("e2e1").map(_.role) == Seq("user", "assistant"),
        "the exchange persists like any other ask()")
    }
  }

  test("askStream() streams SSE deltas through the engine and reassembles") {
    withEngineServer { (url, _, _, genCalls, _) =>
      val store = new InMemoryChatStore
      val tokens = scala.collection.mutable.ArrayBuffer[String]()
      val a = engine(url, store).askStream(
        "Search for diabetes treatment options.", "u1", "e2e2")(tokens += _)
      assert(tokens.toSeq == Seq("Streamed ", "llm ", "answer."),
        s"SSE deltas must reach the engine's onToken in order: $tokens")
      assert(a.answer == "Streamed llm answer.")
      assert(genCalls.get() == 1)
      assert(store.history("e2e2").map(_.role) == Seq("user", "assistant"),
        "a non-empty streamed answer persists (WS path)")
    }
  }

  test("a mid-ask frontend outage degrades intent+NER to rules, answer intact") {
    withEngineServer { (url, intentCalls, nerCalls, _, failFrontend) =>
      val e = engine(url)
      // first ask healthy, then the models go down mid-session: the
      // SAME engine must keep answering, now on the rule impls
      assert(e.ask("Search for diabetes treatment options.", "u1", "e2e3")
        .intent == Intent.Hybrid, "healthy: the model's label wins")
      failFrontend.set(true)
      val before = (intentCalls.get(), nerCalls.get())
      val a = e.ask("Search for diabetes treatment options.", "u1", "e2e3")
      assert(intentCalls.get() > before._1 && nerCalls.get() > before._2,
        "the outage path must actually have been attempted over HTTP")
      assert(a.intent == Intent.Semantic,
        "outage: RuleIntentClassifier's label for this query takes over " +
          "(the observable proof the fallback engaged)")
      assert(a.hits.nonEmpty && a.answer == "LLM answer grounded in the context.",
        "retrieval and generation must be untouched by the frontend outage")
    }
  }

  test("a mid-stream generator fault arrives in-band, not as a crash") {
    // separate server whose /gen streams one delta then garbage: the
    // engine's streamed answer must carry the partial + [ERROR] suffix
    // (reference main.py:3048-3051 yields failures into the stream)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def completion(content: String): String = {
      val m = HttpJson.mapper
      val root = m.createObjectNode()
      val msg = root.putArray("choices").addObject().putObject("message")
      msg.put("content", content)
      m.writeValueAsString(root)
    }
    server.createContext("/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val resp =
        if (ex.getRequestURI.getPath.startsWith("/intent")) completion("semantic")
        else if (ex.getRequestURI.getPath.startsWith("/ner"))
          completion("""[{"text": "diabetes", "label": "CONDITION"}]""")
        else Seq(
          """data: {"choices":[{"delta":{"content":"partial "}}]}""",
          "data: {not valid json",
          "").mkString("\n")
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val tokens = scala.collection.mutable.ArrayBuffer[String]()
      val a = engine(url).askStream(
        "Search for diabetes treatment options.", "u1", "e2e4")(tokens += _)
      assert(tokens.headOption.contains("partial "),
        "tokens before the fault still stream through the engine")
      assert(tokens.exists(_.startsWith("[ERROR]")),
        "the fault must reach the engine's consumer in-band")
      assert(a.answer.startsWith("partial [ERROR]") ||
        a.answer.startsWith("partial[ERROR]"),
        s"answer must be partial + in-band error, got '${a.answer}'")
    } finally server.stop(0)
  }
}
