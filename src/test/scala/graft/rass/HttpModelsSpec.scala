package graft.rass

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** HTTP model impls against an in-process JDK HttpServer — hermetic:
  * nothing leaves localhost, no external service is assumed.
  */
class HttpModelsSpec extends AnyFunSuite {

  private def withServer(handler: (String, HttpExchange) => (Int, String))
      (f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val (code, resp) = handler(body, ex)
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("HttpEmbedder posts per text, parses dims, zero-vectors blanks without a call") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    withServer({ (body, _) =>
      seen.synchronized { seen += body }
      val m = HttpJson.mapper
      val prompt = m.readTree(body).get("prompt").asText()
      // embedding encodes the prompt length so parsing is observable
      val emb = (0 until 4).map(i => s"${prompt.length}.$i").mkString(",")
      (200, s"""{"embedding":[$emb]}""")
    }) { url =>
      val e = new HttpEmbedder(s"$url/api/embeddings", "m", dim = 4)
      val out = e.embedBatch(Seq("hello", "   ", "hi"))
      assert(out.size == 3)
      assert(out(0)(0) == 5.0f && out(2)(0) == 2.0f)
      assert(out(1).forall(_ == 0.0f), "blank text must zero-vector")
      assert(seen.size == 2, "blank text must not reach the network")
      assert(seen.forall(_.contains("\"model\":\"m\"")))
    }
  }

  test("HttpEmbedder retries 5xx then succeeds; rejects a wrong dim") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer({ (_, _) =>
      if (calls.incrementAndGet() == 1) (500, "transient")
      else (200, """{"embedding":[1.0,2.0]}""")
    }) { url =>
      val e = new HttpEmbedder(url, "m", dim = 2)
      assert(e.embedBatch(Seq("x")).head.toSeq == Seq(1.0f, 2.0f))
      assert(calls.get() == 2, "one retry expected")
      val bad = new HttpEmbedder(url, "m", dim = 7)
      assertThrows[IllegalArgumentException](bad.embedBatch(Seq("y")))
    }
  }

  test("HttpEmbedder does not retry a 4xx rejection") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer({ (_, _) => calls.incrementAndGet(); (400, "bad request") }) { url =>
      val e = new HttpEmbedder(url, "m", dim = 2)
      assertThrows[IllegalArgumentException](e.embedBatch(Seq("x")))
      assert(calls.get() == 1, "4xx must not be retried")
    }
  }

  test("HttpEmbedder retries 429 rate limits (honoring Retry-After) instead of failing") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer({ (_, ex) =>
      if (calls.incrementAndGet() == 1) {
        ex.getResponseHeaders.set("Retry-After", "0")
        (429, "slow down")
      } else (200, """{"embedding":[4.0,5.0]}""")
    }) { url =>
      val e = new HttpEmbedder(url, "m", dim = 2)
      assert(e.embedBatch(Seq("x")).head.toSeq == Seq(4.0f, 5.0f))
      assert(calls.get() == 2, "429 must be retried like a transient failure")
    }
  }

  test("429 on the final attempt fails fast — Retry-After is not slept on") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer({ (_, ex) =>
      calls.incrementAndGet()
      ex.getResponseHeaders.set("Retry-After", "30")
      (429, "slow down")
    }) { url =>
      val t0 = System.nanoTime()
      val e = intercept[RuntimeException] {
        HttpJson.post(java.net.http.HttpClient.newHttpClient(), url, "{}",
          maxRetries = 0)
      }
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(calls.get() == 1)
      assert(e.getMessage.contains("failed after 1 attempts"))
      assert(elapsedMs < 5000,
        s"final-attempt 429 slept ${elapsedMs}ms on a Retry-After it cannot use")
    }
  }

  test("408 honors Retry-After like 429, then retries") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer({ (_, ex) =>
      if (calls.incrementAndGet() == 1) {
        ex.getResponseHeaders.set("Retry-After", "1")
        (408, "request timeout")
      } else (200, """{"embedding":[7.0,8.0]}""")
    }) { url =>
      val t0 = System.nanoTime()
      val e = new HttpEmbedder(url, "m", dim = 2)
      assert(e.embedBatch(Seq("x")).head.toSeq == Seq(7.0f, 8.0f))
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(calls.get() == 2, "408 must be retried like a transient failure")
      assert(elapsedMs >= 900,
        s"Retry-After: 1 on a 408 must be honored, call returned in ${elapsedMs}ms")
    }
  }

  test("interrupt during the retry loop aborts and restores the flag") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer({ (_, _) => calls.incrementAndGet(); (500, "always down") }) { url =>
      @volatile var thrown: Throwable = null
      @volatile var flagRestored = false
      val worker = new Thread(() => {
        try HttpJson.post(java.net.http.HttpClient.newHttpClient(), url, "{}",
          maxRetries = 8) // backoff up to 200ms<<7 — plenty to interrupt into
        catch { case t: Throwable =>
          thrown = t
          flagRestored = Thread.currentThread().isInterrupted
        }
      })
      worker.start()
      Thread.sleep(150) // let it reach a backoff sleep
      worker.interrupt()
      worker.join(10000)
      assert(!worker.isAlive, "worker must abort the retry loop promptly")
      assert(thrown.isInstanceOf[RuntimeException] &&
        thrown.getCause.isInstanceOf[InterruptedException],
        s"expected wrapped InterruptedException, got $thrown")
      assert(flagRestored, "interrupt flag must be restored, not swallowed")
      assert(calls.get() < 9, "the remaining retry budget must not be burned")
    }
  }

  test("HttpGenerator sends system+user messages and extracts the completion") {
    var captured: String = null
    withServer({ (body, _) =>
      captured = body
      (200, """{"choices":[{"message":{"role":"assistant","content":"the answer"}}]}""")
    }) { url =>
      val g = new HttpGenerator(url, "gpt-x")
      val out = g.generate("cite your sources", "Document ID: d1", "what is it?")
      assert(out == "the answer")
      val m = HttpJson.mapper.readTree(captured)
      assert(m.get("model").asText() == "gpt-x")
      val msgs = m.get("messages")
      assert(msgs.get(0).get("role").asText() == "system")
      assert(msgs.get(0).get("content").asText() == "cite your sources")
      assert(msgs.get(1).get("content").asText().contains("Document ID: d1"))
      assert(msgs.get(1).get("content").asText().contains("what is it?"))
    }
  }

  test("HttpGenerator streams SSE deltas in order and returns the joined answer") {
    var captured: String = null
    val sse = Seq(
      """data: {"choices":[{"delta":{"role":"assistant"}}]}""", // no content yet
      "", // SSE event separator
      """data: {"choices":[{"delta":{"content":"Hello"}}]}""",
      "",
      """data: {"choices":[{"delta":{"content":" world "}}]}""",
      "",
      "data: [DONE]",
      "").mkString("\n")
    withServer({ (body, ex) =>
      captured = body
      ex.getResponseHeaders.set("Content-Type", "text/event-stream")
      (200, sse)
    }) { url =>
      val g = new HttpGenerator(url, "gpt-x")
      val tokens = scala.collection.mutable.ArrayBuffer[String]()
      val out = g.generateStream("sys", "ctx", "q")(tokens += _)
      assert(tokens.toSeq == Seq("Hello", " world "), "deltas in arrival order")
      assert(out == "Hello world", "joined and stripped like the reference")
      val m = HttpJson.mapper.readTree(captured)
      assert(m.get("stream").asBoolean(), "request must opt into streaming")
    }
  }

  test("a mid-stream failure is yielded as an [ERROR] chunk, not thrown") {
    val sse = Seq(
      """data: {"choices":[{"delta":{"content":"partial"}}]}""",
      "data: {not valid json", // transport corruption mid-stream
      "").mkString("\n")
    withServer({ (_, _) => (200, sse) }) { url =>
      val g = new HttpGenerator(url, "gpt-x")
      val tokens = scala.collection.mutable.ArrayBuffer[String]()
      val out = g.generateStream("sys", "ctx", "q")(tokens += _)
      assert(tokens.head == "partial", "tokens before the fault still stream")
      assert(tokens.last.startsWith("[ERROR]"),
        "failure must reach the consumer in-band (main.py:3048-3051)")
      assert(out.startsWith("partial[ERROR]"))
    }
  }

  test("an onToken that throws on the terminal [ERROR] delivery does not escape") {
    // a callback that died once (Failed stream) may well throw again
    // when the terminal error chunk is pushed through it — the
    // Generator contract returns in-band errors, so the second throw
    // must be swallowed, not escape generateStream
    val sse = Seq(
      """data: {"choices":[{"delta":{"content":"partial"}}]}""",
      "data: {not valid json",
      "").mkString("\n")
    withServer({ (_, _) => (200, sse) }) { url =>
      val g = new HttpGenerator(url, "gpt-x")
      val out = g.generateStream("sys", "ctx", "q") { tok =>
        if (tok.startsWith("[ERROR]"))
          throw new IllegalStateException("consumer sink closed")
      }
      assert(out.startsWith("partial[ERROR]"),
        "the answer must still carry the in-band error suffix")
    }
  }

  test("an InterruptedException from the terminal delivery re-asserts the flag") {
    // a cancellation signaled THROUGH the sink on the terminal [ERROR]
    // push is still a cancellation: the delivery wrapper swallows the
    // throw (the error text is already in the returned answer) but must
    // restore the thread's interrupt status, not silently discard it
    val sse = Seq(
      """data: {"choices":[{"delta":{"content":"partial"}}]}""",
      "data: {not valid json",
      "").mkString("\n")
    withServer({ (_, _) => (200, sse) }) { url =>
      val g = new HttpGenerator(url, "gpt-x")
      val out = g.generateStream("sys", "ctx", "q") { tok =>
        if (tok.startsWith("[ERROR]")) throw new InterruptedException("cancelled")
      }
      // reads AND clears the status so later tests see a clean thread
      assert(Thread.interrupted(),
        "interrupt signaled via the sink must survive the swallow")
      assert(out.startsWith("partial[ERROR]"))
    }
  }

  test("a stalled SSE body trips the idle watchdog instead of blocking forever") {
    // HttpRequest.timeout only covers the exchange until headers; a
    // server that sends a token then stops WITHOUT closing would hang
    // the drain indefinitely. The custom server below streams one
    // delta, flushes, then stalls until released.
    val release = new java.util.concurrent.CountDownLatch(1)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r); t.setDaemon(true); t
    })
    server.createContext("/", { ex =>
      ex.getRequestBody.readAllBytes()
      ex.getResponseHeaders.set("Content-Type", "text/event-stream")
      ex.sendResponseHeaders(200, 0) // chunked: length unknown up front
      val os = ex.getResponseBody
      os.write("data: {\"choices\":[{\"delta\":{\"content\":\"tick\"}}]}\n\n"
        .getBytes(StandardCharsets.UTF_8))
      os.flush()
      release.await(30, java.util.concurrent.TimeUnit.SECONDS)
      ex.close()
    })
    server.start()
    try {
      val g = new HttpGenerator(
        s"http://127.0.0.1:${server.getAddress.getPort}", "m",
        streamIdleSeconds = 1)
      val tokens = scala.collection.mutable.ArrayBuffer[String]()
      val t0 = System.nanoTime()
      val out = g.generateStream("sys", "ctx", "q")(tokens += _)
      val secs = (System.nanoTime() - t0) / 1e9
      assert(tokens.head == "tick", "tokens before the stall still stream")
      assert(tokens.last.startsWith("[ERROR] stream stalled"),
        s"stall must surface in-band, got: ${tokens.last}")
      assert(out.startsWith("tick[ERROR]"))
      assert(secs < 15, s"watchdog must fire in ~1s, took ${secs}s")
      assert(!Thread.currentThread().isInterrupted,
        "the watchdog's interrupt must not leak to the caller")
    } finally {
      release.countDown()
      server.stop(0)
    }
  }

  test("a task-kill interrupt mid-stream propagates instead of hanging in the drain") {
    // the JDK body drain swallows interrupts while parked on its line
    // queue (flag cleared, still blocked) — so the drain runs on its
    // own daemon thread and the calling thread waits interruptibly.
    // A genuine kill must surface as the interrupted RuntimeException
    // within the 250 ms latch-poll cadence, never as an [ERROR] chunk.
    val release = new java.util.concurrent.CountDownLatch(1)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool { r =>
      val t = new Thread(r); t.setDaemon(true); t
    })
    server.createContext("/", { ex =>
      ex.getRequestBody.readAllBytes()
      ex.getResponseHeaders.set("Content-Type", "text/event-stream")
      ex.sendResponseHeaders(200, 0)
      val os = ex.getResponseBody
      os.write("data: {\"choices\":[{\"delta\":{\"content\":\"tick\"}}]}\n\n"
        .getBytes(StandardCharsets.UTF_8))
      os.flush()
      release.await(30, java.util.concurrent.TimeUnit.SECONDS)
      ex.close()
    })
    server.start()
    try {
      val g = new HttpGenerator(
        s"http://127.0.0.1:${server.getAddress.getPort}", "m",
        streamIdleSeconds = 120) // idle budget far beyond the test: the
                                 // interrupt, not the watchdog, must end it
      val sawToken = new java.util.concurrent.CountDownLatch(1)
      @volatile var thrown: Throwable = null
      @volatile var flagRestored = false
      @volatile var errChunk: String = null
      val worker = new Thread(() => {
        try g.generateStream("sys", "ctx", "q") { t =>
          if (t.startsWith("[ERROR]")) errChunk = t
          sawToken.countDown()
        } catch {
          case e: Throwable =>
            thrown = e
            flagRestored = Thread.currentThread().isInterrupted
        }
      }, "victim")
      worker.start()
      assert(sawToken.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "first token must arrive before the kill")
      val t0 = System.nanoTime()
      worker.interrupt()
      worker.join(10000)
      val secs = (System.nanoTime() - t0) / 1e9
      assert(!worker.isAlive, "the killed task thread must return")
      assert(secs < 5, s"kill must surface within the poll cadence, took ${secs}s")
      assert(thrown != null && thrown.getMessage.contains("interrupted mid-stream"),
        s"kill must propagate as an exception, got: $thrown")
      assert(flagRestored, "interrupt flag must be restored for the task runtime")
      assert(errChunk == null,
        s"a kill must not degrade into an in-band chunk, got: $errChunk")
    } finally {
      release.countDown()
      server.stop(0)
    }
  }

  test("embedColumn runs the HTTP embedder inside partitions (serializable closure)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val served = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer({ (body, _) =>
      served.incrementAndGet()
      val n = HttpJson.mapper.readTree(body).get("prompt").asText().length
      (200, s"""{"embedding":[$n.0,0.0]}""")
    }) { url =>
      val df = Seq(("a", "xy"), ("b", "xyz"), ("c", "")).toDF("id", "txt")
      val out = Embedder.embedColumn(df, "txt", new HttpEmbedder(url, "m", dim = 2))
        .collect().map(r => r.getString(0) -> r.getSeq[Float](2)).toMap
      assert(out("a").head == 2.0f && out("b").head == 3.0f)
      assert(out("c") == Seq(0.0f, 0.0f))
      assert(served.get() == 2)
    }
  }
}
