package graft.rass.query

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.rass.HttpJson

/** HttpIntent against an in-process JDK HttpServer — hermetic, nothing
  * leaves localhost. Covers the strict-output hygiene: clean label,
  * fenced/cased/prose-wrapped labels, the HYBRID vs HYBRID_STRUCTURED
  * word-boundary hazard, ambiguity and garbage → rule fallback, the
  * full 12-label closed set, and transport failure → fallback.
  */
class HttpIntentSpec extends AnyFunSuite {

  /** Fallback whose answer can't be mistaken for a parsed response on
    * the queries used here (rules would never say DOCUMENT_FETCH for
    * "q").
    */
  private val markerFallback: IntentClassifier = new IntentClassifier {
    override def classify(query: String): Intent = Intent.DocumentFetch
  }

  private def completion(content: String): String = {
    val m = HttpJson.mapper
    val root = m.createObjectNode()
    val msg = root.putArray("choices").addObject().putObject("message")
    msg.put("content", content)
    m.writeValueAsString(root)
  }

  private def withServer(handler: String => (Int, String))
      (f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val (code, resp) = handler(body)
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("a clean label classifies; request carries the closed-set system message") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    withServer { body =>
      seen.synchronized { seen += body }
      (200, completion("TEMPORAL"))
    } { url =>
      val cls = new HttpIntent(url, markerFallback)
      assert(cls.classify("Show trends for a1c") == Intent.Temporal)
      val req = HttpJson.mapper.readTree(seen.head)
      val sys = req.get("systemMessage").asText()
      Intent.all.foreach(i => assert(sys.contains(i.name),
        s"system message must advertise ${i.name}"))
      assert(req.get("prompt").asText().contains("Query: \"Show trends for a1c\""))
    }
  }

  test("every label of the closed set round-trips, fenced and lowercased included") {
    Intent.all.foreach { intent =>
      withServer { _ =>
        (200, completion(s"```\n${intent.name.toLowerCase}\n```"))
      } { url =>
        val cls = new HttpIntent(url, markerFallback)
        assert(cls.classify("q") == intent, s"label ${intent.name} failed")
      }
    }
  }

  test("HYBRID_STRUCTURED is not mistaken for HYBRID (word-boundary, underscores)") {
    withServer { _ => (200, completion("The intent is HYBRID_STRUCTURED.")) } { url =>
      val cls = new HttpIntent(url, markerFallback)
      assert(cls.classify("q") == Intent.HybridStructured)
    }
  }

  test("a response naming several labels is ambiguous -> fallback") {
    withServer { _ =>
      (200, completion("It could be SEMANTIC or maybe KEYWORD."))
    } { url =>
      val cls = new HttpIntent(url, markerFallback)
      assert(cls.classify("q") == Intent.DocumentFetch)
    }
    // the same label twice is NOT ambiguous
    withServer { _ =>
      (200, completion("SEMANTIC. Final answer: SEMANTIC"))
    } { url =>
      val cls = new HttpIntent(url, markerFallback)
      assert(cls.classify("q") == Intent.Semantic)
    }
  }

  test("garbage with no valid label falls back to the rule classifier") {
    withServer { _ => (200, completion("I'm not sure what you mean!")) } { url =>
      val cls = new HttpIntent(url, markerFallback)
      assert(cls.classify("q") == Intent.DocumentFetch)
    }
  }

  test("HTTP failure (5xx) falls back; default fallback is RuleIntentClassifier") {
    withServer { _ => (500, "boom") } { url =>
      val cls = new HttpIntent(url, markerFallback, maxRetries = 0)
      assert(cls.classify("q") == Intent.DocumentFetch)
    }
    // dead endpoint + default fallback: rules still classify
    val cls = new HttpIntent("http://127.0.0.1:1/", maxRetries = 0)
    assert(cls.classify("How many patients have asthma?") == Intent.Aggregate)
  }
}
