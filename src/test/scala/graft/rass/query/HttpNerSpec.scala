package graft.rass.query

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.rass.HttpJson

/** HttpNer against an in-process JDK HttpServer — hermetic, nothing
  * leaves localhost. Covers the reference's response-hygiene chain
  * (`app/main.py:2505-2528`): clean JSON, fenced JSON, bracket-slice,
  * garbage → rule fallback, no-bracket prose → empty (NOT fallback),
  * label filtering incl. the PATIENT_ID quirk.
  */
class HttpNerSpec extends AnyFunSuite {

  /** Deterministic fallback whose output can't be confused with a
    * parsed model response.
    */
  private val markerFallback: Ner = new Ner {
    override def extract(query: String): Seq[Entity] =
      Seq(Entity("FALLBACK", "CONDITION"))
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

  test("clean JSON parses; PATIENT_ID is filtered despite the prompt advertising it") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    withServer { body =>
      seen.synchronized { seen += body }
      (200, completion(
        """[{"text": "Julian140", "label": "PATIENT_ID"},
          | {"text": "diabetes", "label": "CONDITION"}]""".stripMargin))
    } { url =>
      val ner = new HttpNer(url, markerFallback)
      assert(ner.extract("Patient Julian140 has diabetes") ==
        Seq(Entity("diabetes", "CONDITION")))
      // request carries the strict-JSON system message + framed prompt
      val req = HttpJson.mapper.readTree(seen.head)
      assert(req.get("systemMessage").asText().contains("JSON array"))
      val prompt = req.get("prompt").asText()
      assert(prompt.contains("Sentence: \"Patient Julian140 has diabetes\""))
      assert(prompt.contains("Entities:"))
    }
  }

  test("fenced ```json block is stripped before parsing") {
    withServer { _ =>
      (200, completion(
        "```json\n[{\"text\": \"Metformin\", \"label\": \"MEDICATION\"}]\n```"))
    } { url =>
      val ner = new HttpNer(url, markerFallback)
      assert(ner.extract("q") == Seq(Entity("Metformin", "MEDICATION")))
    }
  }

  test("prose around the array is bracket-sliced away") {
    withServer { _ =>
      (200, completion(
        """Entities: [{"text": "Dr. Alice Wong", "label": "DOCTOR"}] hope that helps!"""))
    } { url =>
      val ner = new HttpNer(url, markerFallback)
      assert(ner.extract("q") == Seq(Entity("Dr. Alice Wong", "DOCTOR")))
    }
  }

  test("unparseable garbage falls back to the rule extractor") {
    withServer { _ =>
      (200, completion("""[{"text": "broken", "label": ]]] not json"""))
    } { url =>
      val ner = new HttpNer(url, markerFallback)
      assert(ner.extract("q") == Seq(Entity("FALLBACK", "CONDITION")))
    }
  }

  test("a bare JSON object coerces to empty — no square brackets means the reference's '[]' path") {
    // `main.py:2510-2513`: the slice only fires when BOTH brackets are
    // present; `{...}` has neither, so the raw text coerces to "[]" —
    // a successful empty extraction, not a fallback-worthy failure
    withServer { _ =>
      (200, completion("""{"text": "diabetes", "label": "CONDITION"}"""))
    } { url =>
      val ner = new HttpNer(url, markerFallback)
      assert(ner.extract("q").isEmpty)
    }
  }

  test("no-bracket prose coerces to an empty extraction, NOT the fallback") {
    // reference `main.py:2512-2513`: text without brackets becomes "[]"
    // — a successful "no entities" answer, so the fallback must NOT run
    withServer { _ => (200, completion("I found no entities here.")) } { url =>
      val ner = new HttpNer(url, markerFallback)
      assert(ner.extract("general health question").isEmpty)
    }
  }

  test("elements missing text/label or with unknown labels are dropped, rest kept") {
    withServer { _ =>
      (200, completion(
        """[{"text": "x"}, {"label": "CONDITION"},
          | {"text": "asthma", "label": "WEIRD_LABEL"},
          | {"text": "2024-01-15", "label": "DATE"},
          | {"text": "Lisinopril", "label": "MEDICATION"}]""".stripMargin))
    } { url =>
      val ner = new HttpNer(url, markerFallback)
      assert(ner.extract("q") ==
        Seq(Entity("2024-01-15", "DATE"), Entity("Lisinopril", "MEDICATION")))
    }
  }

  test("HTTP failure (4xx) falls back to the rule extractor") {
    withServer { _ => (400, "bad request") } { url =>
      val ner = new HttpNer(url, markerFallback)
      assert(ner.extract("q") == Seq(Entity("FALLBACK", "CONDITION")))
    }
  }

  test("default fallback is RuleNer: a dead endpoint still extracts gazetteer hits") {
    // port 1 refuses connections instantly; the default RuleNer must
    // still see the condition term
    val ner = new HttpNer("http://127.0.0.1:1/", maxRetries = 0)
    val out = ner.extract("Patients with diabetes on 2024-01-15")
    assert(out.contains(Entity("2024-01-15", "DATE")))
  }
}
