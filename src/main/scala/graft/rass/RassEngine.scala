package graft.rass

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import query._

/** P8 — answer generation seam (reference: BlueHive / OpenAI with a
  * citation-enforcing system prompt, `app/main.py:283-331,2924-2942`).
  * The stub echoes the retrieved doc ids — correctness target is
  * retrieval, not LLM text (SURVEY §2.3).
  */
trait Generator extends Serializable {
  def generate(systemPrompt: String, context: String, query: String): String
}

object StubGenerator extends Generator {
  override def generate(systemPrompt: String, context: String, query: String): String = {
    val ids = "Document ID: (\\S+)".r.findAllMatchIn(context).map(_.group(1)).toSeq
    s"[stub] answer for '$query' citing ${ids.mkString(", ")}"
  }
}

/** Chat history store (reference: Postgres/Prisma Chat+Message,
  * `prisma/schema.prisma:10-38`; last-10 context window `main.py:99`).
  */
final case class ChatMessage(chatId: String, role: String, content: String,
    createdAt: java.sql.Timestamp)

final class ChatStore extends Serializable {
  private val messages = scala.collection.mutable.ArrayBuffer[ChatMessage]()
  def append(m: ChatMessage): Unit = synchronized { messages += m }
  def history(chatId: String, n: Int = 10): Seq[ChatMessage] = synchronized {
    messages.filter(_.chatId == chatId).sortBy(_.createdAt.getTime).takeRight(n).toSeq
  }
}

/** The ask() orchestration (reference `app/main.py:2750-2964`):
  * NER -> intent -> entity filters -> patient resolution -> query
  * embedding -> 12-way dispatch -> context assembly -> generation ->
  * history append. Driver-side control flow; every data-touching step
  * is a DataFrame pipeline on executors.
  */
final class RassEngine(
    docs: DataFrame,
    embedder: Embedder = new DeterministicEmbedder(),
    intentClassifier: IntentClassifier = RuleIntentClassifier,
    ner: Ner = new RuleNer(),
    generator: Generator = StubGenerator,
    chatStore: ChatStore = new ChatStore,
    nowMicros: () => Long = () => System.currentTimeMillis() * 1000L) {

  final case class Answer(query: String, intent: Intent, answer: String,
    hits: Seq[(String, Double)], patient: Option[(String, Seq[String])])

  private val CitationPrompt =
    "You are a medical assistant. Cite every claim with its Document ID."

  def ask(queryText: String, userId: String, chatId: String,
      topK: Int = Searches.DefaultK): Answer = {
    require(queryText.nonEmpty, "empty query")
    val entities = ner.extract(queryText)
    val intent = intentClassifier.classify(queryText)
    val patient = PatientResolver.resolve(docs, ner, queryText)
    val patientId = patient.flatMap(_._2.headOption)
    val entityFilter = EntityFilters.compile(entities)
    val qv = embedder.embedBatch(Seq(queryText)).head.map(_.toDouble).toSeq
    val now = nowMicros()

    val hitsDf: DataFrame = intent match {
      case Intent.Keyword => Searches.q1ExactMatch(docs, queryText, topK, patientId, entityFilter)
      case Intent.Semantic => Searches.q2Semantic(docs, qv, topK, patientId, entityFilter)
      case Intent.Hybrid => Searches.q3Hybrid(docs, queryText, qv, topK, patientId, entityFilter)
      case Intent.Structured => Searches.q4Structured(docs, queryText, topK, patientId, entityFilter)
      case Intent.HybridStructured => Searches.q5HybridStructured(docs, queryText, qv, topK, patientId, entityFilter)
      case Intent.Aggregate => Searches.q6Aggregate(docs, patientId, entityFilter)
      case Intent.Comparison => Searches.q7Comparison(docs, queryText, topK, patientId, entityFilter)
      case Intent.Temporal => Searches.q8Temporal(docs, queryText, now, topK, patientId, entityFilter)
      case Intent.Explanatory => Searches.q9Explanatory(docs, queryText, topK, patientId, entityFilter)
      case Intent.MultiIntent => Searches.q10MultiIntent(docs, queryText, qv, now, topK, patientId, entityFilter)
      case Intent.EntitySpecific => Searches.q11EntitySpecific(docs, queryText, topK, patientId, entityFilter)
      case Intent.DocumentFetch => patientId match {
        case Some(p) => Searches.q12DocumentFetch(docs, p, topK, entityFilter)
        case None => docs.sparkSession.emptyDataFrame
          .withColumn("doc_id", lit(null: String))
          .withColumn("score", lit(0.0)).limit(0) // reference returns [] (`main.py:2127-2128`)
      }
    }

    val collected = hitsDf.collect()
    val hits: Seq[(String, Double)] = intent match {
      case Intent.Aggregate =>
        collected.map(r => (s"${r.getString(0)}=${r.get(1)}", r.getLong(2).toDouble)).toSeq
      case Intent.Temporal | Intent.DocumentFetch =>
        collected.flatMap(r => Option(r.getString(if (intent == Intent.DocumentFetch) 1 else 0))
          .map(_ -> 0.0)).toSeq
      case _ => collected.map(r => (r.getString(0), r.getDouble(1))).toSeq
    }

    // P7 context assembly (dedupe by doc id, snippet blocks, `main.py:2894-2921`)
    val context = hits.map(_._1).distinct
      .map(id => s"--- Document ID: $id ---").mkString("\n")
    val historyText = chatStore.history(chatId)
      .map(m => s"${if (m.role == "user") "User" else "AI"}: ${m.content}").mkString("\n")
    val answer = generator.generate(CitationPrompt,
      s"$historyText\n$context", queryText)

    val ts = new java.sql.Timestamp(now / 1000)
    chatStore.append(ChatMessage(chatId, "user", queryText, ts))
    chatStore.append(ChatMessage(chatId, "assistant", answer, ts))
    Answer(queryText, intent, answer, hits, patient)
  }
}
