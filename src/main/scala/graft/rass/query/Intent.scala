package graft.rass.query

/** The 12 query intents (reference `INTENT_CATEGORIES`,
  * `app/main.py:2174-2187`). Intent dispatch IS the planner in this
  * engine (a 12-way case, reference `main.py:2858-2892`).
  */
sealed abstract class Intent(val name: String)

object Intent {
  case object Semantic extends Intent("SEMANTIC")
  case object Keyword extends Intent("KEYWORD")
  case object Hybrid extends Intent("HYBRID")
  case object Structured extends Intent("STRUCTURED")
  case object HybridStructured extends Intent("HYBRID_STRUCTURED")
  case object Aggregate extends Intent("AGGREGATE")
  case object Comparison extends Intent("COMPARISON")
  case object Temporal extends Intent("TEMPORAL")
  case object Explanatory extends Intent("EXPLANATORY")
  case object MultiIntent extends Intent("MULTI_INTENT")
  case object EntitySpecific extends Intent("ENTITY_SPECIFIC")
  case object DocumentFetch extends Intent("DOCUMENT_FETCH")

  val all: Seq[Intent] = Seq(Semantic, Keyword, Hybrid, Structured,
    HybridStructured, Aggregate, Comparison, Temporal, Explanatory,
    MultiIntent, EntitySpecific, DocumentFetch)

  def fromName(n: String): Intent =
    all.find(_.name == n).getOrElse(Hybrid) // unknown -> hybrid fallback (`main.py:2871`)
}

/** Classification seam (reference: zero-shot BART-MNLI,
  * `app/main.py:2613-2634`). The rule implementation is deterministic
  * and covers the reference's 26 few-shot examples exactly; an ML/LLM
  * implementation can be plugged in without touching the engine.
  */
trait IntentClassifier extends Serializable {
  def classify(query: String): Intent
}

/** Ordered keyword/regex rules distilled from the reference's few-shot
  * examples (`main.py:2192-2229`) and intent templates
  * (`train_intent.py:46-72`). First match wins.
  */
object RuleIntentClassifier extends IntentClassifier {

  private val CodePattern =
    "(icd-?10|cpt|loinc|\\bcode\\b|\\b[a-z]\\d{2}(\\.\\d+)?\\b|\\b\\d{5}\\b)".r

  override def classify(query: String): Intent = {
    val q = " " + query.toLowerCase.trim + " "
    def has(s: String) = q.contains(s)
    val hasCode = CodePattern.findFirstIn(q).isDefined
    val hasDoc = has("record") || has("document") || has("lab results")
    val hasExplain = has("explain") || has("what is") || has("what are")
    val hasList = has("list")
    val hasTrend = has("trend") || has("track ")
    val cueCount = Seq(hasDoc, hasCode, hasExplain, hasList, hasTrend)
      .count(identity)

    // \bcount\b, not contains("count") — "account" must not match
    if (has("how many") || "\\bcount\\b".r.findFirstIn(q).isDefined)
      Intent.Aggregate
    else if (has("compare") || has(" vs ") || has(" vs. ")) Intent.Comparison
    else if (has(" and ") && cueCount >= 2) Intent.MultiIntent
    else if (has(" in records")) Intent.Keyword // "find X in records"
    else if (hasTrend || has("over time") || has("over the last") ||
      has("history of")) Intent.Temporal
    else if (hasDoc) Intent.DocumentFetch
    else if (hasCode && (has("all ") || has("list ") || has("with code")))
      Intent.Structured
    else if (hasCode && has(" and ")) Intent.HybridStructured
    else if (hasCode) Intent.Keyword
    else if ((has("both") && has(" and ")) ||
      has("male patients") || has("female patients") ||
      "over \\d+".r.findFirstIn(q).isDefined) Intent.HybridStructured
    else if ((has("details") && has("patient ") && !has("patients ")) ||
      has("info about")) Intent.EntitySpecific
    else if (has("tell me about") || has("search for") ||
      has("treatment options")) Intent.Semantic
    else if (hasExplain || has("why ") || has("symptom")) Intent.Explanatory
    else Intent.Hybrid
  }
}
