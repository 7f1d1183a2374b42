package graft.rass.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.rass.Corpus

/** A recognized entity (reference NER label set, `app/main.py:2395-2408`). */
final case class Entity(text: String, label: String)

/** NER seam (reference: LLM-prompted NER with strict-JSON extraction,
  * `app/main.py:2483-2543`; BioBERT token path exists but is disabled,
  * `main.py:2536-2540`). The rule implementation combines code/date/
  * contact regexes with gazetteers; a model implementation plugs in
  * behind the same trait.
  */
trait Ner extends Serializable {
  def extract(query: String): Seq[Entity]
}

/** Regex + gazetteer NER. Gazetteers default to the corpus pools; a
  * real deployment harvests them from ingested data at index time.
  */
final class RuleNer(
    persons: Seq[String] = Corpus.Names,
    doctors: Seq[String] = Corpus.Practitioners,
    conditions: Seq[String] = Corpus.Conditions,
    medications: Seq[String] = Corpus.Medications,
    procedures: Seq[String] = Corpus.Procedures,
    labtests: Seq[String] = Corpus.Observations,
    allergies: Seq[String] = Corpus.Allergies,
    organizations: Seq[String] = Corpus.Organizations) extends Ner {

  private val patterns: Seq[(String, scala.util.matching.Regex)] = Seq(
    "ICD10_CODE" -> "\\b[A-Z]\\d{2}(?:\\.\\d+)?\\b".r,
    "CPT_CODE" -> "\\b\\d{5}\\b".r,
    "LOINC_CODE" -> "\\b\\d{1,5}-\\d\\b".r,
    "DATE" -> ("\\b\\d{4}-\\d{2}-\\d{2}\\b|\\b\\d{1,2} (?:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)[a-z]* \\d{4}\\b" +
      "|\\b(?:january|february|march|april|may|june|july|august|september|october|november|december) \\d{1,2},? \\d{4}\\b").r,
    "EMAIL" -> "\\b\\S+@\\S+\\.\\S+\\b".r,
    "PHONE" -> "\\b\\d{3}-\\d{2,4}(?:-\\d{2,4})?\\b".r,
    "GENDER" -> "\\b(?:male|female|other)\\b".r,
    "SEVERITY" -> "\\b(?:mild|moderate|severe|severity \\d)\\b".r,
  )

  private val gazetteers: Seq[(String, Seq[String])] = Seq(
    "DOCTOR" -> doctors, // before PERSON: "dr x y" must not match a PERSON name
    "PERSON" -> persons,
    "CONDITION" -> conditions,
    "MEDICATION" -> medications,
    "PROCEDURE" -> procedures,
    "LABTEST" -> labtests,
    "ALLERGY" -> allergies,
    "ORGANIZATION" -> organizations,
  )

  override def extract(query: String): Seq[Entity] = {
    val qLower = query.toLowerCase
    val fromPatterns = patterns.flatMap { case (label, re) =>
      val src = if (label == "ICD10_CODE") query else qLower
      re.findAllIn(src).toSeq.map(m => Entity(m, label))
    }
    val fromGazetteers = gazetteers.flatMap { case (label, pool) =>
      pool.filter(v => qLower.contains(v)).map(v => Entity(v, label))
    }
    // a DOCTOR hit subsumes a PERSON hit on the same span
    val doctorTexts = fromGazetteers.filter(_.label == "DOCTOR").map(_.text)
    (fromPatterns ++ fromGazetteers).distinct.filterNot(e =>
      e.label == "PERSON" && doctorTexts.exists(_.contains(e.text)))
  }
}

/** P4 — entity list -> Column predicates (the reference's INTENDED
  * compilation, `app/main.py:2589-2610`; the live path passes the raw
  * entity list as a filter and always errors — SURVEY §4 bug list).
  * Non-date labels become phrase containment on the mapped field; DATE
  * becomes an equality-on-date OR across the 6 mapped date columns;
  * entities AND-combine. Plain Catalyst predicates — pushdown/pruning
  * apply automatically.
  */
object EntityFilters {

  /** Reference `ENTITY_FIELD_MAP` (`app/main.py:192-219`). */
  val fieldMap: Map[String, String] = Map(
    "PERSON" -> "patientName", "DOCTOR" -> "practitionerName",
    "CONDITION" -> "conditionCodeText",
    "MEDICATION" -> "medRequestMedicationDisplay",
    "PROCEDURE" -> "procedureCodeText", "LABTEST" -> "observationCodeText",
    "ANATOMY" -> "observationCodeText", "OBS_VALUE" -> "observationValue",
    "ICD10_CODE" -> "conditionCodeText", "CPT_CODE" -> "procedureCodeText",
    "LOINC_CODE" -> "observationCodeText", "GENDER" -> "patientGender",
    "PHONE" -> "patientTelecom", "EMAIL" -> "patientTelecom",
    "ADDRESS" -> "patientAddress", "ORGANIZATION" -> "organizationName",
    "SEVERITY" -> "conditionSeverity", "ALLERGY" -> "allergyCodeText")

  val dateFields: Seq[String] = Seq("conditionOnsetDateTime",
    "observationIssued", "encounterStart", "medRequestAuthoredOn",
    "procedurePerformedDateTime", "allergyOnsetDateTime")

  /** Driver-side parse of the textual date forms RuleNer extracts —
    * to_date(lit(text)) would throw under ANSI mode for "12 march 2024"
    * style strings; an unparsable date drops the predicate instead.
    */
  private[query] def parseDate(text: String): Option[java.sql.Date] = {
    import java.time.LocalDate
    import java.time.format.DateTimeFormatter
    import java.util.Locale
    val t = text.trim.toLowerCase(Locale.ROOT)
    val fmts = Seq("yyyy-MM-dd", "d MMMM yyyy", "d MMM yyyy",
      "MMMM d yyyy", "MMMM d, yyyy")
    fmts.view.flatMap { f =>
      try {
        val fmt = new java.time.format.DateTimeFormatterBuilder()
          .parseCaseInsensitive().appendPattern(f)
          .toFormatter(Locale.ENGLISH)
        Some(java.sql.Date.valueOf(LocalDate.parse(t, fmt)))
      } catch { case _: Exception => None }
    }.headOption
  }

  def compile(entities: Seq[Entity]): Option[Column] = {
    val preds = entities.flatMap {
      case Entity(text, "DATE") =>
        parseDate(text).map(d => dateFields.map(f =>
          to_date(col(f)) === lit(d)).reduce(_ || _))
      case Entity(text, label) =>
        fieldMap.get(label).map(f =>
          lower(col(f)).contains(text.toLowerCase))
    }
    preds.reduceOption(_ && _)
  }
}
