package graft.rass.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.rass.Analyzer

/** P5 — patient-name -> patientId resolution (reference
  * `resolve_patient_ids_from_name`, `app/main.py:2637-2744`): NER finds
  * the first PERSON-ish entity; the lookup scores exact keyword match
  * over phrase containment over fuzzy all-terms match (the reference's
  * three should-clauses), collapses to distinct patientIds, keeps 3.
  *
  * Scale shape: the scan projects only (patientId, patientName) —
  * column pruning — and the collapse shuffles just the id+score pairs.
  */
object PatientResolver {

  val MaxIds = 3 // reference `size: 3` (`main.py:2725`)

  def resolve(docs: DataFrame, ner: Ner, query: String): Option[(String, Seq[String])] = {
    val person = ner.extract(query)
      .find(e => e.label == "PERSON" || e.label == "PATIENT" || e.label == "PATIENT_ID")
    person.map { p =>
      val name = p.text
      val terms = Analyzer.normalizeQuery(name)
      val exact = col("patientName") === name
      val phrase = Analyzer.phraseCount(col("patientName"), terms) > 0
      val fuzzy = Analyzer.allTermsFuzzyMatch(col("patientName"), terms)
      val ids = docs
        .filter(col("patientName").isNotNull)
        .select(col("patientId"),
          when(exact, 3).when(phrase, 2).when(fuzzy, 1).otherwise(0).as("s"))
        .filter(col("s") > 0)
        .groupBy(col("patientId")).agg(max(col("s")).as("s"))
        .orderBy(col("s").desc, col("patientId"))
        .limit(MaxIds)
        .collect().map(_.getString(0)).toSeq
      (name, ids)
    }
  }
}
