package graft.rass.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One generated training/evaluation case: the filled query text, the
  * intent its template carries, the entities that were substituted in
  * (label + value), and their character spans in the text — the same
  * record shape as the reference's `fill()` output
  * (`app/train_ner.py:789-851`: text + (start, end, label) spans).
  */
final case class LabeledQuery(
    text: String,
    intent: Intent,
    entities: Seq[Entity],
    spans: Seq[(Int, Int, String)])

/** SURVEY §2.5 — deterministic synthetic query generation.
  *
  * The reference builds its NER/intent training sets by (a) walking
  * ingested Synthea FHIR bundles to harvest per-label entity pools
  * (`app/train_ner.py:81-232`, defaults when a pool is empty), then
  * (b) filling slot templates with seeded-random pool values and
  * recording the substituted spans (`train_ner.py:237-851`, seed 42 at
  * `train_ner.py:20`; intent templates `train_intent.py:42-116`). The
  * fine-tuning that consumes the data is out of scope (SURVEY §2.5);
  * the preserved capability is the generator itself: pools harvested
  * from INGESTED data, deterministic fill, labeled output.
  *
  * Differences from the reference, deliberate: the pools are harvested
  * from the engine's own structured rows (one stacked-explode Spark
  * pass over the mapped columns — the same shape works on a 100 TB
  * corpus, where the harvest is a distinct-aggregate at ingest time,
  * not a driver walk of raw files), values are lowercased to match the
  * rule gazetteers, and the template set is an original one written
  * against this repo's [[RuleIntentClassifier]]/[[RuleNer]] so every
  * generated case round-trips through classification and extraction.
  */
object SyntheticQueries {

  /** Per-label entity pools. Every pool is non-empty: harvest fills
    * what the data provides, label-specific defaults cover the rest
    * (the reference keeps defaults for empty pools too,
    * `train_ner.py:81-232`).
    */
  final case class Pools(byLabel: Map[String, Seq[String]]) {
    def apply(label: String): Seq[String] = byLabel(label)
  }

  /** (label, source column) pairs for the gazetteer-backed labels —
    * the column mapping is [[EntityFilters.fieldMap]] read in reverse.
    */
  private val HarvestColumns: Seq[(String, String)] = Seq(
    "PERSON" -> "patientName",
    "DOCTOR" -> "practitionerName",
    "CONDITION" -> "conditionCodeText",
    "MEDICATION" -> "medRequestMedicationDisplay",
    "PROCEDURE" -> "procedureCodeText",
    "LABTEST" -> "observationCodeText",
    "ALLERGY" -> "allergyCodeText",
    "ORGANIZATION" -> "organizationName",
    "GENDER" -> "patientGender",
    "SEVERITY" -> "conditionSeverity",
    "TELECOM" -> "patientTelecom",
  )

  private val Defaults: Map[String, Seq[String]] = Map(
    "PERSON" -> Seq("alice johnson", "bob smith"),
    "DOCTOR" -> Seq("dr alan reed", "dr betty cole"),
    "CONDITION" -> Seq("diabetes mellitus", "hypertension"),
    "MEDICATION" -> Seq("metformin", "lisinopril"),
    "PROCEDURE" -> Seq("appendectomy", "colonoscopy"),
    "LABTEST" -> Seq("hemoglobin a1c", "blood pressure"),
    "ALLERGY" -> Seq("penicillin", "peanut"),
    "ORGANIZATION" -> Seq("general hospital", "city clinic"),
    "GENDER" -> Seq("male", "female"),
    "SEVERITY" -> Seq("mild", "moderate", "severe"),
    "PHONE" -> Seq("555-123-4567", "555-987-6543"),
    "EMAIL" -> Seq("alice@example.org", "bob@example.org"),
    "DATE" -> Seq("2024-01-15", "2023-11-02"),
    // code pools default like the reference's: the fixture columns
    // carry display text, not raw codes (`train_ner.py` defaults)
    "ICD10_CODE" -> Seq("I21", "E11.9", "J45"),
    "CPT_CODE" -> Seq("99213", "93000"),
    "LOINC_CODE" -> Seq("1234-5", "718-7"),
  )

  private val PhoneRe = "\\d{3}-\\d{2,4}(?:-\\d{2,4})?".r
  private val SeverityRe = "(?:mild|moderate|severe)".r

  /** Harvest pools from ingested structured rows: ONE stacked-explode
    * pass over the mapped columns (the CorpusStats.build shape), then
    * distinct (label, value). Dates come from conditionOnsetDateTime
    * rendered ISO so the rule NER's date regex recognizes them.
    */
  def harvestPools(docs: DataFrame): Pools = {
    val stacked = docs.select(explode(array(
      HarvestColumns.map { case (label, c) =>
        struct(lit(label).as("label"), lower(col(c)).as("value"))
      } :+
        struct(lit("DATE").as("label"),
          date_format(col("conditionOnsetDateTime"), "yyyy-MM-dd").as("value")): _*))
      .as("lv"))
      .select(col("lv.label").as("label"), col("lv.value").as("value"))
      .filter(col("value").isNotNull && length(trim(col("value"))) > 0)
      .distinct()
      .collect()
      .map(r => r.getString(0) -> r.getString(1).trim)
    val harvested = stacked.groupBy(_._1).map { case (l, vs) =>
      l -> vs.map(_._2).distinct.sorted.toSeq
    }
    // telecom splits into phone-shaped and email-shaped values; a
    // severity only enters its pool if the rule NER can extract it back
    val telecom = harvested.getOrElse("TELECOM", Nil)
    val phones = telecom.filter(v => PhoneRe.findFirstIn(v).contains(v))
    val emails = telecom.filter(_.contains("@"))
    val severities = harvested.getOrElse("SEVERITY", Nil)
      .filter(v => SeverityRe.findFirstIn(v).contains(v))
    val merged = Defaults.map { case (label, dflt) =>
      val pool = label match {
        case "PHONE" => phones
        case "EMAIL" => emails
        case "SEVERITY" => severities
        case "ICD10_CODE" | "CPT_CODE" | "LOINC_CODE" => Nil
        case l => harvested.getOrElse(l, Nil)
      }
      label -> (if (pool.nonEmpty) pool else dflt)
    }
    Pools(merged)
  }

  /** The template set: (text with {} slots, slot labels, intent). An
    * original set (not the reference's 400 — `train_ner.py:237-675` —
    * which belongs to its BioBERT trainer), written so that every fill
    * classifies to the stated intent under [[RuleIntentClassifier]]
    * and every slot value is recoverable by [[RuleNer]] built over the
    * same pools. All 12 intents and all extractable labels appear.
    */
  val Templates: Seq[(String, Seq[String], Intent)] = Seq(
    ("Fetch the medical records for patient {}.", Seq("PERSON"), Intent.DocumentFetch),
    ("Get the latest lab results for {}.", Seq("PERSON"), Intent.DocumentFetch),
    ("Show info about {}.", Seq("PERSON"), Intent.EntitySpecific),
    ("How many patients have {}?", Seq("CONDITION"), Intent.Aggregate),
    ("Count patients taking {}.", Seq("MEDICATION"), Intent.Aggregate),
    ("How many {} patients are there?", Seq("GENDER"), Intent.Aggregate),
    ("What are the symptoms of {}?", Seq("CONDITION"), Intent.Explanatory),
    ("Why did {} prescribe {}?", Seq("DOCTOR", "MEDICATION"), Intent.Explanatory),
    ("Search for {} treatment options.", Seq("CONDITION"), Intent.Semantic),
    ("List patients with {}.", Seq("CONDITION"), Intent.Hybrid),
    ("Has {} experienced {} with {} symptoms before?",
      Seq("PERSON", "CONDITION", "SEVERITY"), Intent.Explanatory),
    ("Contact {} at {} about the referral.", Seq("DOCTOR", "PHONE"), Intent.Hybrid),
    ("Email {} regarding {} exposure.", Seq("EMAIL", "ALLERGY"), Intent.Hybrid),
    ("Show trends for {}.", Seq("LABTEST"), Intent.Temporal),
    ("Track {} for patient {} since {}.",
      Seq("LABTEST", "PERSON", "DATE"), Intent.Temporal),
    ("Find conditions with code {}.", Seq("ICD10_CODE"), Intent.Structured),
    ("List procedures with code {} for {}.",
      Seq("CPT_CODE", "PERSON"), Intent.Structured),
    ("Look up code {}.", Seq("LOINC_CODE"), Intent.Keyword),
    ("Find {} in records.", Seq("CONDITION"), Intent.Keyword),
    ("Find patients with {} and code {}.",
      Seq("CONDITION", "ICD10_CODE"), Intent.HybridStructured),
    ("Compare {} vs {} outcomes.",
      Seq("CONDITION", "CONDITION"), Intent.Comparison),
    ("Compare {} results for {} against {}.",
      Seq("LABTEST", "PERSON", "PERSON"), Intent.Comparison),
    ("Explain {} and list patients with it.",
      Seq("CONDITION"), Intent.MultiIntent),
    ("Explain {} and track {} for {}.",
      Seq("CONDITION", "LABTEST", "PERSON"), Intent.MultiIntent),
    ("Visited {} for {} treatment by {}.",
      Seq("ORGANIZATION", "PROCEDURE", "DOCTOR"), Intent.Hybrid),
  )

  /** Fill `n` cases deterministically: template `i % |templates|`,
    * values drawn from a `seed`-initialized RNG (the reference pins
    * seed 42, `train_ner.py:20`), spans recorded left-to-right with an
    * advancing cursor — deliberately STRICTER than the reference's
    * first-occurrence `fill()` (`train_ner.py:844-849`), which
    * mislabels the second site of a value drawn twice in one template.
    * Determinism claim: same (pools, n, seed) → THIS generator emits
    * identical output on every run, which is what the specs pin. It is
    * NOT span-identical to the reference trainer when a template draws
    * the same value twice — there the reference's spans are the known
    * mislabeling this offset tracking deliberately corrects; texts, intents,
    * and entity values still match the reference's construction.
    */
  def generate(pools: Pools, n: Int, seed: Long = 42L): Seq[LabeledQuery] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val (template, labels, intent) = Templates(i % Templates.size)
      val values = labels.map { l =>
        val pool = pools(l)
        pool(rng.nextInt(pool.size))
      }
      // spans are recorded WHILE concatenating — each slot's start is
      // the running length at the moment its value is appended. A
      // post-hoc search (even a cursor-advancing indexOf) can match a
      // coincidental occurrence of the value inside template literal
      // text or a previous fill's tail, mislabeling the span AND
      // desynchronizing every span after it; the running offset cannot.
      val sbuf = new StringBuilder
      val starts = Array.newBuilder[Int]
      template.split("\\{\\}", -1).zipAll(values, "", "").foreach {
        case (part, v) =>
          sbuf.append(part)
          starts += sbuf.length
          sbuf.append(v)
      }
      val text = sbuf.result()
      val slotStarts = starts.result()
      val spans = values.zip(labels).zipWithIndex.map { case ((v, l), j) =>
        val start = slotStarts(j)
        (start, start + v.length, l)
      }
      LabeledQuery(text, intent,
        values.zip(labels).map { case (v, l) => Entity(v, l) }, spans)
    }
  }

  /** A [[RuleNer]] whose gazetteers are the harvested pools — the
    * extractor the generated cases round-trip through (and the one a
    * deployment over this corpus would actually run).
    */
  def nerFor(pools: Pools): RuleNer = new RuleNer(
    persons = pools("PERSON"),
    doctors = pools("DOCTOR"),
    conditions = pools("CONDITION"),
    medications = pools("MEDICATION"),
    procedures = pools("PROCEDURE"),
    labtests = pools("LABTEST"),
    allergies = pools("ALLERGY"),
    organizations = pools("ORGANIZATION"))
}
