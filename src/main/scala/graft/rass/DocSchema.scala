package graft.rass

import org.apache.spark.sql.types._

/** The RASS document table schema: the sparse wide-row union of
  * structured (one row per FHIR resource) and unstructured (one row per
  * text chunk, with embedding) documents.
  *
  * Mirrors the reference index mapping field-for-field
  * (`app/main.py:350-579`): `keyword` -> StringType compared with `===`,
  * `text` -> StringType scored via [[Analyzer]]/[[Bm25]], `date` ->
  * TimestampType parsed at ingest, `knn_vector` -> ArrayType(FloatType).
  *
  * Layout for 100 TB: partition by `user_id` (the reference's
  * index-per-user, `main.py:346-347`) and cluster/bucket by `patientId`
  * (the reference's shard `_routing`, `main.py:1230`), so per-user and
  * per-patient queries prune files instead of scanning the corpus. The
  * ~80 mostly-null string columns cost almost nothing in parquet (RLE
  * null runs) and keep one scan able to serve both document kinds.
  */
object DocSchema {

  val EmbedDim = 64 // reference uses 1024 (`main.py:80`); testdata vectors are 64

  private def s(n: String) = StructField(n, StringType)
  private def ts(n: String) = StructField(n, TimestampType)

  val schema: StructType = StructType(Seq(
    // core identifiers & typing
    s("doc_id"), s("doc_type"), s("resourceType"), s("file_path"), s("file_type"),
    // patient
    s("patientId"), s("patientName"), s("patientGender"), ts("patientDOB"),
    s("patientAddress"), s("patientMaritalStatus"),
    StructField("patientMultipleBirth", IntegerType), s("patientTelecom"),
    s("patientLanguage"),
    // condition
    s("conditionId"), s("conditionCodeText"), s("conditionCategory"),
    s("conditionClinicalStatus"), s("conditionVerificationStatus"),
    ts("conditionOnsetDateTime"), ts("conditionRecordedDate"),
    s("conditionSeverity"), s("conditionNote"),
    // observation
    s("observationId"), s("observationCodeText"), s("observationValue"),
    s("observationUnit"), s("observationInterpretation"),
    ts("observationEffectiveDateTime"), ts("observationIssued"),
    s("observationReferenceRange"), s("observationNote"),
    // encounter
    s("encounterId"), s("encounterStatus"), s("encounterClass"),
    s("encounterType"), s("encounterReasonCode"), ts("encounterStart"),
    ts("encounterEnd"), s("encounterLocation"), s("encounterServiceProvider"),
    s("encounterParticipant"), s("encounterNote"),
    // medication request
    s("medRequestId"), s("medRequestMedicationDisplay"), ts("medRequestAuthoredOn"),
    s("medRequestIntent"), s("medRequestStatus"), s("medRequestPriority"),
    s("medRequestDosageInstruction"), s("medRequestDispenseRequest"),
    s("medRequestNote"),
    // procedure
    s("procedureId"), s("procedureCodeText"), s("procedureStatus"),
    ts("procedurePerformedDateTime"), s("procedureFollowUp"), s("procedureNote"),
    // allergy
    s("allergyId"), s("allergyClinicalStatus"), s("allergyVerificationStatus"),
    s("allergyType"), s("allergyCategory"), s("allergyCriticality"),
    s("allergyCodeText"), ts("allergyOnsetDateTime"), s("allergyNote"),
    // practitioner
    s("practitionerId"), s("practitionerName"), s("practitionerGender"),
    s("practitionerSpecialty"), s("practitionerAddress"), s("practitionerTelecom"),
    // organization
    s("organizationId"), s("organizationName"), s("organizationType"),
    s("organizationAddress"), s("organizationTelecom"),
    // narrative + vector
    s("unstructuredText"),
    StructField("embedding", ArrayType(FloatType)),
    // tenant partition column (reference: index-per-user)
    s("user_id"),
  ))

  /** Per-field boosts, verbatim from the reference.
    * text_fields: `app/main.py:1403-1430`; keyword_fields: `1431-1456`;
    * date_fields: `1457-1468`; structured_fields: `1722-1742`;
    * compare_fields: `1819-1826`; note_fields: `1929-1937`;
    * entity_fields: `2038-2045`.
    */
  val textFields: Seq[(String, Double)] = Seq(
    "unstructuredText" -> 3d, "patientName" -> 3d, "patientAddress" -> 3d,
    "patientTelecom" -> 3d, "conditionCodeText" -> 2d, "conditionNote" -> 2d,
    "observationCodeText" -> 1d, "observationValue" -> 1d,
    "observationReferenceRange" -> 1d, "observationNote" -> 2d,
    "encounterType" -> 1d, "encounterReasonCode" -> 1d, "encounterLocation" -> 1d,
    "encounterNote" -> 1d, "medRequestMedicationDisplay" -> 1d,
    "medRequestNote" -> 1d, "procedureCodeText" -> 1d, "procedureNote" -> 1d,
    "allergyCodeText" -> 1d, "allergyNote" -> 2d, "practitionerName" -> 3d,
    "practitionerAddress" -> 1d, "practitionerTelecom" -> 1d,
    "organizationName" -> 3d, "organizationAddress" -> 1d,
    "organizationTelecom" -> 1d)

  val keywordFields: Seq[(String, Double)] = Seq(
    "patientGender" -> 3d, "patientMaritalStatus" -> 2d, "patientLanguage" -> 3d,
    "conditionCategory" -> 2d, "conditionClinicalStatus" -> 1d,
    "conditionVerificationStatus" -> 1d, "conditionSeverity" -> 1d,
    "observationUnit" -> 1d, "observationInterpretation" -> 1d,
    "encounterStatus" -> 1d, "encounterClass" -> 1d,
    "encounterServiceProvider" -> 1d, "medRequestIntent" -> 1d,
    "medRequestStatus" -> 1d, "medRequestPriority" -> 1d,
    "procedureStatus" -> 1d, "allergyClinicalStatus" -> 1d,
    "allergyVerificationStatus" -> 1d, "allergyType" -> 1d,
    "allergyCategory" -> 1d, "allergyCriticality" -> 1d,
    "practitionerGender" -> 1d, "practitionerSpecialty" -> 1d,
    "organizationType" -> 1d)

  val dateFields: Seq[String] = Seq(
    "patientDOB", "conditionOnsetDateTime", "conditionRecordedDate",
    "observationEffectiveDateTime", "observationIssued", "encounterStart",
    "encounterEnd", "medRequestAuthoredOn", "procedurePerformedDateTime",
    "allergyOnsetDateTime")

  val structuredFields: Seq[(String, Double)] = Seq(
    "patientName" -> 3d, "patientGender" -> 3d, "patientTelecom" -> 3d,
    "conditionCodeText" -> 2d, "conditionClinicalStatus" -> 1d,
    "conditionSeverity" -> 1d, "observationCodeText" -> 1d,
    "observationValue" -> 1d, "observationUnit" -> 1d, "encounterStatus" -> 1d,
    "encounterClass" -> 1d, "medRequestMedicationDisplay" -> 1d,
    "medRequestStatus" -> 1d, "procedureCodeText" -> 1d,
    "procedureStatus" -> 1d, "allergyCodeText" -> 1d,
    "allergyClinicalStatus" -> 1d, "practitionerName" -> 3d,
    "organizationName" -> 3d)

  val compareFields: Seq[(String, Double)] = Seq(
    "conditionCodeText" -> 2d, "observationValue" -> 1d,
    "observationUnit" -> 1d, "medRequestMedicationDisplay" -> 1d,
    "procedureCodeText" -> 1d, "allergyCodeText" -> 1d)

  val noteFields: Seq[(String, Double)] = Seq(
    "conditionNote" -> 3d, "observationNote" -> 3d, "encounterNote" -> 3d,
    "medRequestNote" -> 3d, "procedureNote" -> 3d, "allergyNote" -> 3d,
    "unstructuredText" -> 2d)

  val entityFields: Seq[(String, Double)] = Seq(
    "patientName" -> 4d, "patientId" -> 4d, "patientGender" -> 3d,
    "patientTelecom" -> 3d, "practitionerName" -> 3d, "organizationName" -> 3d)

  /** Every BM25-scorable field — union of the per-intent boost maps.
    * This is the field set [[CorpusStats]] materializes at ingest.
    */
  val scoredFields: Seq[String] =
    (textFields ++ keywordFields ++ compareFields ++ noteFields)
      .map(_._1).distinct
}
