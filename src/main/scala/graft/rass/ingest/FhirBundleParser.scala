package graft.rass.ingest

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}

import graft.rass.{Chunker, DocSchema}

/** S2/S3/S4 — FHIR bundle -> (structured rows, unstructured chunk rows),
  * mirroring the reference parser field-for-field
  * (`app/main.py:594-1132`): 9 resource types, narrative harvest from
  * `text.div` plus every `note[].text`, CodeableConcept extraction
  * (`text` else `coding[0].code`, `main.py:585-591`) and the display
  * variant (`text` else `coding[0].display`), " | " joins for repeated
  * elements, unknown resource types yielding an all-null structured row
  * (the reference's fall-through).
  *
  * Implemented as a typed row mapper (`Dataset.flatMap`) rather than
  * `from_json`: FHIR re-uses field names with different shapes per
  * resource (e.g. `category` is CodeableConcept[] on Condition but
  * code[] on AllergyIntolerance), which a single explicit schema cannot
  * hold without lossy null-outs — SURVEY §2.1 S2 records both options
  * and the mapper keeps extraction bit-faithful. Parsing is still fully
  * distributed (one task per partition of bundle files) and feeds the
  * columnar [[DocSchema]] table; everything downstream is pure Spark.
  */
object FhirBundleParser {

  private val ChunkSize = Chunker.DefaultChunkSize

  @transient private lazy val mapper = new ObjectMapper()

  // ------------------------------------------------------------ json helpers
  private def str(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)

  private def arr(n: JsonNode, f: String): Seq[JsonNode] =
    Option(n.get(f)).filterNot(_.isNull).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)

  private def obj(n: JsonNode, f: String): Option[JsonNode] =
    Option(n.get(f)).filter(_.isObject)

  /** `extract_code_text` (`main.py:585-591`): text else coding[0].code
    * else the raw value as string.
    */
  private def codeText(n: Option[JsonNode]): Option[String] = n.flatMap {
    case o if o.isObject =>
      str(o, "text").orElse(arr(o, "coding").headOption.flatMap(str(_, "code")))
    case v if v.isNull => None
    case v => Some(v.asText)
  }

  /** Display-text variant (`main.py:814-818` et al.): text else
    * coding[0].display.
    */
  private def displayText(n: Option[JsonNode]): Option[String] = n.flatMap { o =>
    str(o, "text").orElse(arr(o, "coding").headOption.flatMap(str(_, "display")))
  }

  private def humanName(r: JsonNode): Option[String] =
    arr(r, "name").headOption.map { n =>
      val given = arr(n, "given").map(_.asText).mkString(" ")
      val family = str(n, "family").getOrElse("")
      s"$given $family".trim
    }.filter(_.nonEmpty)

  private def addressStr(r: JsonNode): Option[String] =
    arr(r, "address").headOption.map { a =>
      val lines = arr(a, "line").map(_.asText)
      val rest = Seq("city", "state", "postalCode").map(str(a, _).getOrElse(""))
      (lines ++ rest).mkString(" ").trim
    }.filter(_.nonEmpty)

  private def telecomStr(r: JsonNode): Option[String] = {
    val ts = arr(r, "telecom").map { t =>
      s"${str(t, "use").getOrElse("")}: ${str(t, "value").getOrElse("")}"
    }
    if (ts.isEmpty) None else Some(ts.mkString(" | "))
  }

  private def notes(r: JsonNode): Seq[String] =
    arr(r, "note").flatMap(str(_, "text")).map(_.trim).filter(_.nonEmpty)

  /** Multi-format date parse (index mapping `main.py:382-385,414-417`):
    * yyyy-MM-dd, ISO date-time (with or without zone), epoch millis.
    */
  private[ingest] def parseTs(s: String): Option[java.sql.Timestamp] = {
    import java.time._
    import java.time.format.DateTimeFormatter
    val t = s.trim
    def attempt(f: => java.sql.Timestamp): Option[java.sql.Timestamp] =
      try Some(f) catch { case _: Exception => None }
    attempt(java.sql.Timestamp.from(OffsetDateTime.parse(t).toInstant))
      .orElse(attempt(java.sql.Timestamp.from(
        LocalDateTime.parse(t, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
          .toInstant(ZoneOffset.UTC))))
      .orElse(attempt(java.sql.Timestamp.from(
        LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC))))
      .orElse(attempt(java.sql.Timestamp.from(Instant.ofEpochMilli(t.toLong))))
  }

  // ------------------------------------------------------------ the parser

  /** One bundle -> rows in [[DocSchema.schema]] order. */
  def parseBundleRows(bundleJson: String, filePath: String = null,
      userId: String = "default"): Seq[Row] = {
    val root = try mapper.readTree(bundleJson) catch { case _: Exception => return Seq.empty }
    if (root == null || !root.has("entry")) return Seq.empty

    root.get("entry").elements().asScala.toSeq.flatMap { entry =>
      val r = Option(entry.get("resource")).getOrElse(mapper.createObjectNode())
      val rtype = str(r, "resourceType").getOrElse("")
      val rid = str(r, "id").getOrElse("")
      val fields = scala.collection.mutable.Map[String, Any](
        "doc_id" -> s"$rtype-$rid-structured",
        "doc_type" -> "structured",
        "resourceType" -> rtype,
        "file_path" -> filePath,
        "file_type" -> "json",
        "user_id" -> userId)
      def put(k: String, v: Option[Any]): Unit = v.foreach(fields(k) = _)
      def putTs(k: String, v: Option[String]): Unit =
        v.flatMap(parseTs).foreach(fields(k) = _)

      val divText = obj(r, "text").flatMap(str(_, "div")).map(_.trim)
        .filter(_.nonEmpty)
      var pieces: Seq[String] = divText.toSeq

      rtype match {
        case "Patient" =>
          fields("patientId") = rid
          put("patientGender", str(r, "gender"))
          putTs("patientDOB", str(r, "birthDate"))
          put("patientName", humanName(r))
          put("patientAddress", addressStr(r))
          put("patientMaritalStatus", codeText(obj(r, "maritalStatus")))
          put("patientMultipleBirth",
            Option(r.get("multipleBirthInteger")).filterNot(_.isNull).map(_.asInt)
              .orElse(Option(r.get("multipleBirthBoolean")).filterNot(_.isNull)
                .map(b => if (b.asBoolean) 1 else 0)))
          put("patientTelecom", telecomStr(r))
          put("patientLanguage", codeText(
            arr(r, "communication").headOption.flatMap(obj(_, "language"))))
        case "Condition" =>
          fields("conditionId") = rid
          put("conditionClinicalStatus", codeText(obj(r, "clinicalStatus")))
          put("conditionVerificationStatus", codeText(obj(r, "verificationStatus")))
          put("conditionCategory", codeText(arr(r, "category").headOption))
          put("conditionSeverity", codeText(obj(r, "severity")))
          put("conditionCodeText", displayText(obj(r, "code")))
          putTs("conditionOnsetDateTime", str(r, "onsetDateTime"))
          putTs("conditionRecordedDate", str(r, "recordedDate"))
          val ns = notes(r)
          if (ns.nonEmpty) { fields("conditionNote") = ns.mkString(" | "); pieces ++= ns }
        case "Observation" =>
          fields("observationId") = rid
          put("observationCodeText", displayText(obj(r, "code")))
          obj(r, "valueQuantity").foreach { vq =>
            fields("observationValue") =
              Option(vq.get("value")).filterNot(_.isNull).map(_.asText).getOrElse("")
            str(vq, "unit").foreach(fields("observationUnit") = _)
          }
          put("observationInterpretation",
            arr(r, "interpretation").headOption.flatMap(i =>
              str(i, "text").orElse(arr(i, "coding").headOption.flatMap(str(_, "code")))))
          putTs("observationEffectiveDateTime", str(r, "effectiveDateTime"))
          putTs("observationIssued", str(r, "issued"))
          val rrs = arr(r, "referenceRange").map { rr =>
            val low = obj(rr, "low").flatMap(str(_, "value")).getOrElse("")
            val high = obj(rr, "high").flatMap(str(_, "value")).getOrElse("")
            s"Low: $low, High: $high".trim
          }
          if (rrs.nonEmpty) fields("observationReferenceRange") = rrs.mkString(" ; ")
          val ns = notes(r)
          if (ns.nonEmpty) { fields("observationNote") = ns.mkString(" | "); pieces ++= ns }
        case "Encounter" =>
          fields("encounterId") = rid
          put("encounterStatus", str(r, "status"))
          put("encounterClass", obj(r, "class").flatMap(str(_, "code")))
          put("encounterType", displayText(arr(r, "type").headOption))
          put("encounterReasonCode", displayText(arr(r, "reasonCode").headOption))
          obj(r, "period").foreach { p =>
            putTs("encounterStart", str(p, "start"))
            putTs("encounterEnd", str(p, "end"))
          }
          put("encounterLocation", arr(r, "location").headOption
            .flatMap(obj(_, "location")).flatMap(str(_, "display")))
          put("encounterServiceProvider",
            obj(r, "serviceProvider").flatMap(str(_, "reference")))
          val parts = arr(r, "participant")
            .map(p => obj(p, "individual").flatMap(str(_, "display")).getOrElse(""))
          if (parts.nonEmpty) fields("encounterParticipant") = parts.mkString(" | ")
          val ns = notes(r)
          if (ns.nonEmpty) { fields("encounterNote") = ns.mkString(" | "); pieces ++= ns }
        case "MedicationRequest" =>
          fields("medRequestId") = rid
          put("medRequestIntent", str(r, "intent"))
          put("medRequestStatus", str(r, "status"))
          put("medRequestPriority", str(r, "priority"))
          putTs("medRequestAuthoredOn", str(r, "authoredOn"))
          put("medRequestMedicationDisplay",
            displayText(obj(r, "medicationCodeableConcept")))
          val dis = arr(r, "dosageInstruction").map(di => str(di, "text").getOrElse(""))
          if (dis.nonEmpty) fields("medRequestDosageInstruction") = dis.mkString(" | ")
          obj(r, "dispenseRequest").foreach(dr =>
            fields("medRequestDispenseRequest") = dr.toString) // json.dumps equivalent
          val ns = notes(r)
          if (ns.nonEmpty) { fields("medRequestNote") = ns.mkString(" | "); pieces ++= ns }
        case "Procedure" =>
          fields("procedureId") = rid
          put("procedureStatus", str(r, "status"))
          put("procedureCodeText", displayText(obj(r, "code")))
          putTs("procedurePerformedDateTime", str(r, "performedDateTime"))
          val fus = arr(r, "followUp").map(f => str(f, "text").getOrElse(""))
          if (fus.nonEmpty) fields("procedureFollowUp") = fus.mkString(" | ")
          val ns = notes(r)
          if (ns.nonEmpty) { fields("procedureNote") = ns.mkString(" | "); pieces ++= ns }
        case "AllergyIntolerance" =>
          fields("allergyId") = rid
          put("allergyClinicalStatus", codeText(Option(r.get("clinicalStatus"))))
          put("allergyVerificationStatus", codeText(Option(r.get("verificationStatus"))))
          put("allergyType", str(r, "type"))
          put("allergyCategory", codeText(arr(r, "category").headOption))
          put("allergyCriticality", str(r, "criticality"))
          put("allergyCodeText", displayText(obj(r, "code")))
          putTs("allergyOnsetDateTime", str(r, "onsetDateTime"))
          val ns = notes(r)
          if (ns.nonEmpty) { fields("allergyNote") = ns.mkString(" | "); pieces ++= ns }
        case "Practitioner" =>
          fields("practitionerId") = rid
          put("practitionerName", humanName(r))
          put("practitionerGender", str(r, "gender"))
          put("practitionerSpecialty", codeText(
            arr(r, "qualification").headOption.flatMap(obj(_, "code"))))
          put("practitionerAddress", addressStr(r))
          put("practitionerTelecom", telecomStr(r))
        case "Organization" =>
          fields("organizationId") = rid
          put("organizationName", str(r, "name"))
          put("organizationType", arr(r, "type").headOption.flatMap(t =>
            str(t, "text").orElse(arr(t, "coding").headOption.flatMap(str(_, "code")))))
          put("organizationAddress", addressStr(r))
          put("organizationTelecom", telecomStr(r))
        case _ => // unknown types: all-null structured row (reference fall-through)
      }

      val sRow = Row.fromSeq(DocSchema.schema.map(f => fields.get(f.name).orNull))

      // narrative chunks (reference chunk_text, 512 words, no overlap)
      val combined = pieces.mkString("\n").trim
      val uRows = if (combined.isEmpty) Seq.empty else {
        val words = combined.split("\\s+")
        words.grouped(ChunkSize).zipWithIndex.map { case (w, i) =>
          val u = Map[String, Any](
            "doc_id" -> s"$rtype-$rid-unstructured-$i",
            "doc_type" -> "unstructured",
            "resourceType" -> rtype,
            "file_path" -> filePath,
            "file_type" -> "json",
            "patientId" -> fields.get("patientId").orNull,
            "unstructuredText" -> w.mkString(" "),
            "user_id" -> userId)
          Row.fromSeq(DocSchema.schema.map(f => u.get(f.name).orNull))
        }.toSeq
      }
      sRow +: uRows
    }
  }

  /** Distributed parse: a Dataset of (path, bundleJson) -> doc table. */
  def parseBundles(bundles: Dataset[(String, String)],
      userId: String = "default"): DataFrame = {
    val spark = bundles.sparkSession
    val enc = Encoders.row(DocSchema.schema)
    bundles.flatMap { case (path, json) =>
      parseBundleRows(json, path, userId)
    }(enc)
  }

  /** Directory ingest of *.json bundles (S1): wholetext read so each
    * bundle stays one record, then the distributed parse.
    */
  def ingestDirectory(spark: SparkSession, dir: String,
      userId: String = "default"): DataFrame = {
    import spark.implicits._
    val files = spark.read.option("wholetext", "true").text(dir + "/*.json")
      .select(org.apache.spark.sql.functions.input_file_name().as("path"),
        org.apache.spark.sql.functions.col("value"))
      .as[(String, String)]
    parseBundles(files, userId)
  }
}
