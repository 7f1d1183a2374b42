package graft.rass.ingest

import java.nio.file.Files

import graft.SparkSpec
import graft.rass.{CorpusStats, DeterministicEmbedder, DocSchema}

class UploadSpec extends SparkSpec {

  private lazy val bundleJson: String = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fixtures/bundle.json"))
    try src.mkString finally src.close()
  }

  test("user id validation matches the reference pattern") {
    assert(Upload.validateUserId("user-1"))
    assert(Upload.validateUserId("a" * 36))
    assert(Upload.validateUserId("123e4567-e89b-12d3-a456-426614174000"))
    assert(!Upload.validateUserId("a" * 37))
    assert(!Upload.validateUserId("bad user!"))
    assert(!Upload.validateUserId(""))
  }

  test("request-level validation returns the reference error strings") {
    val t = Files.createTempDirectory("upl")
    val (up, tab) = (t.resolve("uploads").toString, t.resolve("tab").toString)
    assert(Upload.ingestFiles(spark, "bad user!", Seq("x.txt"), up, tab) ==
      Left("Invalid user ID format"))
    assert(Upload.ingestFiles(spark, "u1", Seq.empty, up, tab) ==
      Left("No files uploaded"))
    val six = (1 to 6).map(i => t.resolve(s"f$i.txt").toString)
    assert(Upload.ingestFiles(spark, "u1", six, up, tab) ==
      Left("Too many files uploaded (max 5)"))
    // an oversize-only request processes nothing
    val big = t.resolve("big.txt")
    Files.writeString(big, "x" * 100)
    assert(Upload.ingestFiles(spark, "u1", Seq(big.toString), up, tab,
      maxFileSize = 10L) == Left("No valid files were processed"))
  }

  test("upload ingests FHIR + text, skips invalid files, maintains stats") {
    val t = Files.createTempDirectory("upl2")
    val (up, tab) = (t.resolve("uploads").toString, t.resolve("tab").toString)
    val b = t.resolve("bundle.json"); Files.writeString(b, bundleJson)
    val note = t.resolve("patient_7_note.txt")
    Files.writeString(note, "Patient reports stable vitals and mild cough.")
    val xml = t.resolve("report.xml"); Files.writeString(xml, "<r/>")
    val badJson = t.resolve("broken.json"); Files.writeString(badJson, "{oops")
    val noEntry = t.resolve("plain.json"); Files.writeString(noEntry, "{\"a\":1}")

    val res = Upload.ingestFiles(spark, "u1",
      Seq(b, note, xml, badJson, noEntry).map(_.toString), up, tab,
      new DeterministicEmbedder(8))
    val r = res.toOption.get
    assert(r.processedFiles == 2, "bundle + note accepted; 3 files skipped")

    val docs = spark.read.parquet(tab)
    assert(docs.count() == r.docsIndexed && r.docsIndexed > 0)
    // both sources landed, and the text chunk carries the filename patient id
    assert(docs.filter(org.apache.spark.sql.functions.col("resourceType") === "Patient" &&
      org.apache.spark.sql.functions.col("doc_type") === "structured").count() == 1)
    val chunk = docs.filter(org.apache.spark.sql.functions.col("file_type") === "text").collect()
    assert(chunk.length == 1 && chunk.head.getAs[String]("patientId") == "7")
    // staged copies live under the user folder and are fetchable
    assert(chunk.head.getAs[String]("file_path").startsWith(up))
    assert(Files.exists(java.nio.file.Paths.get(chunk.head.getAs[String]("file_path"))))

    // stats tables were committed and equal a from-scratch build
    def statsMatch(): Unit = {
      val (wantF, wantT) = CorpusStats.build(spark.read.parquet(tab), DocSchema.scoredFields)
      def fm(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(x => x.getAs[String]("field") ->
          ((x.getAs[Long]("n_docs"), x.getAs[Long]("sum_dl")))).toMap
      def tm(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(x => (x.getAs[String]("field"), x.getAs[String]("term")) ->
          x.getAs[Long]("df")).toMap
      assert(fm(spark.read.parquet(IngestCommit.statsFieldsPath(tab))) == fm(wantF))
      assert(tm(spark.read.parquet(IngestCommit.statsTermsPath(tab))) == tm(wantT))
    }
    statsMatch()

    // S14 probes
    assert(IndexWriter.indexExists(spark, tab))
    assert(IndexWriter.hasAnyData(spark, tab))
    assert(!IndexWriter.indexExists(spark, t.resolve("nope").toString))

    // re-uploading the same files is idempotent: content-digest staging
    // names keep doc_ids stable, the upsert replaces rather than adds
    val res2 = Upload.ingestFiles(spark, "u1", Seq(b, note).map(_.toString),
      up, tab, new DeterministicEmbedder(8))
    assert(res2.toOption.get.processedFiles == 2)
    assert(spark.read.parquet(tab).count() == r.docsIndexed)
    statsMatch()
  }

  test("two bundles exporting the same resources count each doc once") {
    val t = Files.createTempDirectory("upl4")
    val (up, tab) = (t.resolve("uploads").toString, t.resolve("tab").toString)
    val b1 = t.resolve("exportA.json"); Files.writeString(b1, bundleJson)
    val b2 = t.resolve("exportB.json"); Files.writeString(b2, bundleJson)
    val r = Upload.ingestFiles(spark, "u1", Seq(b1, b2).map(_.toString),
      up, tab, new DeterministicEmbedder(8)).toOption.get
    assert(r.processedFiles == 2)
    // same resource ids in both files -> the upsert collapses them, and
    // docsIndexed reports the collapsed count
    assert(r.docsIndexed == spark.read.parquet(tab).count())
    assert(spark.read.parquet(tab).select("doc_id").distinct().count() == r.docsIndexed)
  }

  test("streaming auto-ingest and upload compose on one table") {
    import graft.rass.{CorpusStats, DocSchema}
    import graft.streaming.AutoIngest
    val t = Files.createTempDirectory("upl5")
    val (up, tab) = (t.resolve("uploads").toString, t.resolve("tab").toString)
    val watch = Files.createDirectory(t.resolve("watch"))
    // surface 1: the stream delivers a bundle
    Files.writeString(watch.resolve("b1.json"), bundleJson)
    AutoIngest.start(spark, watch.toString, tab,
      t.resolve("ckpt").toString, "u1",
      new DeterministicEmbedder(8)).awaitTermination()
    val n1 = spark.read.parquet(tab).count()
    // surface 2: the API uploads a text note into the SAME table
    val note = t.resolve("patient_9_followup.txt")
    Files.writeString(note, "Follow-up visit went well.")
    val r = Upload.ingestFiles(spark, "u1", Seq(note.toString), up, tab,
      new DeterministicEmbedder(8)).toOption.get
    assert(spark.read.parquet(tab).count() == n1 + r.docsIndexed)
    // the shared commit kept the incremental stats exact across surfaces
    val (wantF, _) = CorpusStats.build(
      spark.read.parquet(tab), DocSchema.scoredFields)
    val gotF = spark.read.parquet(IngestCommit.statsFieldsPath(tab))
    def fm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => x.getAs[String]("field") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("sum_dl")))).toMap
    assert(fm(gotF) == fm(wantF))
  }

  test("uploaded docs flow through ask(): DOCUMENT_FETCH reads them back") {
    import graft.rass.RassEngine
    import graft.rass.query.{Intent, RuleNer}
    val t = Files.createTempDirectory("upl3")
    val (up, tab) = (t.resolve("uploads").toString, t.resolve("tab").toString)
    val b = t.resolve("ehr.json"); Files.writeString(b, bundleJson)
    assert(Upload.ingestFiles(spark, "u1", Seq(b.toString), up, tab,
      new DeterministicEmbedder(8)).isRight)

    val engine = new RassEngine(spark.read.parquet(tab),
      new DeterministicEmbedder(8),
      ner = new RuleNer(persons = Seq("alice m johnson")),
      nowMicros = () => 1748736000000000L)
    val ans = engine.ask(
      "Fetch the medical records for Alice M Johnson", "u1", "c1")
    assert(ans.intent == Intent.DocumentFetch)
    // the staged upload copy is the file_path on record, so the fetch
    // re-reads the actual uploaded bundle from disk
    assert(ans.answer.contains("\"queried_name\": \"alice m johnson\""))
    assert(ans.answer.contains("\"file_type\": \"json\""))
    assert(ans.answer.contains("long-standing diabetic"))
  }
}
