package graft.rass.ingest

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.rass.{CorpusStats, DeterministicEmbedder, DocSchema}

/** Crash-recovery coverage for the shared stage-and-swap commit: each
  * test crafts the exact on-disk state a kill would leave and asserts
  * the next commit restores the invariant "stats tables == from-scratch
  * build over the document table".
  */
class IngestCommitSpec extends SparkSpec {

  private val emb = new DeterministicEmbedder(8)

  private lazy val bundleJson: String = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/fixtures/bundle.json"))
    try src.mkString finally src.close()
  }

  private def parsed(json: String, path: String): DataFrame = {
    import spark.implicits._
    FhirBundleParser.parseBundles(Seq((path, json)).toDS(), "u1")
  }

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)
  private def hp(p: String) = new org.apache.hadoop.fs.Path(p)

  private def statsMatchRebuild(tab: String): Unit = {
    val (wantF, wantT) =
      CorpusStats.build(spark.read.parquet(tab), DocSchema.scoredFields)
    def fm(df: DataFrame) = df.collect()
      .map(x => x.getAs[String]("field") ->
        ((x.getAs[Long]("n_docs"), x.getAs[Long]("sum_dl")))).toMap
    def tm(df: DataFrame) = df.collect()
      .map(x => (x.getAs[String]("field"), x.getAs[String]("term")) ->
        x.getAs[Long]("df")).toMap
    assert(fm(spark.read.parquet(IngestCommit.statsFieldsPath(tab))) == fm(wantF))
    assert(tm(spark.read.parquet(IngestCommit.statsTermsPath(tab))) == tm(wantT))
  }

  test("kill between swap renames (_old left) is restored on next commit") {
    val t = java.nio.file.Files.createTempDirectory("crashA")
    val tab = t.resolve("tab").toString
    IngestCommit.commit(spark, tab, parsed(bundleJson, "/f/b.json"), emb)
    val n1 = spark.read.parquet(tab).count()

    // simulate: target renamed away, replacement rename never happened
    fs.rename(hp(tab), hp(tab + "_old"))
    assert(!fs.exists(hp(tab)))

    IngestCommit.commit(spark, tab,
      parsed(bundleJson.replace("thirst", "hunger"), "/f/b.json"), emb)
    assert(spark.read.parquet(tab).count() == n1, "restored then upserted")
    statsMatchRebuild(tab)
  }

  test("kill after doc promote but before stats promote is finished") {
    val t = java.nio.file.Files.createTempDirectory("crashB")
    val tab = t.resolve("tab").toString
    IngestCommit.commit(spark, tab, parsed(bundleJson, "/f/b.json"), emb)

    // craft the batch-2 crash point by hand: doc table already swapped
    // to the new upsert (its staging consumed), stats stagings fully
    // written (_SUCCESS present) but NOT yet promoted — the stats
    // tables on disk still describe batch 1
    val batch2 = parsed(bundleJson.replace("thirst", "hunger"), "/f/b.json")
    val merged2 = IndexWriter.upsert(
      Some(spark.read.parquet(tab)), IndexWriter.withEmbeddings(batch2, emb))
      .persist()
    val (f2, t2) = CorpusStats.build(merged2, DocSchema.scoredFields)
    f2.write.parquet(IngestCommit.statsFieldsPath(tab) + "_staging")
    t2.write.parquet(IngestCommit.statsTermsPath(tab) + "_staging")
    merged2.write.parquet(tab + "_staging2")
    merged2.unpersist()
    fs.delete(hp(tab), true)
    fs.rename(hp(tab + "_staging2"), hp(tab))

    // the stats on disk are now STALE relative to the doc table; the
    // next commit must first promote the staged batch-2 stats, then
    // merge batch 3 against them — landing exactly on a full rebuild
    // (merging against the stale batch-1 stats instead would not)
    IngestCommit.commit(spark, tab,
      parsed(bundleJson.replace("cough", "fever"), "/f/b.json"), emb)
    statsMatchRebuild(tab)
  }

  test("incomplete staging (no _SUCCESS) is discarded, commit proceeds") {
    val t = java.nio.file.Files.createTempDirectory("crashC")
    val tab = t.resolve("tab").toString
    IngestCommit.commit(spark, tab, parsed(bundleJson, "/f/b.json"), emb)

    // a torn doc-table staging from a mid-write kill
    val staging = java.nio.file.Paths.get(tab + "_staging")
    java.nio.file.Files.createDirectories(staging)
    java.nio.file.Files.writeString(staging.resolve("part-junk"), "torn write")

    IngestCommit.commit(spark, tab,
      parsed(bundleJson.replace("thirst", "hunger"), "/f/b.json"), emb)
    assert(!fs.exists(hp(tab + "_staging")))
    statsMatchRebuild(tab)
  }
}
