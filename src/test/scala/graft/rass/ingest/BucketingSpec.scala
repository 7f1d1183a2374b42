package graft.rass.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The 100 TB deployment story for patientId co-location, demonstrated
  * (SURVEY §1.3; reference `_routing = patientId`, `app/main.py:1230,
  * 1263`).
  *
  * The reference routes every document to a shard by patientId, so a
  * patient-keyed lookup or join touches ONE shard. Spark expresses the
  * same physical property two ways:
  *
  *   - [[IndexWriter.write]]'s range-partition + sort layout gives
  *     file/row-group pruning for patient-FILTERED scans with no
  *     metastore (IngestSpec asserts the disjoint-ranges property) —
  *     but plain parquet carries no bucket metadata, so a patientId
  *     equi-JOIN still shuffles both sides. That limitation is pinned
  *     here, deliberately.
  *   - With any catalog (in-memory here, Hive/Glue/Unity in a real
  *     deployment), `bucketBy(patientId).sortBy(patientId)` records the
  *     hash-bucket layout, and a join of two co-bucketed tables elides
  *     BOTH shuffles — the full `_routing` analogue. That is the
  *     deployment shape for the 100 TB document table; also pinned
  *     here, against the same data.
  */
class BucketingSpec extends SparkSpec {

  private def docsLike(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map { i =>
      (s"d$i", s"p${i % 37}", s"u${i % 3}", s"text body $i")
    }.toDF("doc_id", "patientId", "user_id", "unstructuredText")
  }

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(
      df.queryExecution.executedPlan.toString).size

  /** Both tests inspect join plans; size-based broadcast would bypass
    * the shuffle question entirely, so it is disabled around each.
    */
  private def withoutBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("plain parquet layout: a patientId equi-join still shuffles (the recorded limitation)") {
    import java.nio.file.Files
    val path = Files.createTempDirectory("bucketing").resolve("docs").toString
    IndexWriter.write(docsLike(200), path)
    val docs = IndexWriter.read(spark, path)
    // the layout DOES push patient filters into the scan...
    val filtered = docs.filter(col("patientId") === "p7")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("patientId"),
      s"patient filter must reach the parquet scan:\n$scan")
    withoutBroadcast {
      val visits = docsLike(200).select(col("patientId"), col("doc_id").as("visit_id"))
      val joined = docs.join(visits, Seq("patientId"))
      // ...but without bucket metadata the equi-join exchanges both
      // sides. This is the documented metastore-free gap vs the
      // reference's _routing; the bucketed-table test below is the
      // deployment fix.
      assert(exchanges(joined) >= 2,
        "expected both join sides to shuffle on the plain parquet layout")
    }
  }

  test("bucketed tables: a co-bucketed patientId equi-join elides both shuffles") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("bucketing_wh")
    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    spark.sql("DROP TABLE IF EXISTS visits_bucketed")
    docsLike(200).write
      .bucketBy(8, "patientId").sortBy("patientId")
      .option("path", wh.resolve("docs_bucketed").toString)
      .saveAsTable("docs_bucketed")
    docsLike(200).select(col("patientId"), col("doc_id").as("visit_id")).write
      .bucketBy(8, "patientId").sortBy("patientId")
      .option("path", wh.resolve("visits_bucketed").toString)
      .saveAsTable("visits_bucketed")
    try withoutBroadcast {
      val joined = spark.table("docs_bucketed")
        .join(spark.table("visits_bucketed"), Seq("patientId"))
      assert(exchanges(joined) == 0,
        "co-bucketed join must elide both exchanges:\n" +
          joined.queryExecution.executedPlan.toString)
      // and the answer matches the shuffled plan on the plain layout
      val expected = withoutBroadcast {
        docsLike(200).join(
          docsLike(200).select(col("patientId"), col("doc_id").as("visit_id")),
          Seq("patientId")).count()
      }
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS docs_bucketed")
      spark.sql("DROP TABLE IF EXISTS visits_bucketed")
    }
  }
}
