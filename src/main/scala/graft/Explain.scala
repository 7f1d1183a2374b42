package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: condensed physical-plan audit for registered queries.
  *
  * Usage: runMain graft.Explain [queryName ...]  (default: a headline set)
  * Prints scan/exchange/join/codegen lines so pushdown, broadcast
  * choices, and shuffle counts are reviewable at a glance.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_pricing_summary", "q03_shipping_priority", "q04_region_revenue",
      "r01_exact_match", "r02_semantic_knn", "p01_token_stats",
      "d03_minhash_lsh_pairs")
    names.foreach { name =>
      println(s"===== $name")
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      plan.linesIterator
        .filter(l => l.contains("Scan parquet") || l.contains("Exchange") ||
          l.contains("Join") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("WholeStageCodegen"))
        .foreach(l => println(l.trim.take(200)))
    }
    spark.stop()
  }
}
