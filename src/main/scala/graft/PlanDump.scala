package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.FileSourceScanExec

/** Dev tool: print each named query's data-shuffle count and pruned
  * scan schemas — the numbers PlanAuditSpec pins as budgets. Not part
  * of the driver contract.
  *
  *   sbt "runMain graft.PlanDump d09_threshold_curve p18_fingerprint_overlap"
  *
  * With no args, dumps every registered query (slow: plans everything).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.sparkPlan
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }.size
      val scans = plan.collect { case s: FileSourceScanExec =>
        val table = s.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("?")
        s"$table[${s.requiredSchema.fieldNames.mkString(",")}]"
      }
      println(s"PLAN $name shuffles=$shuffles scans=${scans.mkString(" ")}")
    }
    spark.stop()
  }
}
