package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev timing harness (not part of any contract). */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val df = pipeline.Multimodal.m08ImagePhashPairs(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(s"M08SEC=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
