package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev timing harness (not part of any contract).
  * Current shape: the round-20 p16 interval-persist crossover A/B —
  * trains BPE at merges x persist-interval combinations on the 10x
  * replica corpus (built here if absent, documents table only; the
  * `_built` flag is left unset so a later full ScaleProbe run still
  * writes the other tables).
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = "/root/testdata/sf0.1"
    val out = "/tmp/graft_scale/x10"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$out/documents.parquet"))) {
      println(s"[devtime] building 10x documents replica at $out")
      val docs = Tables.documents(spark, base)
      val maxDoc = docs.agg(max($"doc_id")).head().getLong(0) + 1
      val ks = spark.range(10).toDF("k")
      docs.crossJoin(broadcast(ks))
        .select(
          ($"doc_id" + $"k" * maxDoc).as("doc_id"),
          when($"k" === 0, $"text").otherwise(
            array_join(transform(split(trim($"text"), "\\s+"),
              t => concat(t, lit("~"), $"k")), " ")).as("text"),
          $"lang", $"source")
        .withColumn("n_chars", length($"text"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }

    // combos override via args: pairs of merges:pe (dev reruns of a
    // contaminated cell without repeating the grid)
    val combos =
      if (args.nonEmpty) args.toSeq.map { a =>
        val Array(m, p) = a.split(":"); (m.toInt, p.toInt)
      }
      else Seq(
        (8, 0), (8, 32),
        (32, 0), (32, 8), (32, 16), (32, 32),
        (128, 8), (128, 16), (128, 32), (128, 0))
    for ((merges, pe) <- combos) {
      pipeline.TextAnalysis.invalidateCaches()
      System.gc()
      val t0 = System.nanoTime()
      val rules = pipeline.TextAnalysis.trainBpe(spark, out, merges, pe)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"P16AB merges=$merges%3d pe=$pe%3d sec=$dt%8.2f " +
        s"last=${rules.last}")
    }
    spark.stop()
  }
}
