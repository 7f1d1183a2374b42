package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Embedding-quality profiling for vector pipelines: norm distribution
  * and degenerate-vector detection per label partition.
  *
  * Determinism note: a SUM over raw double norms would be
  * shuffle-order-dependent (float addition isn't associative), so norms
  * are floor-quantized to integer micro-units per row first — integer
  * sums then reproduce bit-for-bit across engines and cluster layouts.
  * The per-row norm itself is the usual sequential fold.
  */
object EmbeddingStats {

  /** v01 — per-label vector profile (exact ints). */
  def v01NormProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val normMicro = floor(
      sqrt(aggregate(transform($"embedding".cast("array<double>"), x => x * x),
        lit(0.0), (a, x) => a + x)) * 1000000L).cast("long")
    Tables.embeddings(spark, dir)
      .select($"label", $"vec_id", normMicro.as("norm_micro"),
        size($"embedding").cast("long").as("dim"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        countDistinct($"dim").as("n_dims"),
        min($"norm_micro").as("min_norm_micro"),
        max($"norm_micro").as("max_norm_micro"),
        sum($"norm_micro").as("sum_norm_micro"),
        sum(when($"norm_micro" === 0, 1L).otherwise(0L)).as("n_zero_vecs"))
      .orderBy($"label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v01_norm_profile" -> v01NormProfile _,
  )

  val oracles: Map[String, String] = Map(
    "v01_norm_profile" ->
      """SELECT label, COUNT(*) AS n_vecs,
        | COUNT(DISTINCT len(embedding)) AS n_dims,
        | MIN(norm_micro) AS min_norm_micro,
        | MAX(norm_micro) AS max_norm_micro,
        | CAST(SUM(norm_micro) AS BIGINT) AS sum_norm_micro,
        | CAST(SUM(CASE WHEN norm_micro = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_zero_vecs
        |FROM (SELECT label, embedding,
        |  CAST(floor(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |    list_transform(embedding::DOUBLE[], x -> x * x)),
        |    (s, x) -> s + x)) * 1000000) AS BIGINT) AS norm_micro
        |  FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin,
  )
}
