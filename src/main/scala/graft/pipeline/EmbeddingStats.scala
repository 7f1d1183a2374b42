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

  /** v02 — int8 quantization profile: per vector, symmetric max-abs
    * scaling to [-127, 127] (`q_i = floor(x_i * 127 / maxabs)`), the
    * compression step that shrinks a 100 TB float32 embedding store 4x
    * before ANN serving. Outputs are pure integers (quantized sums and
    * the micro-quantized scale), so the profile hash-matches across
    * engines; the division is the same IEEE double op on both sides.
    * Aggregated per label to keep the result a small profile table.
    */
  def v02QuantizeProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = $"embedding".cast("array<double>")
    val maxabs = aggregate(transform(v, x => abs(x)), lit(0.0),
      (a, x) => greatest(a, x))
    val qsum = aggregate(transform(v, x =>
      floor(x * 127.0 / $"maxabs").cast("long")), lit(0L), (a, x) => a + x)
    val qabssum = aggregate(transform(v, x =>
      abs(floor(x * 127.0 / $"maxabs").cast("long"))), lit(0L), (a, x) => a + x)
    Tables.embeddings(spark, dir)
      .select($"label", $"vec_id", v.as("embedding"), maxabs.as("maxabs"))
      .filter($"maxabs" > 0) // all-zero vectors carry no quantizable signal
      .select($"label",
        floor($"maxabs" * 1000000L).cast("long").as("scale_micro"),
        qsum.as("q_sum"), qabssum.as("q_abs_sum"))
      .groupBy($"label")
      .agg(count(lit(1)).as("n_vecs"),
        min($"scale_micro").as("min_scale_micro"),
        max($"scale_micro").as("max_scale_micro"),
        sum($"q_sum").as("sum_q"),
        sum($"q_abs_sum").as("sum_abs_q"))
      .orderBy($"label")
  }

  /** v03 — per-DIMENSION embedding QA profile: for each of the 64 vector
    * dimensions, the component count, micro-quantized sum / min / max /
    * absolute mass, and the zero-component count. This is the dead-dim /
    * collapsed-dim check an embedding pipeline runs before committing a
    * 100 TB vector store: a dimension whose absolute mass is ~0 carries
    * no signal (wasted storage + ANN distance noise), and one whose
    * min==max indicates a constant (bugged) projection.
    *
    * Scale shape: `posexplode` widens each row 64x, but the very next
    * operator is a hash aggregation whose key domain is the 64 dim
    * indices — partial (map-side) aggregation collapses every partition
    * to <=64 rows before the shuffle, so the exchange carries
    * |partitions| x 64 summary rows, never the widened data. Components
    * are floor-quantized to integer micro-units per row first (the
    * [[v01NormProfile]] determinism pattern): integer sums reproduce
    * bit-for-bit across engines and cluster layouts, where a double SUM
    * would be shuffle-order-dependent.
    */
  def v03DimStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select(posexplode($"embedding".cast("array<double>")).as(Seq("dim", "x")))
      .select($"dim".cast("long").as("dim"),
        floor($"x" * 1000000L).cast("long").as("x_micro"))
      .groupBy($"dim")
      .agg(count(lit(1)).as("n"),
        sum($"x_micro").as("sum_micro"),
        min($"x_micro").as("min_micro"),
        max($"x_micro").as("max_micro"),
        sum(abs($"x_micro")).as("abs_mass_micro"),
        sum(when($"x_micro" === 0L, 1L).otherwise(0L)).as("n_zero"))
      .orderBy($"dim")
  }

  /** v04 — embedding drift profile: per dimension, the micro-quantized
    * component sums and counts of the BASE population (first ~90% of
    * vec_ids — s09's frozen-index split) against the DELTA (the newest
    * ~10% an ingest batch appended), plus the cross-multiplied mean
    * difference `drift_num = sum_delta*n_base - sum_base*n_delta`
    * (integer, sign = direction of the per-dim mean shift; the exact
    * numerator of mean_delta - mean_base over the common denominator
    * n_base*n_delta). This is the drift monitor that tells a deployment
    * WHEN s09's frozen-centroid index-add has diverged enough to justify
    * the k~sqrt(n) retrain — s09 shows WHERE delta mass lands, v04 shows
    * whether the underlying distribution moved.
    *
    * Same scale shape as [[v03DimStats]]: posexplode then a 64-key hash
    * aggregation with map-side collapse; all outputs integer-exact
    * (drift_num stays within Long while sum_micro * n < 2^63, i.e. to
    * ~10^9 vectors of unit-norm 64-dim floats; beyond that widen the
    * product to DECIMAL(38,0) — the [[graft.relational.StarQueries]]
    * sumExact recombine pattern).
    */
  def v04DriftProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBase = Tables.embeddings(spark, dir).count() * 9 / 10
    Tables.embeddings(spark, dir)
      .select($"vec_id", posexplode($"embedding".cast("array<double>"))
        .as(Seq("dim", "x")))
      .select(($"vec_id" < nBase).as("is_base"), $"dim".cast("long").as("dim"),
        floor($"x" * 1000000L).cast("long").as("xm"))
      .groupBy($"dim")
      .agg(
        sum(when($"is_base", 1L).otherwise(0L)).as("n_base"),
        sum(when($"is_base", $"xm").otherwise(0L)).as("sum_base_micro"),
        sum(when(!$"is_base", 1L).otherwise(0L)).as("n_delta"),
        sum(when(!$"is_base", $"xm").otherwise(0L)).as("sum_delta_micro"))
      .withColumn("drift_num",
        $"sum_delta_micro" * $"n_base" - $"sum_base_micro" * $"n_delta")
      .orderBy($"dim")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v01_norm_profile" -> v01NormProfile _,
    "v02_quantize_profile" -> v02QuantizeProfile _,
    "v03_dim_stats" -> v03DimStats _,
    "v04_drift_profile" -> v04DriftProfile _,
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
    "v02_quantize_profile" ->
      """SELECT label, COUNT(*) AS n_vecs,
        | MIN(scale_micro) AS min_scale_micro,
        | MAX(scale_micro) AS max_scale_micro,
        | CAST(SUM(q_sum) AS BIGINT) AS sum_q,
        | CAST(SUM(q_abs_sum) AS BIGINT) AS sum_abs_q
        |FROM (SELECT label,
        |  CAST(floor(maxabs * 1000000) AS BIGINT) AS scale_micro,
        |  CAST(list_sum(list_transform(v, x ->
        |    CAST(floor(x * 127 / maxabs) AS BIGINT))) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(v, x ->
        |    abs(CAST(floor(x * 127 / maxabs) AS BIGINT)))) AS BIGINT) AS q_abs_sum
        | FROM (SELECT label, embedding::DOUBLE[] v,
        |   list_reduce(list_prepend(0.0::DOUBLE,
        |     list_transform(embedding::DOUBLE[], x -> abs(x))),
        |     (a, x) -> greatest(a, x)) AS maxabs
        |  FROM embeddings)
        | WHERE maxabs > 0)
        |GROUP BY label ORDER BY label""".stripMargin,
    "v03_dim_stats" ->
      """SELECT dim, COUNT(*) AS n,
        | CAST(SUM(x_micro) AS BIGINT) AS sum_micro,
        | MIN(x_micro) AS min_micro, MAX(x_micro) AS max_micro,
        | CAST(SUM(ABS(x_micro)) AS BIGINT) AS abs_mass_micro,
        | CAST(SUM(CASE WHEN x_micro = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |FROM (SELECT CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
        |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
        |    AS x_micro
        | FROM embeddings)
        |GROUP BY dim ORDER BY dim""".stripMargin,
    "v04_drift_profile" ->
      """WITH cut AS (SELECT COUNT(*) * 9 // 10 AS nb FROM embeddings),
        |x AS (SELECT vec_id < (SELECT nb FROM cut) AS is_base,
        |  CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
        |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
        |    AS xm
        | FROM embeddings)
        |SELECT dim,
        | CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
        | CAST(SUM(CASE WHEN is_base THEN xm ELSE 0 END) AS BIGINT)
        |   AS sum_base_micro,
        | CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS n_delta,
        | CAST(SUM(CASE WHEN is_base THEN 0 ELSE xm END) AS BIGINT)
        |   AS sum_delta_micro,
        | CAST(SUM(CASE WHEN is_base THEN 0 ELSE xm END)
        |    * SUM(CASE WHEN is_base THEN 1 ELSE 0 END)
        |  - SUM(CASE WHEN is_base THEN xm ELSE 0 END)
        |    * SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS drift_num
        |FROM x GROUP BY dim ORDER BY dim""".stripMargin,
  )
}
