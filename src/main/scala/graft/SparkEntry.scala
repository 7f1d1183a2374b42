package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator to a DataFrame pipeline over
  * the driver's parquet tables; `oracleSql` carries the DuckDB-equivalent
  * SQL for the hash-match correctness gate. Registries live next to their
  * implementations and are merged here.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The hybrid search exercises the engine end-to-end: corpus derivation,
    * BM25 stats broadcast, fuzzy multi-field scoring, fused-codegen KNN,
    * and top-k.
    */
  def entry(spark: SparkSession): DataFrame =
    rass.RassQueries.queries("r03_hybrid")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.StarQueries.queries ++
      pipeline.TextAnalysis.queries ++
      pipeline.Dedup.queries ++
      pipeline.Similarity.queries ++
      pipeline.Multimodal.queries ++
      pipeline.EmbeddingStats.queries ++
      pipeline.Export.queries ++
      rass.RassQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    relational.StarQueries.oracles ++
      pipeline.TextAnalysis.oracles ++
      pipeline.Dedup.oracles ++
      pipeline.Similarity.oracles ++
      pipeline.Multimodal.oracles ++
      pipeline.EmbeddingStats.oracles ++
      pipeline.Export.oracles ++
      rass.RassQueries.oracles
}
