package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding
  * FLOAT[64], label).
  *
  * Two operators: exact brute-force top-k (the correctness baseline;
  * embarrassingly parallel — query vectors broadcast, one scan of the
  * corpus) and an IVF-partitioned approximate variant (the 100 TB path:
  * corpus clustered into cells, queries probe only the nearest cells, so
  * the scan shrinks by nprobe/ncells).
  *
  * All cosine math is a sequential left-fold in double precision,
  * mirrored exactly by the oracle SQL — IEEE-754 determinism then makes
  * scores, and therefore ranks, bit-identical across engines.
  *
  * Reference: RASS semantic search is knn over an HNSW index
  * (`app/main.py:1527-1560`, index mapping `main.py:563-572`); exact KNN
  * here is deterministic and strictly more correct, and IVF replaces
  * HNSW as the scale story (HNSW graphs don't shard naturally; IVF
  * cells map 1:1 onto Spark partitions).
  */
object Similarity {

  private val NumQueries = 10
  private val TopK = 10
  private val NumCentroids = 16
  private val NProbe = 4

  /** (vec_id, v: array<double>, nrm) with exact float->double widening. */
  private def vectors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm",
        sqrt(aggregate(transform($"v", x => x * x), lit(0.0), (a, x) => a + x)))
  }

  /** Fused codegen cosine (graft.rass.expressions.CosineSimilarity) —
    * bit-identical to the sequential-fold/precomputed-norm formulation
    * (same per-accumulator operation order), ~10-30x faster. The norm
    * arguments are retained for call-site clarity but the expression
    * recomputes them inline from the same folds.
    */
  private def cosineCol(spark: SparkSession, av: Column, an: Column,
      bv: Column, bn: Column): Column = {
    graft.rass.expressions.CosineSimilarity.register(spark)
    call_function("cosine_sim", av, bv)
  }

  /** s01 — exact KNN: top-10 cosine neighbors for the first 10 vectors.
    * Queries are a broadcast literal set; the corpus is scanned once and
    * only (query, candidate, score) triples — never vectors — shuffle
    * into the per-query top-k window.
    */
  def s01KnnBruteForce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, dir)
    val q = e.filter($"vec_id" < NumQueries)
    val scored = e.as("c")
      .join(broadcast(q.as("q")), $"q.vec_id" =!= $"c.vec_id")
      .select($"q.vec_id".as("query_id"), $"c.vec_id".as("neighbor_id"),
        cosineCol(spark, $"q.v", $"q.nrm", $"c.v", $"c.nrm").as("cosine"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .orderBy($"query_id", $"rank")
  }

  /** s02 — IVF approximate KNN: corpus assigned to the nearest of 16
    * deterministic centroids (the first 16 vectors); each query probes
    * its 4 nearest cells and ranks only those candidates. Centroids are
    * broadcast both times, so assignment and probing are map-side; the
    * candidate join co-partitions on the cell id.
    */
  def s02IvfKnn(spark: SparkSession, dir: String): DataFrame =
    ivfKnn(spark, dir, Some(NumQueries), TopK)

  /** s03 — KNN self-join: top-3 IVF neighbors for EVERY vector (the
    * batch "knn join" a similarity-dedup or retrieval-index build runs
    * corpus-wide). Same machinery as s02 with the query side unfiltered;
    * candidate volume stays (nprobe/ncells) x n^2 instead of n^2.
    */
  def s03KnnJoin(spark: SparkSession, dir: String): DataFrame =
    ivfKnn(spark, dir, None, 3)

  private def ivfKnn(spark: SparkSession, dir: String,
      queryLimit: Option[Int], k: Int): DataFrame = {
    import spark.implicits._
    val e = vectors(spark, dir)
    val cents = e.filter($"vec_id" < NumCentroids)
      .select($"vec_id".as("cid"), $"v".as("cv"), $"nrm".as("cnrm"))
    val wAssign = Window.partitionBy($"vec_id")
      .orderBy($"ccos".desc, $"cid")
    val assign = e.as("x").join(broadcast(cents))
      .select($"x.vec_id", $"cid",
        cosineCol(spark, $"x.v", $"x.nrm", $"cv", $"cnrm").as("ccos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter($"rn" === 1)
      .select($"vec_id", $"cid".as("cell"))
    val q = queryLimit.map(n => e.filter($"vec_id" < n)).getOrElse(e)
    val probes = q.as("q").join(broadcast(cents))
      .select($"q.vec_id".as("query_id"), $"cid",
        cosineCol(spark, $"q.v", $"q.nrm", $"cv", $"cnrm").as("ccos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"query_id").orderBy($"ccos".desc, $"cid")))
      .filter($"rn" <= NProbe)
      .select($"query_id", $"cid".as("cell"))
    val cand = probes.join(assign, "cell")
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"))
    val scored = cand
      .join(q.as("qq").select($"qq.vec_id".as("query_id"),
        $"qq.v".as("qv"), $"qq.nrm".as("qnrm")), "query_id")
      .join(e.as("cc").select($"cc.vec_id".as("neighbor_id"),
        $"cc.v".as("nv"), $"cc.nrm".as("nnrm")), "neighbor_id")
      .select($"query_id", $"neighbor_id",
        cosineCol(spark, $"qv", $"qnrm", $"nv", $"nnrm").as("cosine"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id"))
        .cast("long"))
      .filter($"rank" <= k)
      .orderBy($"query_id", $"rank")
  }

  // ---------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_knn_bruteforce" -> s01KnnBruteForce _,
    "s02_ivf_knn" -> s02IvfKnn _,
    "s03_knn_join" -> s03KnnJoin _,
  )

  /** cos(a, b) as oracle SQL, given (v, nrm) column prefixes. */
  private def cosSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
      s"list_zip($a.v, $b.v), p -> p[1] * p[2])), (s, x) -> s + x)" +
      s" / ($a.nrm * $b.nrm)"

  private val VecCte =
    """n AS (SELECT vec_id, embedding::DOUBLE[] v,
      |  sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |    list_transform(embedding::DOUBLE[], x -> x * x)),
      |    (s, x) -> s + x)) AS nrm
      |  FROM embeddings)""".stripMargin

  val oracles: Map[String, String] = Map(
    "s01_knn_bruteforce" ->
      s"""WITH $VecCte,
         |q AS (SELECT * FROM n WHERE vec_id < $NumQueries),
         |scored AS (SELECT q.vec_id query_id, c.vec_id neighbor_id,
         |    ${cosSql("q", "c")} AS cosine
         |  FROM q JOIN n c ON c.vec_id != q.vec_id)
         |SELECT query_id, neighbor_id, cosine, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
         |WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,
    "s02_ivf_knn" -> ivfSql(s"WHERE vec_id < $NumQueries", TopK),
    "s03_knn_join" -> ivfSql("", 3),
  )

  private def ivfSql(queryWhere: String, k: Int): String =
    s"""WITH $VecCte,
       |cents AS (SELECT vec_id cid, v, nrm FROM n WHERE vec_id < $NumCentroids),
       |assign AS (SELECT vec_id, cell FROM (
       |  SELECT x.vec_id, c.cid AS cell, row_number() OVER (
       |    PARTITION BY x.vec_id ORDER BY ${cosSql("x", "c")} DESC, c.cid) rn
       |  FROM n x CROSS JOIN cents c) WHERE rn = 1),
       |q AS (SELECT * FROM n $queryWhere),
       |probes AS (SELECT query_id, cell FROM (
       |  SELECT q.vec_id query_id, c.cid AS cell, row_number() OVER (
       |    PARTITION BY q.vec_id ORDER BY ${cosSql("q", "c")} DESC, c.cid) rn
       |  FROM q CROSS JOIN cents c) WHERE rn <= $NProbe),
       |cand AS (SELECT p.query_id, a.vec_id neighbor_id
       |  FROM probes p JOIN assign a ON a.cell = p.cell
       |  WHERE a.vec_id != p.query_id),
       |scored AS (SELECT d.query_id, d.neighbor_id,
       |    ${cosSql("q", "c")} AS cosine
       |  FROM cand d JOIN q ON q.vec_id = d.query_id
       |              JOIN n c ON c.vec_id = d.neighbor_id)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS rank FROM scored)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
}
