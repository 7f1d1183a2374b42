package graft.pipeline

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private def neighborSets(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap

  test("every similarity query has an oracle and runs non-empty") {
    assert(Similarity.oracles.keySet == Similarity.queries.keySet)
    Similarity.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("s01 returns exactly 10 ranked neighbors per query, scores descending") {
    val rows = Similarity.s01KnnBruteForce(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.values.foreach { g =>
      assert(g.length == 10)
      val sorted = g.sortBy(_.getAs[Long]("rank"))
      val cosines = sorted.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(sorted.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    }
  }

  test("s02 IVF achieves useful recall against exact KNN") {
    val exact = neighborSets(Similarity.s01KnnBruteForce(spark, sfDir))
    val approx = neighborSets(Similarity.s02IvfKnn(spark, sfDir))
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // nprobe=4 of 16 cells scans ~25% of the corpus; on isotropic random
    // vectors (worst case for IVF — no cluster structure) probing the
    // nearest cells still concentrates true neighbors well above the
    // scan fraction.
    assert(mean >= 0.3, f"mean IVF recall $mean%.2f below floor")
  }
}
