package graft.pipeline

import graft.SparkSpec

class EmbeddingStatsSpec extends SparkSpec {

  test("v02 quantization: scales positive, magnitudes within int8 range") {
    val dims = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("max(size(embedding))").head().getInt(0)
    EmbeddingStats.v02QuantizeProfile(spark, sfDir).collect().foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      assert(r.getAs[Long]("min_scale_micro") > 0)
      assert(r.getAs[Long]("max_scale_micro") >= r.getAs[Long]("min_scale_micro"))
      // every |q_i| <= 127, so the per-label abs sum is bounded by
      // 127 * dim * n_vecs; and sum_q is within ±sum_abs_q
      val absSum = r.getAs[Long]("sum_abs_q")
      assert(absSum <= 127L * dims * n)
      assert(math.abs(r.getAs[Long]("sum_q")) <= absSum)
    }
  }
}
