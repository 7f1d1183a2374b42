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

  test("v03 dim stats: one row per dimension, consistent with a direct fold") {
    val rows = EmbeddingStats.v03DimStats(spark, sfDir).collect()
    val nVecs = graft.Tables.embeddings(spark, sfDir).count()
    val dims = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("max(size(embedding))").head().getInt(0)
    assert(rows.length == dims)
    assert(rows.map(_.getAs[Long]("dim")).toSeq == (0 until dims).map(_.toLong))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == nVecs)
      assert(r.getAs[Long]("min_micro") <= r.getAs[Long]("max_micro"))
      // |sum| <= abs mass, with equality only if the dim never changes sign
      assert(math.abs(r.getAs[Long]("sum_micro")) <=
        r.getAs[Long]("abs_mass_micro"))
      assert(r.getAs[Long]("n_zero") >= 0 && r.getAs[Long]("n_zero") <= nVecs)
    }
    // cross-check dimension 0 against a driver-side fold over the raw rows
    val xs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(embedding[0] AS DOUBLE) AS x").collect()
      .map(r => math.floor(r.getDouble(0) * 1000000L).toLong)
    val d0 = rows.find(_.getAs[Long]("dim") == 0L).get
    assert(d0.getAs[Long]("sum_micro") == xs.sum)
    assert(d0.getAs[Long]("min_micro") == xs.min)
    assert(d0.getAs[Long]("max_micro") == xs.max)
    assert(d0.getAs[Long]("abs_mass_micro") == xs.map(math.abs).sum)
  }

  test("v04 drift profile partitions v03's totals and signs the mean shift") {
    val drift = EmbeddingStats.v04DriftProfile(spark, sfDir).collect()
      .map(r => r.getAs[Long]("dim") -> r).toMap
    val dims = EmbeddingStats.v03DimStats(spark, sfDir).collect()
    assert(drift.size == dims.length)
    dims.foreach { v3 =>
      val r = drift(v3.getAs[Long]("dim"))
      // base + delta partitions every component exactly
      assert(r.getAs[Long]("n_base") + r.getAs[Long]("n_delta") ==
        v3.getAs[Long]("n"))
      assert(r.getAs[Long]("sum_base_micro") + r.getAs[Long]("sum_delta_micro")
        == v3.getAs[Long]("sum_micro"))
      // drift_num is the exact cross-multiplied mean difference
      assert(r.getAs[Long]("drift_num") ==
        r.getAs[Long]("sum_delta_micro") * r.getAs[Long]("n_base") -
          r.getAs[Long]("sum_base_micro") * r.getAs[Long]("n_delta"))
      // the split is the s09 base-90% cut, identical on every row
      assert(r.getAs[Long]("n_base") ==
        graft.Tables.embeddings(spark, sfDir).count() * 9 / 10)
    }
    // on an i.i.d. corpus drift must be small but NONZERO somewhere —
    // an all-zero profile would mean the delta side never aggregated
    assert(drift.values.exists(_.getAs[Long]("drift_num") != 0L))
  }
}
