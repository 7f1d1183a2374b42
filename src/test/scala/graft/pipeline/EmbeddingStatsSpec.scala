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

  test("v05 PC1 equals a driver-side reference iteration and is near-stationary") {
    val rows = EmbeddingStats.v05Pc1Profile(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("dim"))
    val got = rows.map(r => (r.getAs[Long]("dim"),
      r.getAs[Long]("pc1_micro"), r.getAs[Long]("lambda_micro")))
    // independent reference: same arithmetic (micro-mean centering,
    // 2^20-quantized accumulators, exact integer norms), plain Scala
    val x = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("cast(embedding as array<double>) v").collect()
      .map(_.getSeq[Double](0).toArray)
    val n = x.length
    val d = x.head.length
    val mu = (0 until d).map { j =>
      x.map(r => math.floor(r(j) * 1000000L).toLong).sum.toDouble /
        1000000.0 / n.toDouble
    }.toArray
    var vv = Array.fill(d)(1.0)
    var lambdaMicro = 0L
    for (_ <- 1 to 3) {
      val w = Array.fill(d)(0L)
      x.foreach { r =>
        val s = (0 until d).map(j => (r(j) - mu(j)) * vv(j)).reduce(_ + _)
        for (j <- 0 until d)
          // Spark's round(): BigDecimal HALF_UP (away from zero), NOT
          // math.round's half-toward-+inf — they differ on negative ties
          w(j) += java.math.BigDecimal.valueOf(s * (r(j) - mu(j)) * (1L << 20).toDouble)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      }
      val norm = math.sqrt(w.map(t => BigInt(t) * BigInt(t)).sum.toDouble)
      vv = w.map(_.toDouble / norm)
      lambdaMicro = math.floor(
        norm / (1L << 20).toDouble / n.toDouble * 1000000.0).toLong
    }
    val want = (0 until d).map(j =>
      (j.toLong, math.floor(vv(j) * 1000000.0).toLong, lambdaMicro))
    assert(got.toSeq == want, "distributed power iteration diverges from reference")
    // unit norm within quantization: sum of squared micro components
    val s2 = got.map(r => r._2.toDouble / 1e6).map(c => c * c).sum
    assert(math.abs(s2 - 1.0) < 1e-3, s"PC1 not unit norm: $s2")
    // near-stationarity: one more EXACT (unquantized) covariance apply
    // moves the Rayleigh quotient by < 1%, so 3 iterations suffice
    def applyCov(v: Array[Double]): Array[Double] = {
      val out = Array.fill(d)(0.0)
      x.foreach { r =>
        val s = (0 until d).map(j => (r(j) - mu(j)) * v(j)).sum
        for (j <- 0 until d) out(j) += s * (r(j) - mu(j))
      }
      out.map(_ / n)
    }
    val av = applyCov(vv)
    val rq1 = (0 until d).map(j => av(j) * vv(j)).sum
    val nv = { val nn = math.sqrt(av.map(c => c * c).sum); av.map(_ / nn) }
    val av2 = applyCov(nv)
    val rq2 = (0 until d).map(j => av2(j) * nv(j)).sum
    // power iteration is monotone in the Rayleigh quotient ...
    assert(rq2 >= rq1 - 1e-12, s"Rayleigh quotient decreased: $rq1 -> $rq2")
    // ... and on THIS corpus (isotropic by construction — near-equal
    // eigenvalues) a further iteration moves it only a few percent.
    // That slow drift is exactly the no-gap regime where the quotient
    // VALUE (what the collapse monitor reads) is insensitive to the
    // remaining direction error; a corpus with a real dominant
    // direction converges geometrically in the gap ratio instead.
    assert(math.abs(rq2 - rq1) / rq2 < 0.05,
      s"Rayleigh quotient still moving after 3 iterations: $rq1 -> $rq2")
  }

  test("v06 matches a driver-side exact-integer reference") {
    val out = EmbeddingStats.v06ClassSeparation(spark, sfDir).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("centroid_norm_micro"),
          r.getAs[Long]("intra_cos_sum_micro"),
          r.getAs[Long]("nearest_label"), r.getAs[Long]("nearest_cos_micro")))
      .toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("CAST(label AS BIGINT) label",
        "CAST(embedding AS ARRAY<DOUBLE>) v")
      .collect()
      .map(r => (r.getAs[Long]("label"), r.getSeq[Double](1).toArray))
    // the same micro-sum -> centroid -> sequential-fold math, in order
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((s, j) => s + a(j) * b(j))
    def nrm(a: Array[Double]): Double =
      math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x))
    val byLabel = vecs.groupBy(_._1)
    val cents = byLabel.map { case (l, vs) =>
      val d = vs.head._2.length
      val c = (0 until d).map { j =>
        vs.map(v => math.floor(v._2(j) * 1000000.0).toLong).sum
          .toDouble / 1000000.0 / vs.length
      }.toArray
      l -> (vs.length.toLong, c)
    }
    cents.foreach { case (l, (n, c)) =>
      val (gn, gnorm, gintra, gnl, gnc) = out(l)
      assert(gn == n, s"label $l n_vecs")
      assert(gnorm == math.floor(nrm(c) * 1000000.0).toLong,
        s"label $l centroid norm")
      val intra = byLabel(l).map { case (_, v) =>
        val nn = nrm(v) * nrm(c)
        math.floor((if (nn == 0.0) 0.0 else dot(v, c) / nn) * 1000000.0).toLong
      }.sum
      assert(gintra == intra, s"label $l intra sum: got $gintra want $intra")
      val (bl, bc) = cents.filter(_._1 != l).map { case (o, (_, oc)) =>
        val nn = nrm(c) * nrm(oc)
        (o, if (nn == 0.0) 0.0 else dot(c, oc) / nn)
      }.toSeq.sortBy { case (o, cos) => (-cos, o) }.head
      assert(gnl == bl && gnc == math.floor(bc * 1000000.0).toLong,
        s"label $l nearest: got ($gnl,$gnc) want ($bl,${math.floor(bc * 1e6).toLong})")
    }
  }
  test("v07 anisotropy matches an exact BigInt replay and sits in range") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding")
        .toSeq.map(x => math.floor(x.toDouble * 1000000.0).toLong))
    val n = vecs.length.toLong
    val d = vecs.head.size
    // trace identity, exact: n^2 * 1e12 * trace = SUM_j (n*SUM xm^2 - (SUM xm)^2)
    val trace = (0 until d).map { j =>
      val col = vecs.map(_(j))
      BigInt(n) * col.map(x => BigInt(x) * BigInt(x)).sum -
        { val s = col.map(BigInt(_)).sum; s * s }
    }.sum
    val lam = EmbeddingStats.v05Pc1Profile(spark, sfDir)
      .agg(min($"lambda_micro")).head().getLong(0)
    val rows = EmbeddingStats.v07AnisotropyProfile(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_vectors") == n)
    assert(r.getAs[Long]("n_dims") == d.toLong)
    assert(r.getAs[Long]("lambda_micro") == lam)
    val want = (BigInt(lam) * BigInt(n) * BigInt(n) *
      BigInt(1000000000000L) / trace).toLong
    assert(r.getAs[Long]("anisotropy_ppm") == want,
      s"ppm replay: got ${r.getAs[Long]("anisotropy_ppm")} want $want")
    assert(r.getAs[Long]("isotropic_ppm") == 1000000L / d)
    // a sane reading: strictly positive, below total collapse, and
    // the top direction carries at least the mean eigenvalue's mass
    // (lambda estimate notwithstanding, this corpus reads near-isotropic)
    val ppm = r.getAs[Long]("anisotropy_ppm")
    assert(ppm > 0L && ppm < 1000000L, s"ppm out of range: $ppm")
  }

  test("v08 TwoNN intrinsic dimension matches an exact replay off the ANN join") {
    // replay the estimator from the SAME two-NN feed the operator
    // consumes (the approximation is the feed's, not the math's)
    val nn = Similarity.corpusTwoNn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Double]("cosine")))
      .groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val qs = nn.values.toSeq
      .filter(m => m.size == 2 && m(1L) < 1.0)
      .map { m =>
        math.floor(1048576.0 *
          math.log((1.0 - m(2L)) / (1.0 - m(1L)))).toLong
      }
    val sum = qs.sum
    val r = EmbeddingStats.v08TwoNnId(spark, sfDir).collect() match {
      case Array(row) => row
      case rows => fail(s"v08 must be one row, got ${rows.length}")
    }
    assert(r.getAs[Long]("n_vectors") == qs.length.toLong)
    assert(r.getAs[Long]("sum_lnmu2_q") == sum)
    val want = (BigInt(qs.length) * 2 * 1048576L * 1048576L / sum).toLong
    assert(r.getAs[Long]("id_mle_micro") == want)
    // the estimator must use (nearly) the whole corpus and read a
    // plausible dimensionality: strictly positive and at most the
    // ambient 64 with modest slack (TwoNN can exceed ambient only by
    // sampling noise on degenerate data)
    val total = graft.Tables.embeddings(spark, sfDir).count()
    assert(qs.length >= (total * 9) / 10, s"only ${qs.length}/$total used")
    val id = want.toDouble / 1048576.0
    assert(id > 0.0 && id < 96.0, s"implausible intrinsic dimension $id")
  }
}
