package graft.relational

import graft.SparkSpec

class StarQueriesSpec extends SparkSpec {

  test("every registered query has an oracle and runs non-empty at sf0.001") {
    assert(StarQueries.oracles.keySet == StarQueries.queries.keySet)
    StarQueries.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("closed-form ntileBucket matches Spark's window ntile for many n and k") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the closed form has a branch boundary at rank == (base+1)*rem and
    // degenerate cases at n < k and n % k == 0 — sweep across all of them
    for (n <- Seq(1, 3, 9, 10, 11, 19, 20, 21, 99, 100, 101, 137);
         k <- Seq(3, 10)) {
      val df = (1L to n.toLong).toDF("rank")
      val w = org.apache.spark.sql.expressions.Window.orderBy($"rank")
      val mismatches = df
        .withColumn("expected", ntile(k).over(w))
        .withColumn("got", StarQueries.ntileBucket($"rank", n.toLong, k))
        .filter($"expected" =!= $"got")
        .count()
      assert(mismatches == 0, s"ntileBucket diverges from ntile($k) at n=$n")
    }
  }

  test("q01 aggregates are internally consistent") {
    val rows = StarQueries.q01PricingSummary(spark, sfDir).collect()
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val n = r.getAs[Long]("count_order")
      val avgQty = r.getAs[Double]("avg_qty")
      assert(math.abs(sumQty / n - avgQty) < 1e-3)
      // discounted price can never exceed base price
      assert(r.getAs[Double]("sum_disc_price") <= r.getAs[Double]("sum_base_price"))
    }
  }

  test("q02 top-parts is sorted by revenue desc and capped at 10") {
    val rows = StarQueries.q02TopParts(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted.reverse))
  }

  test("q07 emits at most 3 rows per customer, rn in 1..3") {
    val rows = StarQueries.q07TopOrdersPerCustomer(spark, sfDir).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.values.forall(_.length <= 3))
    assert(rows.forall { r => val rn = r.getAs[Int]("rn"); rn >= 1 && rn <= 3 })
  }

  test("q08 rollup contains the grand total row") {
    val rows = StarQueries.q08StatusRollup(spark, sfDir).collect()
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(total.length == 1)
    val n = total.head.getAs[Long]("n_orders")
    assert(n == graft.Tables.orders(spark, sfDir).count())
  }

  test("q16 cube contains rollup's rows plus the priority-only sets") {
    val cube = StarQueries.q16StatusCube(spark, sfDir).collect()
    val rollup = StarQueries.q08StatusRollup(spark, sfDir).collect()
    def key(r: org.apache.spark.sql.Row) = (Option(r.get(0)), Option(r.get(1)))
    val cubeKeys = cube.map(key).toSet
    assert(rollup.map(key).toSet.subsetOf(cubeKeys))
    // cube adds (null, priority) groupings that rollup lacks
    assert(cubeKeys.exists { case (s, p) => s.isEmpty && p.isDefined })
  }

  test("q17 as-of join: one latest-event row per order, ts <= anchor") {
    val rows = StarQueries.q17AsofJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Long]("o_orderkey"))
    assert(keys.distinct.length == keys.length, "collapse must keep one row per order")
  }

  test("q17 lookback horizon covers the dataset's anchor-to-event span") {
    // the horizon is applied to the Spark side AND the oracle in
    // lockstep, so the parity gate can't detect a too-narrow horizon
    // silently dropping old events — this asserts the data actually
    // fits: even the LATEST possible anchor minus the EARLIEST event
    // stays inside the lookback window
    import org.apache.spark.sql.functions._
    val minEvUs = graft.Tables.events(spark, sfDir)
      .agg(min(unix_micros(col("ts")))).head().getLong(0)
    // anchor = 2024-01-01 + (k%30) days + (k%24) hours; max at 29d23h
    val maxAnchorUs = 1704067200000000L + 29L * 86400000000L + 23L * 3600000000L
    val horizonUs = StarQueries.AsofLookbackDays.toLong * 86400000000L
    assert(maxAnchorUs - minEvUs <= horizonUs,
      s"event span ${(maxAnchorUs - minEvUs) / 86400000000L}d exceeds the " +
        s"${StarQueries.AsofLookbackDays}d as-of horizon: bounded and " +
        "unbounded q17 would diverge")
  }

  test("q18: approximate distinct counts track the exact profile") {
    import org.apache.spark.sql.functions._
    val exact = StarQueries.q18DistinctProfile(spark, sfDir).head()
    val approx = graft.Tables.orders(spark, sfDir)
      .agg(approx_count_distinct(col("o_custkey")).as("a")).head().getLong(0)
    val exactCusts = exact.getAs[Long]("n_active_custs")
    assert(math.abs(approx - exactCusts).toDouble / exactCusts < 0.05,
      s"HLL estimate $approx vs exact $exactCusts")
  }

  test("q19 range-join pairs are symmetric in volume with the gap bound") {
    val rows = StarQueries.q19EventRangeJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_pairs") > 0))
  }

  test("q28 RFM grid equals a driver-side quintile replay") {
    import spark.implicits._
    val users = graft.Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"ts").as("last_ts"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.sum(
          $"value".cast("decimal(18,2)")).as("monetary"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp](1),
        r.getAs[Long]("n_events"), r.getAs[java.math.BigDecimal]("monetary")))
    def ntile5(rank: Long, n: Long): Long = {
      val base = n / 5; val rem = n % 5; val cut = (base + 1) * rem
      if (base == 0) rank
      else if (rank <= cut) (rank - 1) / (base + 1) + 1
      else (rank - 1 - cut) / base + rem + 1
    }
    val n = users.length.toLong
    def buckets(key: ((Long, java.sql.Timestamp, Long, java.math.BigDecimal))
        => (Long, Long)): Map[Long, Long] =
      users.sortBy(key).zipWithIndex
        .map { case (u, i) => u._1 -> ntile5(i + 1L, n) }.toMap
    // desc metric + asc user_id ties, exactly the engine's orders;
    // timestamps compared at MICROsecond precision (getTime is only
    // millis — a micro-distinct pair would tie there and diverge)
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val rb = buckets(u => (-micros(u._2), u._1))
    val fb = buckets(u => (-u._3, u._1))
    val mb = buckets(u => (-u._4.unscaledValue().longValueExact(), u._1))
    val want: Map[(Long, Long, Long), (Long, Long, Double)] =
      users.groupBy(u => (rb(u._1), fb(u._1), mb(u._1)))
        .map { case (k, g) =>
          k -> ((g.length.toLong, g.map(_._3).sum,
            g.map(_._4.doubleValue()).sum)) }
    val got = StarQueries.q28RfmSegments(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("r_bucket").toLong,
        r.getAs[Int]("f_bucket").toLong, r.getAs[Int]("m_bucket").toLong) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("total_events"),
          r.getAs[Double]("total_value")))).toMap
    assert(got.keySet == want.keySet, "segment grid cells")
    want.foreach { case (k, (nu, te, tv)) =>
      val (gn, gt, gv) = got(k)
      assert(gn == nu && gt == te, s"cell $k counts")
      assert(math.abs(gv - tv) < 1e-6 * math.max(1.0, math.abs(tv)),
        s"cell $k total value: got $gv want $tv")
    }
    // each axis partitions users into 5 non-empty quintiles here
    assert(Set(rb.values.toSet.size, fb.values.toSet.size,
      mb.values.toSet.size) == Set(5), "degenerate quintiles")
  }

  test("q13 sessions never exceed event count") {
    val rows = StarQueries.q13Sessionize(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1L)
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
    }
  }

  test("session_window boundary: a gap of exactly the timeout merges") {
    // q20's DuckDB oracle breaks sessions only on STRICTLY greater gaps
    // because Spark's session_window chains an event at exactly
    // latest+gap into the same session (probed round 12); if a Spark
    // upgrade ever flips this to strict overlap, fail HERE with the
    // semantics named, not in the hash gate
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = 1704067200000000L
    val gapUs = 1800000000L
    def sessions(offsets: Long*): Seq[(Long, Long)] =
      offsets.zipWithIndex
        .map { case (off, i) => (i.toLong, base + off, 7L) }
        .toDF("event_id", "us", "user_id")
        .withColumn("ts", timestamp_micros($"us"))
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros($"sw.start"), $"n")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // chain: 0, +30min, +30min — one session despite spanning 60min
    assert(sessions(0L, gapUs, 2 * gapUs) == Seq((base, 3L)))
    // one microsecond past the gap: the chain breaks
    assert(sessions(0L, gapUs + 1L) ==
      Seq((base, 1L), (base + gapUs + 1L, 1L)))
  }

  test("q21 pivot cells reconcile with the unpivoted status totals") {
    import org.apache.spark.sql.functions._
    val piv = StarQueries.q21StatusPivot(spark, sfDir).collect()
    assert(piv.map(_.getAs[String]("o_orderpriority")).distinct.length ==
      piv.length, "one row per priority")
    val perStatus = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- Seq("F", "O", "P")) {
      val cellSum = piv.map { r =>
        val v = r.getAs[Any](s"${s}_orders")
        if (v == null) 0L else v.asInstanceOf[Long]
      }.sum
      assert(cellSum == perStatus.getOrElse(s, 0L),
        s"pivot column ${s}_orders must partition the status-$s count")
    }
  }

  test("q22 unpivot emits metrics x flags rows matching the wide values") {
    val rows = StarQueries.q22MetricsUnpivot(spark, sfDir).collect()
    val flags = rows.map(_.getAs[String]("l_returnflag")).distinct
    val metrics = rows.map(_.getAs[String]("metric")).distinct.sorted
    assert(metrics.toSeq == Seq("n_items", "n_orders", "qty_cents"))
    assert(rows.length == flags.length * metrics.length)
    // the melted n_items values must reconcile with the table size
    val nItems = rows.filter(_.getAs[String]("metric") == "n_items")
      .map(_.getAs[Long]("value")).sum
    assert(nItems == graft.Tables.lineitem(spark, sfDir).count())
  }

  test("q23 grouping sets: both margins partition the corpus, one total row") {
    val rows = StarQueries.q23GroupingSets(spark, sfDir).collect()
    val n = graft.Tables.orders(spark, sfDir).count()
    def marginSum(gs: Long, gp: Long) = rows
      .filter(r => r.getAs[Long]("g_status") == gs &&
        r.getAs[Long]("g_priority") == gp)
      .map(_.getAs[Long]("n_orders")).sum
    // status margin (g=(0,1)) and priority margin (g=(1,0)) each cover
    // every order exactly once; the grand-total set is one row with n
    assert(marginSum(0, 1) == n, "status margin must partition orders")
    assert(marginSum(1, 0) == n, "priority margin must partition orders")
    val total = rows.filter(r => r.getAs[Long]("g_status") == 1 &&
      r.getAs[Long]("g_priority") == 1)
    assert(total.length == 1 && total.head.getAs[Long]("n_orders") == n)
    // no (0,0) set was requested, so none may appear
    assert(!rows.exists(r => r.getAs[Long]("g_status") == 0 &&
      r.getAs[Long]("g_priority") == 0))
  }

  test("q24 full outer: union of key cells, all three branches, side parity") {
    import org.apache.spark.sql.functions._
    val rows = StarQueries.q24FullOuterReconcile(spark, sfDir).collect()
    def bandOf(v: Double): Int =
      math.floor(v / StarQueries.ReconcileBandWidth).toInt
    val cust = graft.Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_nationkey"), col("c_acctbal")).collect()
      .groupBy(r => (r.getInt(0), bandOf(r.getDouble(1))))
      .map { case (k, g) => k -> g.size.toLong }
    val supp = graft.Tables.supplier(spark, sfDir)
      .select(col("s_nationkey"), col("s_acctbal")).collect()
      .groupBy(r => (r.getInt(0), bandOf(r.getDouble(1))))
      .map { case (k, g) => k -> g.size.toLong }
    // key-cell set is exactly the union, ordered by (nation, band)
    assert(rows.map(r => (r.getAs[Int]("nationkey"), r.getAs[Int]("bal_band")))
      .toSeq == (cust.keySet ++ supp.keySet).toSeq.sorted)
    // per-cell counts match the independently computed sides (0 when absent)
    rows.foreach { r =>
      val k = (r.getAs[Int]("nationkey"), r.getAs[Int]("bal_band"))
      assert(r.getAs[Long]("n_cust") == cust.getOrElse(k, 0L))
      assert(r.getAs[Long]("n_supp") == supp.getOrElse(k, 0L))
    }
    // the band width must keep all three branches alive at the smoke SF —
    // a key where one side covers the other never exercises null extension
    assert(rows.exists(r => r.getAs[Long]("n_cust") > 0 &&
      r.getAs[Long]("n_supp") > 0), "matched branch degenerate")
    assert(rows.exists(_.getAs[Long]("n_supp") == 0),
      "customer-only branch degenerate")
    assert(rows.exists(_.getAs[Long]("n_cust") == 0),
      "supplier-only branch degenerate")
  }

  test("q25 funnel matches a brute-force per-user min-chain, stages 1-3 live") {
    import org.apache.spark.sql.functions.col
    val horizonUs = StarQueries.FunnelStepHours.toLong * 3600L * 1000000L
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), org.apache.spark.sql.functions
        .unix_micros(col("ts")).as("us"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[String]("event_type")))
    val byUser = events.groupBy(_._1)
    val expected = byUser.map { case (u, evs) =>
      def firstAfter(tpe: String, lo: Option[Long]): Option[Long] = lo.flatMap {
        t => evs.filter(e => e._3 == tpe && e._2 > t && e._2 <= t + horizonUs)
          .map(_._2).sorted.headOption
      }
      val tv = evs.filter(_._3 == "view").map(_._2).sorted.headOption
      val tc = firstAfter("click", tv)
      val tp = firstAfter("purchase", tc)
      u -> (tv, tc, tp)
    }
    val rows = StarQueries.q25Funnel(spark, sfDir).collect()
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val (tv, tc, tp) = expected(r.getAs[Long]("user_id"))
      def us(c: String): Option[Long] = Option(r.getAs[java.sql.Timestamp](c))
        .map(t => t.getTime * 1000L + (t.getNanos / 1000) % 1000)
      assert(us("t_view") == tv); assert(us("t_click") == tc)
      assert(us("t_purchase") == tp)
      val stage = Seq(tv, tc, tp).takeWhile(_.isDefined).length.toLong
      assert(r.getAs[Long]("stage") == stage)
    }
    // the calibrated horizon keeps every live stage populated
    val stages = rows.groupBy(_.getAs[Long]("stage")).view.mapValues(_.length)
    Seq(1L, 2L, 3L).foreach(s =>
      assert(stages.getOrElse(s, 0) > 0, s"stage $s empty"))
  }

  test("q26 retention: offset-0 full, cohorts partition users, activity bounded") {
    import org.apache.spark.sql.functions.col
    val rows = StarQueries.q26CohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("week_offset") >= 0,
        "no activity precedes a user's first week")
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort"))
      assert(r.getAs[Long]("n_active") >= 1, "empty cells must not be emitted")
    }
    // at offset 0 every cohort member is active by definition of cohort
    rows.filter(_.getAs[Long]("week_offset") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_cohort"),
        s"cohort ${r.getAs[String]("cohort_type")} not full at offset 0")
    }
    // cohort sizes partition the distinct-user population
    val cohortSizes = rows.groupBy(_.getAs[String]("cohort_type"))
      .view.mapValues(_.head.getAs[Long]("n_cohort"))
    val nUsers = graft.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(cohortSizes.values.sum == nUsers,
      "first-event cohorts must partition the user population")
    assert(cohortSizes.size > 1,
      "fixture degenerate: a single acquisition cohort proves no segmentation")
  }
}
