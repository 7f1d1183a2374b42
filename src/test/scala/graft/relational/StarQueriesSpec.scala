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

  test("q13 sessions never exceed event count") {
    val rows = StarQueries.q13Sessionize(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1L)
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
    }
  }
}
