package graft

class BenchProfilerSpec extends SparkSpec {

  test("profiler reads a two-stage shuffle job: stages, task time, shuffle bytes") {
    val prof = new BenchProfiler
    prof.register(spark)
    prof.reset()
    // a deliberate two-stage job: scan+partial agg, exchange, final agg
    spark.range(0, 200000, 1, 4)
      .selectExpr("id % 97 AS k", "id")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("id"))
      .write.mode("overwrite").format("noop").save()
    prof.quiesce()
    val p = prof.snapshot()
    assert(p.stages >= 2, s"expected a shuffle's two stages, saw ${p.stages}")
    assert(p.taskTimeMs > 0, "no task time accumulated")
    assert(p.shuffleWriteB > 0, "the partial-agg stage wrote no shuffle bytes")
    assert(p.shuffleReadB > 0, "the final-agg stage read no shuffle bytes")
    // reset zeroes everything — the per-run isolation Bench relies on
    prof.reset()
    val z = prof.snapshot()
    assert(z.stages == 0 && z.taskTimeMs == 0L &&
      z.shuffleReadB == 0L && z.shuffleWriteB == 0L && z.gcMs == 0L)
  }

  test("profiler isolates consecutive runs: a no-shuffle job reads zero shuffle") {
    val prof = new BenchProfiler
    prof.register(spark)
    // first, a shuffle job (pollution source)...
    prof.reset()
    spark.range(0, 10000, 1, 4).selectExpr("id % 7 AS k", "id")
      .groupBy("k").count()
      .write.mode("overwrite").format("noop").save()
    prof.quiesce()
    assert(prof.snapshot().shuffleWriteB > 0)
    // ...then a reset + map-only job: its profile must not inherit
    prof.reset()
    spark.range(0, 10000, 1, 4).selectExpr("id * 2 AS x")
      .write.mode("overwrite").format("noop").save()
    prof.quiesce()
    val p = prof.snapshot()
    assert(p.stages >= 1)
    assert(p.shuffleWriteB == 0L && p.shuffleReadB == 0L,
      s"map-only job inherited shuffle bytes: ${p.shuffleReadB}/${p.shuffleWriteB}")
  }
}
