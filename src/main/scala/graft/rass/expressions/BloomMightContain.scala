package graft.rass.expressions

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, XxHash64}

/** Registration shim for Spark's own codegen bloom-membership
  * expression ([[BloomFilterMightContain]] — the predicate behind
  * Spark's injected runtime filters, reachable in SQL only through
  * the optimizer), so the p09/p10 decontamination sweep's inner loop
  * stays inside whole-stage codegen instead of a boxed Scala UDF
  * (VERDICT r15 item 7).
  *
  * Contract: the first argument is the SERIALIZED sketch
  * (`org.apache.spark.util.sketch.BloomFilter.writeTo` bytes — the
  * same `BloomFilterImpl` wire format `BloomFilterAggregate`
  * produces) as a constant binary; the second is the raw value
  * column. The expression probes `mightContainLong(xxhash64(value))`,
  * so the sketch MUST have been built over `xxhash64(value)` longs
  * (seed 42, the SQL function's default — [[XxHash64]]'s default seed
  * here matches), not over the raw strings.
  */
object BloomMightContain {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      { exprs: Seq[Expression] =>
        BloomFilterMightContain(exprs.head, XxHash64(Seq(exprs(1)), 42L)) },
      "scala_udf")
}
