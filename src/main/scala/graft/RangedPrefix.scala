package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global order-based running totals WITHOUT a global window.
  *
  * `Window.orderBy(...)` with an empty partitionBy funnels every row
  * through ONE task — a single-executor sort at 100 TB — so global
  * ranks (q14's deciles) and global running sums (x03's packed-block
  * layout) are computed scale-safely instead:
  *
  *   1. range-partition by the sort key and stamp `spark_partition_id`
  *      (partition ascends with the key, so pid order IS key order);
  *   2. aggregate the per-partition totals and prefix-sum them on the
  *      driver — one row per partition crosses, never one per data row
  *      (the same sanctioned collect shape as a stats-row broadcast);
  *   3. broadcast the per-partition base offsets back and add them to
  *      a WITHIN-partition window accumulation.
  *
  * The ranged projection is memoized AND persisted per (session, key):
  * the persist is what makes the two jobs that read it — the totals
  * aggregate and the final projection — see the SAME range boundaries
  * (RangePartitioner re-samples per execution, so an unpersisted
  * exchange could assign rows differently between the jobs; which
  * boundaries it picks is irrelevant to correctness, but both jobs
  * must agree). Released by [[invalidateCaches]].
  */
object RangedPrefix {

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** Release every memoized ranged projection. */
  def invalidateCaches(): Unit =
    cache.keys.foreach(k => cache.remove(k).foreach(_.unpersist()))

  /** `base` extended with `cumCol` = the running sum of `value` in the
    * global `orderCols` order, INCLUSIVE of the current row (so a
    * global 1-based rank is `value = lit(1L)`, and an exclusive prefix
    * is `cumCol - value`). Also returns the grand total. `orderCols`
    * must be a total order (include a tie-break column) or the
    * within-partition accumulation is nondeterministic across ties.
    */
  def runningSum(spark: SparkSession, cacheKey: String, base: => DataFrame,
      orderCols: Seq[Column], value: Column, cumCol: String): (DataFrame, Long) = {
    import spark.implicits._
    val parted = Memo.getOrBuild(cache, (spark, cacheKey)) {
      base.repartitionByRange(orderCols: _*)
        .withColumn("pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val parts = parted.groupBy($"pid").agg(sum(value).cast("long").as("t"))
      .collect().map(r => (r.getAs[Int]("pid"), r.getAs[Long]("t")))
      .sortBy(_._1)
    var acc = 0L
    val offsets = parts.map { case (pid, t) =>
      val row = (pid, acc); acc += t; row
    }.toSeq
    val w = Window.partitionBy($"pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = parted
      .join(broadcast(offsets.toDF("pid", "offset")), Seq("pid"))
      .withColumn(cumCol, $"offset" + sum(value).over(w))
      .drop("offset", "pid")
    (out, acc)
  }
}
