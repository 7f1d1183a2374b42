package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query execution profile for the bench's attribution record —
  * WHERE a timed run's wall-clock went, not just whether its memos
  * were warm (round-18 verdict item 2: the d08 adjudication consumed
  * three rounds because the attrib record carried memo/eviction flags
  * but no execution profile; a stage-count + shuffle-bytes + GC read
  * on the driver box vs the quiet anchor would have localized the
  * spike in one round).
  *
  * One listener instance registers once per session and accumulates
  * stage-level totals; [[reset]] zeroes the counters before a timed
  * run and [[snapshot]] reads them after. Capture is OUTSIDE the
  * timed window (the timer stops before quiesce runs), so profiling
  * cost never pollutes the measurement it explains.
  *
  * Listener events are delivered async: [[quiesce]] polls until every
  * started job has ended AND the stage count has been stable across
  * two consecutive polls, capped — the public-API stand-in for the
  * private listener-bus flush. A capped timeout can only under-count
  * a profile (never corrupts timing), and the stability window makes
  * that practically unreachable on a local bench.
  */
private[graft] object BenchProfiler {
  /** One run's accumulated execution totals. Times in milliseconds,
    * shuffle volumes in bytes; `stages` counts COMPLETED stages
    * (skipped stages never run tasks and are deliberately absent —
    * the profile explains spent wall-clock, not plan shape).
    */
  final case class Profile(stages: Int, taskTimeMs: Long, gcMs: Long,
      shuffleReadB: Long, shuffleWriteB: Long)
}

private[graft] final class BenchProfiler extends SparkListener {

  private val lock = new Object
  private var jobsStarted = 0
  private var jobsEnded = 0
  private var stages = 0
  private var taskTimeMs = 0L
  private var gcMs = 0L
  private var shuffleReadB = 0L
  private var shuffleWriteB = 0L

  override def onJobStart(e: SparkListenerJobStart): Unit =
    lock.synchronized { jobsStarted += 1 }

  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    lock.synchronized { jobsEnded += 1 }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    lock.synchronized {
      stages += 1
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcMs += m.jvmGCTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
      }
    }

  def register(spark: SparkSession): Unit =
    spark.sparkContext.addSparkListener(this)

  def reset(): Unit = lock.synchronized {
    jobsStarted = 0; jobsEnded = 0; stages = 0
    taskTimeMs = 0L; gcMs = 0L; shuffleReadB = 0L; shuffleWriteB = 0L
  }

  /** Wait (bounded) for the async listener bus to drain this run's
    * events: all started jobs ended, stage count stable across two
    * consecutive polls. Runs AFTER the timer stops.
    */
  def quiesce(maxMs: Long = 2000): Unit = {
    val deadline = System.nanoTime() + maxMs * 1000000L
    var lastStages = -1
    var stable = false
    while (!stable && System.nanoTime() < deadline) {
      val (js, je, st) = lock.synchronized {
        (jobsStarted, jobsEnded, stages)
      }
      if (js == je && st == lastStages) stable = true
      else { lastStages = st; Thread.sleep(20) }
    }
  }

  def snapshot(): BenchProfiler.Profile = lock.synchronized {
    BenchProfiler.Profile(stages, taskTimeMs, gcMs, shuffleReadB, shuffleWriteB)
  }
}
