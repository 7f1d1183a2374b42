package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import org.scalatest.funsuite.AnyFunSuite

/** Memo.getOrBuild must run EXACTLY ONE build per key under
  * contention — the raw `TrieMap.getOrElseUpdate` it replaces evaluates
  * its thunk outside the map's CAS, so two racing threads both build
  * (and, for persisted DataFrames, the loser's copy stays pinned in
  * executor storage).
  */
class MemoSpec extends AnyFunSuite {

  test("cold-cache race: one build, all threads see the same value") {
    val threads = 8
    val cache = TrieMap.empty[String, Int]
    val builds = new AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(threads)
    try {
      val futures = (1 to threads).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          override def call(): Int = {
            gate.await()
            Memo.getOrBuild(cache, "k") {
              // widen the race window so an unsynchronized miss path
              // would reliably double-build
              Thread.sleep(50)
              builds.incrementAndGet()
            }
          }
        })
      }
      gate.countDown()
      val values = futures.map(_.get(30, TimeUnit.SECONDS)).toSet
      assert(builds.get() === 1, "exactly one build must run per key")
      assert(values === Set(1), "every thread must observe the single built value")
    } finally pool.shutdownNow()
  }

  test("warm cache is a lock-free read (no build, no monitor)") {
    val cache = TrieMap.empty[String, Int]
    val builds = new AtomicInteger(0)
    Memo.getOrBuild(cache, "k")(builds.incrementAndGet())
    // hold the cache's monitor: a warm read must not need it
    cache.synchronized {
      assert(Memo.getOrBuild(cache, "k")(builds.incrementAndGet()) === 1)
    }
    assert(builds.get() === 1)
  }

  test("different keys both build") {
    val cache = TrieMap.empty[String, Int]
    assert(Memo.getOrBuild(cache, "a")(1) === 1)
    assert(Memo.getOrBuild(cache, "b")(2) === 2)
    assert(cache.size === 2)
  }
}
