package graft

import scala.collection.concurrent.TrieMap

/** Atomic build-once memoization for session-lived ingest artifacts.
  *
  * `TrieMap.getOrElseUpdate` evaluates its thunk OUTSIDE the map's
  * internal CAS: two threads missing the same key both run the build,
  * and with builds that `persist()` a DataFrame the losing copy stays
  * pinned in executor storage until session end. Every artifact cache
  * (dedup signatures + pairs + cluster labels, corpus, BM25 stats, IVF
  * index, exact top-k) routes its miss path through here instead: the
  * fast path is a lock-free read, the
  * miss path double-checks under the cache's monitor so exactly one
  * build runs per key and nothing is ever built-and-dropped.
  *
  * Builds for different keys of one cache serialize — acceptable for
  * ingest artifacts (builds are rare, seconds-long, and almost always
  * for the same key anyway).
  */
object Memo {
  def getOrBuild[K, V](cache: TrieMap[K, V], key: K)(build: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None => cache.synchronized(cache.getOrElseUpdate(key, build))
    }
}
