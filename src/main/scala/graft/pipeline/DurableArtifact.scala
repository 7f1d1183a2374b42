package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the durable fingerprint-guarded cluster
  * artifacts — ONE implementation of the read-through-memo /
  * staged-publish / rebuild-and-swap sequence the three dup families
  * each carried a verbatim copy of (d06 text, m06 media, s14
  * semantic; unified after the round-16 review caught the copies
  * already diverging — one family's cache had missed the harness
  * release wiring).
  *
  * Contract (the d06 rules, now in one place):
  *   - [[read]] is the CONSUMER path: session memo → on-disk parquet
  *     (fingerprint-checked, `_old` crash probe) → rebuild+publish as
  *     the last resort. At 100 TB a drop-list consumer must never
  *     re-propagate, and must not depend on an in-memory cache
  *     surviving either.
  *   - [[rebuildAndPublish]] is the OWNING QUERY's path: the
  *     propagation loop is what that query benchmarks, so it always
  *     rebuilds, atomically republishes (ArtifactStore's staged swap
  *     under the per-path monitor), and swaps the session memo,
  *     unpersisting the retired table.
  *   - The fingerprint is captured BEFORE the build reads any source
  *     data (the ArtifactStore write-side TOCTOU rule), and must hash
  *     every parameter the clustering semantics depend on plus the
  *     source listing(s).
  */
private[pipeline] final class DurableArtifact(
    suffix: String,
    fingerprint: (SparkSession, String) => String,
    build: (SparkSession, String) => DataFrame) {

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  def path(dir: String): String =
    s"${ArtifactStore.artifactRoot}/${ArtifactStore.md5Hex(dir)}_$suffix"

  /** The artifact's CURRENT expected fingerprint: the declared function
    * plus any test salt ([[DurableArtifact.salts]]). Exposed so a
    * DOWNSTREAM artifact whose content derives from this one can CHAIN
    * it into its own fingerprint (the m10-chains-d11 staleness rule —
    * a version/threshold bump upstream must invalidate the whole
    * derived cone, not just the artifact whose constant moved).
    */
  def currentFingerprint(spark: SparkSession, dir: String): String = {
    val base = fingerprint(spark, dir)
    DurableArtifact.salts.get(suffix)
      .map(s => ArtifactStore.md5Hex(s"$base|salt=$s"))
      .getOrElse(base)
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    graft.Memo.getOrBuild(cache, (spark, dir)) {
      val fp = currentFingerprint(spark, dir)
      ArtifactStore.findValid(spark, path(dir), fp)
        .flatMap(p => ArtifactStore.consistentParquet(spark, p))
        .map(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        .getOrElse {
          val fresh = build(spark, dir)
          write(spark, dir, fp, fresh)
          // serve the JUST-PUBLISHED store, not the raw build plan: a
          // build that does not persist its result would otherwise
          // re-execute the whole DAG on every consumer action AND
          // re-read sources that may no longer match the stamped
          // pre-build fingerprint (the TOCTOU window the pre-build
          // capture exists to close). The publish above already paid
          // the materialization; the parquet is the truth. Fallback to
          // the fresh frame only if a concurrent republish races the
          // re-read (then its own memo swap supersedes this handle).
          ArtifactStore.consistentParquet(spark, path(dir))
            .map(_.persist(
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
            .getOrElse(fresh)
        }
    }

  def rebuildAndPublish(spark: SparkSession, dir: String): DataFrame = {
    val fp = currentFingerprint(spark, dir) // pre-build capture (TOCTOU rule)
    val fresh = build(spark, dir)
    write(spark, dir, fp, fresh)
    // memoize the JUST-PUBLISHED parquet handle, not the raw build
    // plan — the same rule read()'s cold path applies: an unpersisted
    // build plan re-executes the whole DAG on every later consumer
    // action AND re-reads sources that may no longer match the stamped
    // pre-build fingerprint (the TOCTOU window). Fallback to the fresh
    // frame only if a concurrent republish races the re-read (its own
    // memo swap then supersedes this handle).
    val served = ArtifactStore.consistentParquet(spark, path(dir))
      .map(_.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      .getOrElse(fresh)
    cache.synchronized {
      cache.put((spark, dir), served).foreach(_.unpersist())
    }
    served
  }

  private def write(spark: SparkSession, dir: String, fp: String,
      labels: DataFrame): Unit =
    ArtifactStore.publish(spark, path(dir), fp) { staging =>
      labels.write.mode("overwrite").parquet(staging)
    }

  def invalidate(): Unit =
    cache.keys.foreach(k => cache.remove(k).foreach(_.unpersist()))

  /** Whether the SESSION memo holds this artifact (bench telemetry:
    * distinguishes a consumer run that read the hot handle from one
    * that went to disk or rebuilt — the attribution a cross-round
    * timing comparison needs).
    */
  def isWarm: Boolean = cache.nonEmpty
}

private[pipeline] object DurableArtifact {

  /** TEST hook — a per-suffix fingerprint salt that emulates a
    * compile-time version/threshold bump on ONE artifact, so the
    * Release orchestrator's cone spec can prove "bump upstream →
    * exactly the downstream cone rebuilds" without recompiling.
    * EMPTY in production: no library code writes here; a set salt
    * changes the artifact's expected fingerprint exactly as editing
    * its version constant would.
    */
  private[graft] val salts =
    scala.collection.concurrent.TrieMap.empty[String, String]
}
