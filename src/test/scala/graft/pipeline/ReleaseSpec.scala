package graft.pipeline

import graft.SparkSpec

class ReleaseSpec extends SparkSpec {

  /** Drop every session memo the release path can hold, so the next
    * build must go through the DISK artifacts' findValid path — the
    * cross-session cold-start the orchestrator exists for.
    */
  private def dropSessionMemos(): Unit = {
    Dedup.invalidateCaches()
    Similarity.invalidateCaches()
    TextAnalysis.invalidateCaches()
    Export.invalidateCaches()
  }

  test("Release.build: a second, memo-cold invocation performs ZERO rebuilds") {
    // first build: validates (or materializes, on a fresh artifact
    // root) every artifact in the DAG
    val m1 = Release.build(spark, sfDir)
    assert(m1.provenance.collect().nonEmpty)
    // the second run emulates a NEW session over an unchanged corpus:
    // memos dropped, so every artifact must be served by findValid
    dropSessionMemos()
    val before = ArtifactStore.publishEvents
    val m2 = Release.build(spark, sfDir)
    assert(m2.datasheet.collect().nonEmpty)
    assert(m2.checksums.collect().nonEmpty)
    assert(m2.provenance.collect().nonEmpty)
    val after = ArtifactStore.publishEvents
    assert(after == before,
      s"a warm release republished artifacts: ${
        after.collect { case (p, n) if before.getOrElse(p, 0L) != n => p }}")
  }

  test("a bumped s14 constant rebuilds EXACTLY the s14 -> s21 cone, nothing else") {
    // baseline: everything fresh and published
    Release.build(spark, sfDir).provenance.collect()
    // emulate editing SemClusterArtifactVersion (or SemDedupTau): salt
    // s14's fingerprint — the expected fingerprint changes exactly as
    // a compile-time constant bump would change it
    DurableArtifact.salts("s14_clusters") = "bump"
    dropSessionMemos()
    try {
      val before = ArtifactStore.publishEvents
      val m = Release.build(spark, sfDir)
      assert(m.provenance.collect().nonEmpty)
      val after = ArtifactStore.publishEvents
      val rebuilt = after.collect {
        case (p, n) if before.getOrElse(p, 0L) != n => p
      }.toSet
      // the cone: the salted s14 label table AND the s21 drop list
      // whose fingerprint CHAINS s14's — and absolutely nothing else
      // (d06, p09, s15 stay served from their valid stores)
      assert(rebuilt == Set(
        Similarity.semClusterArtifactPath(sfDir),
        Similarity.semDropArtifactPath(sfDir)),
        s"rebuild cone was $rebuilt")
    } finally {
      // un-bump and restore the unsalted stores for later suites
      DurableArtifact.salts.remove("s14_clusters")
      dropSessionMemos()
      Release.build(spark, sfDir).provenance.collect()
    }
  }
}
