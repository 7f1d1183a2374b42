package graft

/** Mirrors the driver's t1 smoke: entry() must return rows at sf0.001. */
class EntrySpec extends SparkSpec {
  test("flagship entry returns rows on the smoke dataset") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry invariants: oracle keys are a subset of query keys, no collisions") {
    val q = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(q.keySet))
    // map-merge collisions would silently drop operators
    val expectedSize = relational.StarQueries.queries.size +
      pipeline.TextAnalysis.queries.size + pipeline.Dedup.queries.size +
      pipeline.Similarity.queries.size + pipeline.Multimodal.queries.size +
      pipeline.EmbeddingStats.queries.size +
      pipeline.Export.queries.size +
      rass.RassQueries.queries.size
    assert(q.size == expectedSize, "registry key collision")
  }
}
