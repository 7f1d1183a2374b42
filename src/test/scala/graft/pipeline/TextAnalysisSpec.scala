package graft.pipeline

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("every text-analysis query has an oracle and runs non-empty") {
    assert(TextAnalysis.oracles.keySet == TextAnalysis.queries.keySet)
    TextAnalysis.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("p01 token stats are internally consistent") {
    val rows = TextAnalysis.p01TokenStats(spark, sfDir).collect()
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nUniq = r.getAs[Long]("n_uniq_tokens")
      val nSub = r.getAs[Long]("n_subtokens")
      assert(nUniq <= nTok)
      assert(nSub >= nTok, "subword count can never be below word count")
      assert(r.getAs[Long]("max_token_len") <= r.getAs[Long]("n_chars"))
    }
  }

  test("p02 buckets partition the corpus") {
    val total = graft.Tables.documents(spark, sfDir).count()
    val rows = TextAnalysis.p02QualityBuckets(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach(r => assert(r.getAs[Long]("sum_stop") <= r.getAs[Long]("sum_tokens")))
  }

  test("p03 lang profile covers all docs, chars bounded by min/max") {
    val total = graft.Tables.documents(spark, sfDir).count()
    val rows = TextAnalysis.p03LangProfile(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("sum_chars") >= n * r.getAs[Long]("min_chars"))
      assert(r.getAs[Long]("sum_chars") <= n * r.getAs[Long]("max_chars"))
    }
  }

  test("p04 predictions are valid labels and the matrix covers all docs") {
    val total = graft.Tables.documents(spark, sfDir).count()
    val rows = TextAnalysis.p04LangIdConfusion(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val valid = Set("en", "es", "de", "fr", "zh", "unknown")
    assert(rows.forall(r => valid(r.getAs[String]("pred_lang"))))
  }

  test("p05 fingerprints: group sizes sum to corpus size, keep_id minimal") {
    val total = graft.Tables.documents(spark, sfDir).count()
    val rows = TextAnalysis.p05Fingerprint(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(rows.map(_.getAs[String]("fingerprint")).distinct.length == rows.length)
  }

  test("p07 split covers every doc, skews ~90/5/5, and is deterministic") {
    val total = graft.Tables.documents(spark, sfDir).count()
    def profile() = TextAnalysis.p07SplitProfile(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("split")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens")))).toMap
    val p = profile()
    assert(p.values.map(_._1).sum == total)
    val bySplit = p.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2._1).sum).toMap
    // hash split: train share must dominate (loose bound for a small corpus)
    assert(bySplit("train") * 10 >= total * 8)
    assert(bySplit.getOrElse("val", 0L) + bySplit.getOrElse("test", 0L) < total / 4)
    // same assignment on a second run — the split is a pure hash of doc_id
    assert(profile() == p)
  }
}
