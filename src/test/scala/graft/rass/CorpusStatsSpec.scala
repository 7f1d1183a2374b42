package graft.rass

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {

  test("materialized stats reconstruct Bm25.allStats bit-for-bit") {
    val corpus = Corpus.corpus(spark, sfDir).cache()
    val fields = DocSchema.noteFields.map(_._1) ++ Seq("unstructuredText", "patientName")
    val terms = Seq("note", "severity", "zzz_absent_term")
    val (fieldStats, termStats) = CorpusStats.build(corpus, fields.distinct)
    val fromTable = CorpusStats.statsRow(spark, fieldStats, termStats,
      fields.distinct, terms).head()
    val direct = Bm25.allStats(corpus, fields.distinct, terms).head()
    assert(fromTable.schema.fieldNames.sameElements(direct.schema.fieldNames))
    fromTable.schema.fieldNames.foreach { c =>
      val a = fromTable.getAs[Any](c)
      val b = direct.getAs[Any](c)
      assert(a == b, s"$c: table=$a direct=$b")
    }
  }

  test("stats merge additively across ingest batches") {
    import org.apache.spark.sql.functions._
    val corpus = Corpus.corpus(spark, sfDir)
    val half1 = corpus.filter(crc32(col("doc_id")) % 2 === 0)
    val half2 = corpus.filter(crc32(col("doc_id")) % 2 === 1)
    val fields = Seq("unstructuredText", "conditionCodeText")
    val (f1, t1) = CorpusStats.build(half1, fields)
    val (f2, t2) = CorpusStats.build(half2, fields)
    val (fAll, tAll) = CorpusStats.build(corpus, fields)
    val mergedField = f1.unionByName(f2).groupBy("field")
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val allField = fAll.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(mergedField == allField)
    val mergedTerm = t1.unionByName(t2).groupBy("field", "term")
      .agg(sum("df").as("df"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val allTerm = tAll.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mergedTerm == allTerm)
  }

  test("signed incremental merge equals a full rebuild, replacement included") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val corpus = Corpus.corpus(spark, sfDir).cache()
    val fields = DocSchema.scoredFields
    val hot = crc32(col("doc_id")) % 5 === 0   // re-ingested with new text
    val dead = crc32(col("doc_id")) % 7 === 3  // deleted outright
    val replacedOld = corpus.filter(hot && !dead)
    val replacedNew = replacedOld.withColumn("unstructuredText",
      concat_ws(" ", col("unstructuredText"), lit("revised")))
    val removed = corpus.filter(dead).unionByName(replacedOld)
    val finalCorpus = corpus.filter(!hot && !dead).unionByName(replacedNew)
    val (mf, mt) = CorpusStats.merge(
      CorpusStats.build(corpus, fields), replacedNew, removed, fields)
    val (ff, ft) = CorpusStats.build(finalCorpus, fields)
    def fmap(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def tmap(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(fmap(mf) == fmap(ff))
    assert(tmap(mt) == tmap(ft))
  }

  test("merge equals rebuild across random corpus partitions (seeded)") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val corpus = Corpus.corpus(spark, sfDir).cache()
    val fields = Seq("unstructuredText", "conditionCodeText", "observationNote")
    def fmap(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def tmap(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (seed <- 1 to 3) {
      // random tri-partition: ~60% untouched, ~20% replaced, ~20% deleted
      val bucket = pmod(crc32(concat(col("doc_id"), lit(seed.toString))), lit(10))
      val replacedOld = corpus.filter(bucket.isin(6, 7))
      val replacedNew = replacedOld.withColumn("unstructuredText",
        concat_ws(" ", col("unstructuredText"), lit(s"rev$seed")))
      val removed = corpus.filter(bucket >= 6)
      val finalCorpus = corpus.filter(bucket <= 5).unionByName(replacedNew)
      val (mf, mt) = CorpusStats.merge(
        CorpusStats.build(corpus, fields), replacedNew, removed, fields)
      val (ff, ft) = CorpusStats.build(finalCorpus, fields)
      assert(fmap(mf) == fmap(ff), s"field stats diverged at seed $seed")
      assert(tmap(mt) == tmap(ft), s"term stats diverged at seed $seed")
    }
  }
}
