package graft.rass.expressions

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("extension class installs cosine_sim into a SparkSessionExtensions") {
    // exercised against a fresh extensions object — building a whole new
    // SparkSession is not possible here (getOrCreate reuses the shared
    // test session, which would silently skip the extension hook)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; registration shape checked below
  }

  test("cosine_sim is callable from plain SQL once registered") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val ortho = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(ortho) < 1e-12)
    // type mismatch is rejected at analysis, not silently computed
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1, 2), 'nope')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim"))
  }

  test("phrase_count matches the replace-trick formula on adversarial inputs") {
    import org.apache.spark.sql.functions._
    import graft.rass.Analyzer
    PhraseCount.register(spark)
    // overlapping repeats, adjacent matches, punctuation, prefix cases
    val docs = Seq(
      "a b a b", "a a a", "aa a a", "b a b a b", "diabetes mellitus type 2",
      "Diabetes, mellitus! diabetes mellitus", "x", "", "a", "a b",
      "mell mellitus", "diabetes diabetes mellitus mellitus", null
    )
    val phrases = Seq(Seq("a", "b"), Seq("a", "a"), Seq("a"),
      Seq("diabetes", "mellitus"), Seq("mell"), Seq("zzz"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map(org.apache.spark.sql.Row(_))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
    for (p <- phrases) {
      val cmp = df.select(
        Analyzer.phraseCount(col("t"), p).as("old"),
        Analyzer.phraseCountTok(Analyzer.tokens(col("t")), p).as("nat"),
        Analyzer.phrasePrefixMatch(col("t"), p).as("oldp"),
        Analyzer.phrasePrefixMatchTok(Analyzer.tokens(col("t")), p).as("natp")
      ).collect()
      for (r <- cmp) {
        assert(r.getLong(0) == r.getLong(1), s"count mismatch for phrase $p: $r")
        assert(r.getBoolean(2) == r.getBoolean(3), s"prefix mismatch for phrase $p: $r")
      }
    }
    // greedy non-overlap pinned explicitly: [a,a,a] contains [a,a] once
    val g = spark.sql(
      "SELECT phrase_count(array('a','a','a'), array('a','a'), false) AS c")
      .head().getLong(0)
    assert(g == 1L)
  }

  test("dot_product is callable from plain SQL once registered") {
    DotProduct.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("term_freq counts exact and fuzzy matches like the lambda form") {
    TermFrequency.register(spark)
    def tf(arr: String, term: String, d: Int): Long =
      spark.sql(s"SELECT term_freq($arr, '$term', $d) AS c").head().getLong(0)
    assert(tf("array('a','b','a')", "a", 0) == 2L)
    assert(tf("array('diabetes','diabetez')", "diabetes", 0) == 1L)
    assert(tf("array('diabetes','diabetez')", "diabetes", 2) == 2L)
    assert(tf("array('', 'x')", "x", 0) == 1L)
    assert(tf("array(cast(null as string), 'x')", "x", 1) == 1L)
  }
}
