package graft.rass.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `term_freq(tokens, term, maxDist)` — how many tokens match the term,
  * exactly (maxDist=0) or within Levenshtein distance maxDist
  * (`fuzziness: AUTO` support). Native codegen replacement for
  * `size(filter(tokens, t -> ...))`, whose lambda is interpreted per
  * token per term — the dominant cost in multi-field BM25 scans, where
  * it runs |fields| x |terms| times per row.
  *
  * Exact-count semantics identical to the higher-order form (null
  * tokens skipped, "" can never match a non-empty term), so oracle
  * parity is untouched.
  */
case class TermFrequency(tokens: Expression, term: Expression, maxDist: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = term
  override def third: Expression = maxDist

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, term.dataType, maxDist.dataType) match {
      case (ArrayType(StringType, _), StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"term_freq expects (array<string>, string, int), got $other")
    }

  override def nullSafeEval(toks: Any, t: Any, d: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val needle = t.asInstanceOf[UTF8String]
    val dist = d.asInstanceOf[Int]
    var cnt = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        // bounded variant: length-prunes and band-limits the DP to
        // O(len*dist), returning -1 above the threshold — same
        // accept/reject set as `levenshteinDistance(needle) <= dist`
        val hit =
          if (dist == 0) tok.equals(needle)
          else tok.levenshteinDistance(needle, dist) >= 0
        if (hit) cnt += 1
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, t, d) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val tok = ctx.freshName("tok")
      s"""
         |long $cnt = 0L;
         |int $n = $toks.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$toks.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $tok = $toks.getUTF8String($i);
         |    boolean hit = ($d == 0)
         |      ? $tok.equals($t)
         |      : $tok.levenshteinDistance($t, $d) >= 0;
         |    if (hit) $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TermFrequency =
    copy(tokens = newFirst, term = newSecond, maxDist = newThird)

  override def prettyName: String = "term_freq"
}

object TermFrequency {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "term_freq",
      { exprs: Seq[Expression] => TermFrequency(exprs.head, exprs(1), exprs(2)) },
      "scala_udf")
}
