package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object TokenRepStats {
  /** (w_n, w_max, w_distinct, b_n, b_max, b_distinct) for whitespace
    * tokens and adjacent-token bigrams. b_* are 0 when the doc has
    * fewer than 2 tokens (the caller maps that to the chain's
    * absent-row/NULL semantics).
    */
  private[expressions] def stats(s: String): Array[Int] = {
    // manual split on ' ' with empties dropped == Txt.tokens
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) toks.add(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val wn = toks.size
    val wc = new java.util.HashMap[String, Int](wn * 2)
    var j = 0
    while (j < wn) {
      wc.merge(toks.get(j), 1, (a, b) => a + b)
      j += 1
    }
    var wMax = 0
    val wi = wc.values().iterator()
    while (wi.hasNext) { val c = wi.next(); if (c > wMax) wMax = c }
    var bn = 0
    var bMax = 0
    var bDistinct = 0
    if (wn >= 2) {
      bn = wn - 1
      val bc = new java.util.HashMap[String, Int](bn * 2)
      j = 1
      while (j < wn) {
        bc.merge(toks.get(j - 1) + " " + toks.get(j), 1, (a, b) => a + b)
        j += 1
      }
      bDistinct = bc.size
      val bi = bc.values().iterator()
      while (bi.hasNext) { val c = bi.next(); if (c > bMax) bMax = c }
    }
    Array(wn, wMax, wc.size, bn, bMax, bDistinct)
  }
}

/** Native per-document repetition statistics:
  * `token_rep_stats(text)` → struct<w_n:int, w_max:int, w_distinct:int,
  * b_n:int, b_max:int, b_distinct:int> — total/most-frequent/distinct
  * counts over whitespace tokens and adjacent-token bigrams, the
  * Gopher/C4 repetition signals.
  *
  * This one exists for PLAN SHAPE, not per-row cost: the signals are
  * functions of ONE document, but the composable formulation could only
  * express "count per (doc, term)" as explode → groupBy(doc_id, term) →
  * groupBy(doc_id) — TWICE (words + bigrams) plus a join — which at
  * sf100 shuffled the entire exploded token corpus (~250 M rows) through
  * four exchanges to compute per-doc scalars (51 s, q51's whole cost).
  * One in-expression hash map per document replaces all of it: the
  * query becomes scan → project — ZERO exchanges — and at 100 TB the
  * difference is a full-corpus token shuffle that never happens.
  * Per-row state is O(distinct tokens of one document) — bounded by the
  * document itself, which the row already holds.
  *
  * Exact-parity contract (NativeTextSpec pins the query-level results):
  * tokens are `split(text, ' ')` with empties dropped; bigrams are
  * `concat(tok[i-1], ' ', tok[i])`; counts are exact integers, so the
  * downstream fractions are bit-identical doubles. A doc with < 2
  * tokens reports b_* = 0 (the chain's bigram frame simply lacks the
  * row; the query maps 0 back to the chain's NULL-coalesce semantics).
  * NULL text → NULL. CodegenFallback for the SimHash16 reason.
  */
case class TokenRepStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_rep_stats expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("w_n", IntegerType, nullable = false),
    StructField("w_max", IntegerType, nullable = false),
    StructField("w_distinct", IntegerType, nullable = false),
    StructField("b_n", IntegerType, nullable = false),
    StructField("b_max", IntegerType, nullable = false),
    StructField("b_distinct", IntegerType, nullable = false)))

  override protected def nullSafeEval(t: Any): Any = {
    val a = TokenRepStats.stats(t.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](a(0), a(1), a(2), a(3), a(4), a(5)))
  }

  override def prettyName: String = "token_rep_stats"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
