package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.{ArgmaxDot, BloomContains, BloomFilterAgg, BoundedSortedList, CosineSimilarity, FreqItems, MinhashSigs, PqCodes, SimHash16, TopKPairs, WordBigramMd5s}

/** Engine extension point, wired via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`:
  * registers the native expressions so both SQL text and
  * `expr("cosine_sim(a, b)")` resolve to the codegen'd implementations,
  * plus the planner strategy for the native as-of join
  * (graft.plans.AsOfJoinNode -> AsOfJoinExec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKPairs(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("bounded_sorted_list"),
      new ExpressionInfo(classOf[BoundedSortedList].getName, "bounded_sorted_list"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BoundedSortedList(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[FreqItems].getName, "freq_items"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FreqItems(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomFilterAgg(children(0), children(1), children.lift(2))))
    ext.injectFunction((
      new FunctionIdentifier("argmax_dot"),
      new ExpressionInfo(classOf[ArgmaxDot].getName, "argmax_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArgmaxDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("word_bigram_md5s"),
      new ExpressionInfo(classOf[WordBigramMd5s].getName, "word_bigram_md5s"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordBigramMd5s(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSigs].getName, "minhash_sigs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSigs(children(0), children(1), children(2))))
    ext.injectFunction((
      new FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimHash16].getName, "simhash16"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash16(children(0))))
    ext.injectFunction((
      new FunctionIdentifier("pq_codes"),
      new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqCodes(children(0), children(1), children(2), children(3))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BloomContains(children(0), children(1))))
  }
}
