package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{ArgmaxDot, BigramH60s, BloomContains, BloomFilterAgg, BoundedSortedList, CosineSimilarity, ExactMoments, FreqItems, HllppDistinct, JacBandKeys, LangBigramHits, MinhashSigs, NgramH60s, NormFingerprint, PqCodes, QualityComponents, RollingHash31, SimHash16, SortedInterSize, TokenRepStats, TopKPairs, WordBigramMd5s, WordNgramMd5s}

/** Engine extension point, wired via
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`:
  * registers the native expressions so both SQL text and
  * `expr("cosine_sim(a, b)")` resolve to the codegen'd implementations,
  * plus the planner strategy for the native as-of join
  * (graft.plans.AsOfJoinNode -> AsOfJoinExec).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Builder with arity validation: a wrong-arity SQL call fails with a
    * clean message during analysis instead of an
    * IndexOutOfBoundsException from `children(i)` inside the builder.
    */
  private def fn(ext: SparkSessionExtensions, name: String, arity: Int,
      clazz: Class[_])(build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.size == arity,
          s"$name expects $arity argument(s), got ${children.size}")
        build(children)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
    fn(ext, "cosine_sim", 2, classOf[CosineSimilarity])(c =>
      CosineSimilarity(c(0), c(1)))
    fn(ext, "topk_pairs", 3, classOf[TopKPairs])(c =>
      TopKPairs(c(0), c(1), c(2)))
    fn(ext, "bounded_sorted_list", 2, classOf[BoundedSortedList])(c =>
      BoundedSortedList(c(0), c(1)))
    fn(ext, "freq_items", 2, classOf[FreqItems])(c =>
      FreqItems(c(0), c(1)))
    // bloom_agg keeps its own builder: optional third argument (fpp)
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          s"bloom_agg expects 2 or 3 arguments, got ${children.size}")
        BloomFilterAgg(children(0), children(1), children.lift(2))
      }))
    fn(ext, "argmax_dot", 2, classOf[ArgmaxDot])(c =>
      ArgmaxDot(c(0), c(1)))
    fn(ext, "word_bigram_md5s", 1, classOf[WordBigramMd5s])(c =>
      WordBigramMd5s(c(0)))
    fn(ext, "word_ngram_md5s", 2, classOf[WordNgramMd5s])(c =>
      WordNgramMd5s(c(0), c(1)))
    fn(ext, "bigram_h60s", 1, classOf[BigramH60s])(c =>
      BigramH60s(c(0)))
    fn(ext, "ngram_h60s", 2, classOf[NgramH60s])(c =>
      NgramH60s(c(0), c(1)))
    fn(ext, "jac_band_keys", 1, classOf[JacBandKeys])(c =>
      JacBandKeys(c(0)))
    fn(ext, "sorted_inter_size", 2, classOf[SortedInterSize])(c =>
      SortedInterSize(c(0), c(1)))
    fn(ext, "rolling_hash31", 1, classOf[RollingHash31])(c =>
      RollingHash31(c(0)))
    fn(ext, "minhash_sigs", 3, classOf[MinhashSigs])(c =>
      MinhashSigs(c(0), c(1), c(2)))
    fn(ext, "simhash16", 1, classOf[SimHash16])(c =>
      SimHash16(c(0)))
    fn(ext, "pq_codes", 4, classOf[PqCodes])(c =>
      PqCodes(c(0), c(1), c(2), c(3)))
    fn(ext, "bloom_contains", 2, classOf[BloomContains])(c =>
      BloomContains(c(0), c(1)))
    fn(ext, "lang_bigram_hits", 1, classOf[LangBigramHits])(c =>
      LangBigramHits(c(0)))
    fn(ext, "quality_components", 1, classOf[QualityComponents])(c =>
      QualityComponents(c(0)))
    fn(ext, "norm_fingerprint", 1, classOf[NormFingerprint])(c =>
      NormFingerprint(c(0)))
    fn(ext, "token_rep_stats", 1, classOf[TokenRepStats])(c =>
      TokenRepStats(c(0)))
    fn(ext, "hllpp_distinct", 2, classOf[HllppDistinct])(c =>
      HllppDistinct(c(0), c(1)))
    fn(ext, "exact_moments", 2, classOf[ExactMoments])(c =>
      ExactMoments(c(0), c(1)))
  }
}
