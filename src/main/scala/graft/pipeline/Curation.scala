package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => Txt}

/** The composed corpus-curation workflow — quality gate → exact dedup →
  * decontamination → fold assignment — run as ONE plan over the raw
  * documents. Each stage exists (and is oracle-checked) as an individual
  * query-surface operator (q24 quality, q16 dedup, q67 decontaminate,
  * q89 split); this module is the proof they COMPOSE the way a training
  * -data team actually runs them, and the template for wiring more
  * stages (near-dup, PII, length clip) into the same shape.
  *
  * Scale design — stage decisions are COLUMNS, not materialized frames:
  * every per-row gate is a boolean flag, dedup's keeper choice is one
  * digest-keyed window, decontamination is one broadcast anti-flag
  * (left join + isnull against the held-out digest set), and the whole
  * funnel report is ONE aggregation of prefix-conjunction sums — so the
  * pipeline costs one scan, one digest shuffle, one broadcast, two
  * actions (funnel + output), no matter how many stages it grows. The
  * naive per-stage `df = stage(df); df.count()` chain would scan the
  * corpus once PER STAGE.
  *
  * Determinism: every decision is a pure function of content (digests,
  * integer thresholds) — reruns, layouts, and engines agree; the spec
  * pins run-twice equality.
  */
object Curation {

  final case class Result(corpus: DataFrame, funnel: DataFrame)

  /** `docs` needs (doc_id, text); extra columns ride along. `heldOut` is
    * the eval/benchmark corpus to decontaminate against (exact-digest
    * containment here; q67's n-gram overlap slots into the same flag).
    */
  def curate(docs: DataFrame, heldOut: Option[DataFrame] = None,
      minQuality: Double = 0.5): Result = {
    val digested = docs
      .withColumn("text", coalesce(col("text"), lit("")))
      .withColumn("digest", md5(col("text")))
      // zero-token docs score 0.0 (qualityScore's totalizing guard) and
      // fail any positive threshold
      .withColumn("q_ok", Txt.qualityScore(col("text")) >= minQuality)
      // dedup keeps the smallest doc_id per digest — deterministic keeper
      .withColumn("dedup_ok", row_number().over(
        Window.partitionBy(col("digest")).orderBy(col("doc_id"))) === 1)
    val flagged = heldOut match {
      case Some(h) =>
        val contaminated = h.select(md5(coalesce(col("text"), lit(""))).as("digest"))
          .distinct().withColumn("__held", lit(true))
        digested.join(broadcast(contaminated), Seq("digest"), "left")
          .withColumn("decon_ok", col("__held").isNull).drop("__held")
      case None => digested.withColumn("decon_ok", lit(true))
    }
    val withSplit = flagged.withColumn("split", Txt.foldOf(col("doc_id")))
    // ONE aggregation: survivor count after each prefix of the stage list
    val funnel = withSplit.agg(
      count(lit(1)).as("raw"),
      sum(when(col("q_ok"), 1L).otherwise(0L)).as("quality"),
      sum(when(col("q_ok") && col("dedup_ok"), 1L).otherwise(0L)).as("dedup"),
      sum(when(col("q_ok") && col("dedup_ok") && col("decon_ok"), 1L).otherwise(0L))
        .as("decontaminated"))
    val corpus = withSplit
      .filter(col("q_ok") && col("dedup_ok") && col("decon_ok"))
      .drop("q_ok", "dedup_ok", "decon_ok")
    Result(corpus, funnel)
  }
}
