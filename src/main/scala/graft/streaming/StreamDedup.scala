package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for a continuously-ingesting corpus —
  * the streaming twin of the batch hash dedup (q16) and the
  * decontamination anti-join (q67).
  *
  * Two complementary guarantees, composed in that order in a real feed:
  *
  *  1. [[dedupWithinWatermark]] — WITHIN-STREAM dedup over the recent
  *     horizon: rows keyed by content digest, first arrival emitted
  *     immediately, later copies suppressed while their key's state
  *     lives. `dropDuplicatesWithinWatermark` evicts a key once the
  *     watermark passes its arrival + lateness, so state size tracks the
  *     dedup HORIZON (duplicates arrive close together: crawler retries,
  *     at-least-once upstreams), not stream history — the property that
  *     keeps it alive at 100 TB/day. A copy arriving after eviction is
  *     emitted again by design; full-history exactness belongs to (2).
  *  2. [[dedupAgainstHistory]] — stream-static LEFT ANTI join against the
  *     authoritative seen-digest table: EXACT suppression of everything
  *     already in the corpus. The static side is re-planned per
  *     micro-batch (so a nightly-refreshed digest table takes effect
  *     without restart). Digests-only: the join carries 16-byte keys,
  *     never documents. A Bloom image ([[graft.io.FilterStore]]) can NOT
  *     replace the anti-join here — a false positive would silently DROP
  *     a novel document; the image is only safe as a positive-side
  *     prefilter.
  */
object StreamDedup {

  /** Digest column both paths key on: md5 of the text with null
    * coalesced to "" — the definition [[graft.pipeline.Curation]] uses,
    * under which null text ≡ empty text ("no content" is one identity).
    * Without the coalesce, md5(null) is null and the two streaming paths
    * CONTRADICT EACH OTHER: the within-watermark path collapses all
    * null-text docs into one (null keys group together) while the
    * anti-join passes every one (null never matches). Note the q16 batch
    * query digests raw text (null → a separate null-digest group it
    * keeps whole) — feed a stream through this module and batch history
    * through Curation's digest, not q16's, when null-text docs matter.
    */
  def withDigest(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("digest", md5(coalesce(col(textCol), lit(""))))

  def dedupWithinWatermark(docs: DataFrame, eventTimeCol: String,
      lateness: String, textCol: String = "text"): DataFrame =
    withDigest(docs, textCol)
      .withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark("digest")

  /** `seenDigests` must expose a `digest` column (e.g. the q16 output or
    * a maintained digest dimension).
    */
  def dedupAgainstHistory(stream: DataFrame, seenDigests: DataFrame,
      textCol: String = "text"): DataFrame =
    withDigest(stream, textCol)
      .join(seenDigests.select(col("digest")), Seq("digest"), "left_anti")
}
