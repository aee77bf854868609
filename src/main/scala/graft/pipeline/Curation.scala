package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Materialize.PinOps
import graft.functions.{SimilarityFunctions => Sim, TextFunctions => Txt}

/** The composed corpus-curation workflow — quality gate → exact dedup →
  * near-dup collapse → optional containment collapse → decontamination →
  * fold assignment — run as ONE plan over the raw documents. Each stage exists (and is
  * oracle-checked) as an individual query-surface operator (q24
  * quality, q16 dedup, q18's signature family for near-dup, q67
  * decontaminate, q89 split); this module is the proof they COMPOSE the
  * way a training-data team actually runs them, and the template for
  * wiring more stages (PII, length clip) into the same shape.
  *
  * Scale design — stage decisions are COLUMNS, not materialized frames:
  * every per-row gate is a boolean flag, dedup's keeper choice is one
  * digest-keyed window, the near-dup keeper is a bucket-min aggregate
  * joined back by doc_id ([[neardupFlags]] — the one stage that needs
  * its own shuffles, both digest-keyed), decontamination is one
  * broadcast anti-flag (left join + isnull against the held-out digest
  * set), and the whole funnel report is ONE aggregation of
  * prefix-conjunction sums — so the pipeline costs one scan, the
  * near-dup signature pass, a digest shuffle, one broadcast, two
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

  /** Near-duplicate COLLAPSE flags: (doc_id, neardup_ok) where a doc is
    * dropped when ANY of its MinHash band buckets contains a smaller
    * doc_id (that smaller doc is the keeper). Same signature family as
    * q18 (8-char shingles, [[graft.queries.Extensions.MinhashK]] hashes,
    * [[graft.queries.Extensions.BandRows]]-row bands, native
    * `minhash_sigs` with the bit-identical composable fallback) — but
    * the decision is a BUCKET-MIN AGGREGATE, not a pair expansion, and
    * that inverts the flood story: q18/q20 cap or drop flooded buckets
    * (bounded pair output is their contract, recall on the flood is the
    * documented miss), while here a 300-doc — or 300-million-doc —
    * boilerplate flood is one bucket whose min survives and whose every
    * other member is dropped, with O(members) work and O(1) aggregate
    * state. No cap, no truncation, flood recall 1.0 by construction
    * (CurationPipelineSpec pins it on the LshRecallSpec flood corpus).
    *
    * Scale shape: bucket minima by partial-aggregating groupBy (a flood
    * bucket compresses to one row per map partition before the
    * exchange), then a join-back on the bucket key — AQE's skew-join
    * split handles an adversarial mega-bucket, which a window over the
    * same key would pin to one reducer. Miss classes, both documented:
    * pairs colliding in no band (the q18 recall curve — catches
    * shingle-J ≳ 0.7), and docs shorter than the shingle width (no
    * signature, flagged keep). False drops need all
    * [[graft.queries.Extensions.BandRows]] sampled minhashes equal for
    * unrelated docs — P ≈ J_background⁴ ≈ 3e-6 at the measured 0.04
    * background shingle-J.
    */
  private def neardupFlags(docs: DataFrame): DataFrame = {
    import graft.queries.Extensions.{MinhashK, ShingleN, BandRows}
    val s = docs.sparkSession
    val base = docs.select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= ShingleN)
    val sig =
      if (s.catalog.functionExists("minhash_sigs"))
        base.withColumn("ms", expr(s"minhash_sigs(text, $ShingleN, $MinhashK)"))
          .select(col("doc_id") +: (0 until MinhashK).map(j =>
            element_at(col("ms"), j + 1).as(s"sig_$j")): _*)
      else {
        val sampled = filter(Txt.charShinglesExpr("text", ShingleN),
          sh => pmod(ascii(substring(sh, 1, 1)), lit(2)) === 0)
        base
          .withColumn("digests", Sim.shingleDigests(sampled))
          .select(col("doc_id") +: Sim.minhashFromDigests(col("digests"), MinhashK): _*)
      }
    val nBands = MinhashK / BandRows
    val bandStructs = (0 until nBands).map { b =>
      val slice = (b * BandRows until (b + 1) * BandRows).map(j => col(s"sig_$j"))
      struct(lit(b).as("band"), Sim.bandHash(slice).as("h"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"))
      // null h = every sampled shingle slice empty (possible only when
      // the content-sampling predicate rejects ALL shingles) — no
      // signature, not one shared bucket
      .filter(col("h").isNotNull)
    val bucketMin = bands.groupBy(col("band"), col("h"))
      .agg(min(col("doc_id")).as("k"))
    bands.join(bucketMin, Seq("band", "h"))
      .groupBy(col("doc_id"))
      .agg((min(col("k")) === col("doc_id")).as("neardup_ok"))
  }

  /** Containment-collapse flags over the near-dup survivors: the
    * SUBSUMPTION case symmetric near-dup misses — a short doc quoted
    * whole inside a long one has Jaccard ≈ |A|/|B| ≈ 0 against every
    * band, but containment |W_A ∩ W_B| / |W_A| ≈ 1. Reuses q97's exact
    * rare-window pair plan ([[graft.queries.Extensions.containmentPairs]]
    * — same flood cap, same runtime-gated broadcast), then drops the
    * CONTAINED side of every pair at or above `thr`: the doc with fewer
    * windows (ties break to the larger doc_id, so reruns agree). The
    * content-preservation guarantee is PER PAIR: each drop has a keeper
    * carrying the shared windows at decision time — but drops are
    * decided independently, and containment is not transitive at
    * threshold, so in an A⊂B, B⊂C chain both A and B can drop while C
    * holds B's windows but not necessarily all of A's. Resolving drops
    * iteratively (only drop against a SURVIVING keeper) would close that
    * gap at the cost of a pair-graph fixpoint; at the measured pair
    * densities the chain case is rare enough that the single-pass stage
    * is the deliberate trade.
    *
    * Scale shape: pair volume is bounded by actual duplication (df ∈
    * [2, ContainCap] windows only), the drop set by the pair count, and
    * the flag join-back is doc_id-keyed — the corpus-width frame never
    * re-shuffles for this stage. Miss classes inherited from q97, both
    * documented there: pairs sharing fewer than ContainMinShared rare
    * windows, and pairs related only through above-cap boilerplate
    * windows (q66's territory).
    */
  private def containmentFlags(survivors: DataFrame, thr: Double): DataFrame =
    graft.queries.Extensions.containmentPairs(
      graft.queries.Extensions.widenIfNarrow(survivors.sparkSession, survivors))
      .filter(col("containment") >= thr)
      .select(when(col("nw_a") < col("nw_b"), col("a_id"))
        .when(col("nw_b") < col("nw_a"), col("b_id"))
        .otherwise(greatest(col("a_id"), col("b_id"))).as("doc_id"))
      .distinct()
      .withColumn("contain_ok", lit(false))

  /** `docs` needs (doc_id, text); extra columns ride along. `heldOut` is
    * the eval/benchmark corpus to decontaminate against (exact-digest
    * containment here; q67's n-gram overlap slots into the same flag).
    *
    * Stage-order semantics: near-dup keepers are chosen among quality +
    * exact-dedup SURVIVORS (see nearFlagged below). The optional
    * containment collapse (`containment = Some(thr)`) runs over NEAR-DUP
    * survivors — near-dup already collapsed the mutual-containment
    * families, so this stage only sees the asymmetric quoted-document
    * cases it exists for. Decontamination runs AFTER both, so a held-out
    * keeper drops and its already-collapsed family goes with it —
    * near-dups of benchmark docs leaving the corpus is the fuzzy-decon
    * behavior a training pipeline wants, and it is the one
    * family-removal path that is intentional.
    */
  def curate(docs: DataFrame, heldOut: Option[DataFrame] = None,
      minQuality: Double = 0.5, containment: Option[Double] = None): Result = {
    val digested = docs
      .withColumn("text", coalesce(col("text"), lit("")))
      .withColumn("digest", md5(col("text")))
      // zero-token docs score 0.0 (qualityScore's totalizing guard) and
      // fail any positive threshold
      .withColumn("q_ok", Txt.qualityScore(col("text")) >= minQuality)
      // dedup keeps the smallest doc_id per digest — deterministic keeper
      .withColumn("dedup_ok", row_number().over(
        Window.partitionBy(col("digest")).orderBy(col("doc_id"))) === 1)
    // near-dup collapse flag (bucket-min, flood-complete — see
    // [[neardupFlags]]), computed over the SURVIVORS of the preceding
    // gates (quality + exact dedup), matching the funnel's stage order.
    // Keeper choice over the raw corpus would let a keeper that itself
    // fails quality annihilate its whole family: every other member
    // drops with neardup_ok=false while the only kept representative
    // drops at q_ok — reference curation pipelines near-dup over quality
    // survivors and keep one representative. Left join: docs failing
    // earlier gates or shorter than the shingle width have no signature
    // row and default keep (they are dropped by their own gate, never by
    // a phantom near-dup decision).
    //
    // With the containment stage ON, the quality/dedup survivor frame
    // feeds TWO digest passes (minhash signatures here, window digests in
    // [[containmentFlags]]) — pin it once (r15 verdict #5: the
    // containment subplan otherwise re-ran the scan + quality expressions
    // + the digest-keyed row_number window from scratch), and pin the
    // tiny (doc_id, bool) near-dup flag frame, which is consumed both by
    // the corpus-wide flag join and by the containment stage's survivor
    // filter — unpinned, the whole signature/band/bucket-min pass would
    // run twice. Stage off: one consumer each, no pin.
    val survivors1 = digested.filter(col("q_ok") && col("dedup_ok"))
      .select(col("doc_id"), col("text"))
    val sharedSurvivors =
      if (containment.isDefined) survivors1.pinned else survivors1
    val nf = {
      val f = neardupFlags(sharedSurvivors)
      if (containment.isDefined) f.pinned else f
    }
    val nearFlagged = digested
      .join(nf, Seq("doc_id"), "left")
      .withColumn("neardup_ok", coalesce(col("neardup_ok"), lit(true)))
    // optional containment collapse over near-dup survivors; docs never
    // reaching the pair plan (or with the stage off) default keep.
    // Survivor set = pinned survivors minus explicit near-dup drops
    // (docs absent from nf — no signature — default keep, same as the
    // corpus-wide left join above).
    val containFlagged = containment match {
      case Some(thr) => nearFlagged
        .join(containmentFlags(
          sharedSurvivors.join(nf.filter(!col("neardup_ok")),
            Seq("doc_id"), "left_anti"), thr), Seq("doc_id"), "left")
        .withColumn("contain_ok", coalesce(col("contain_ok"), lit(true)))
      case None => nearFlagged.withColumn("contain_ok", lit(true))
    }
    val flagged = heldOut match {
      case Some(h) =>
        val contaminated = h.select(md5(coalesce(col("text"), lit(""))).as("digest"))
          .distinct().withColumn("__held", lit(true))
        containFlagged.join(broadcast(contaminated), Seq("digest"), "left")
          .withColumn("decon_ok", col("__held").isNull).drop("__held")
      case None => containFlagged.withColumn("decon_ok", lit(true))
    }
    val withSplit = flagged.withColumn("split", Txt.foldOf(col("doc_id")))
    // ONE aggregation: survivor count after each prefix of the stage list
    // ("contained" == "neardup" whenever the containment stage is off)
    val funnel = withSplit.agg(
      count(lit(1)).as("raw"),
      sum(when(col("q_ok"), 1L).otherwise(0L)).as("quality"),
      sum(when(col("q_ok") && col("dedup_ok"), 1L).otherwise(0L)).as("dedup"),
      sum(when(col("q_ok") && col("dedup_ok") && col("neardup_ok"), 1L).otherwise(0L))
        .as("neardup"),
      sum(when(col("q_ok") && col("dedup_ok") && col("neardup_ok") && col("contain_ok"), 1L)
        .otherwise(0L)).as("contained"),
      sum(when(col("q_ok") && col("dedup_ok") && col("neardup_ok") && col("contain_ok")
        && col("decon_ok"), 1L).otherwise(0L)).as("decontaminated"))
    val corpus = withSplit
      .filter(col("q_ok") && col("dedup_ok") && col("neardup_ok") && col("contain_ok")
        && col("decon_ok"))
      .drop("q_ok", "dedup_ok", "neardup_ok", "contain_ok", "decon_ok")
    Result(corpus, funnel)
  }
}
