package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, language-ID heuristics, quality scoring, fingerprinting.
  *
  * Everything here is a pure `Column` expression built from codegen'd
  * built-ins (split/transform/aggregate/regexp_*) — no UDFs, so the whole
  * stage stays inside WholeStageCodegen and scales linearly with no shuffle.
  * Higher-order-function lambdas are written via `expr(...)` where the
  * typed `functions._` API would force literal-only arguments.
  */
object TextFunctions {

  /** Whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: alpha runs, digit runs, single punctuation. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Character n-gram shingles (positions 0..len-n). Caller must ensure
    * length(text) >= n (shorter texts would produce a descending sequence).
    * expr-based because `substr` with a non-literal position needs SQL form.
    */
  def charShinglesExpr(textCol: String, n: Int): Column =
    expr(s"transform(sequence(0, length($textCol) - $n), i -> substr($textCol, i + 1, $n))")

  /** Word bigrams over a PRE-SPLIT token array column ("a b c" ->
    * ["a b","b c"]). Takes a materialized column name, not raw text —
    * inlining the split into the lambda would re-tokenize per element.
    */
  def wordBigramsExpr(tokCol: String): Column =
    // the < 2 guard matters: Spark's sequence(1, 0) DESCENDS ([1, 0]),
    // so an unguarded transform would index tok[-1] on 1-token docs
    expr(
      s"""CASE WHEN size($tokCol) < 2 THEN array()
         |ELSE transform(
         |  sequence(1, size($tokCol) - 1),
         |  i -> concat($tokCol[i - 1], ' ', $tokCol[i]))
         |END""".stripMargin)

  /** Word `w`-shingles over a PRE-SPLIT token array column ("a b c d",
    * w=3 -> ["a b c","b c d"]) — [[wordBigramsExpr]] generalized; the
    * composable twin of the native `ngram_h60s` shingle walk (before its
    * md5 step). Docs with < w tokens yield an empty array.
    */
  def wordShinglesExpr(tokCol: String, w: Int): Column = {
    val parts = (0 until w).map(j => s"$tokCol[i - 1 + $j]").mkString(", ' ', ")
    expr(
      s"""CASE WHEN size($tokCol) < $w THEN array()
         |ELSE transform(
         |  sequence(1, size($tokCol) - ${w - 1}),
         |  i -> concat($parts))
         |END""".stripMargin)
  }

  /** Distinct-stopword hit count: |tokens ∩ stopwords|. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(array_intersect(toks, array(stopwords.map(lit): _*)))

  /** Multiset stopword hit count (each occurrence counts). */
  def stopwordOccurrences(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small and fixed: the point is a deterministic,
    * shuffle-free classifier, not linguistic accuracy.
    */
  val StopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist"),
  )

  /** Character-bigram profiles for the n-gram language-ID heuristic —
    * a few high-frequency bigrams per language (the classic n-gram-profile
    * approach at its smallest). Deterministic scoring, not linguistics.
    */
  val CharBigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "in", "er", "an"),
    "es" -> Seq("de", "en", "el", "la", "os"),
    "fr" -> Seq("le", "es", "on", "nt", "ou"),
    "de" -> Seq("en", "er", "ch", "de", "ei"),
  )

  /** Occurrences of profile bigrams among the text's char 2-gram shingles
    * (multiset count: every position counts).
    */
  def ngramProfileHits(textCol: String, profile: Seq[String]): Column = {
    val lits = profile.map(p => s"'$p'").mkString("array(", ", ", ")")
    expr(
      s"""size(filter(
         |  transform(sequence(0, length($textCol) - 2), i -> substr($textCol, i + 1, 2)),
         |  g -> array_contains($lits, g)))""".stripMargin)
  }

  /** Document quality score — length band (0.4) + punctuation
    * cleanliness (0.3) + stopword density (0.3). THE shared definition:
    * the oracle-checked q24 query and the [[graft.pipeline.Curation]]
    * gate both route through [[qualityScoreFrom]], so a tuning change
    * cannot silently desync the pipeline from the oracle. This text-
    * level entry adds a TOTALIZING guard: a zero-token doc scores 0.0
    * instead of evaluating 0/0 — under Spark's default ANSI mode that
    * division THROWS, and a curation gate must score garbage, not crash
    * on it. The guard lives only here; q24 uses the raw formula, so its
    * oracle arithmetic is untouched.
    */
  def qualityScore(text: Column): Column =
    if (org.apache.spark.sql.SparkSession.getActiveSession
          .exists(_.catalog.functionExists("quality_components"))) {
      // native single-pass components (NativeTextSpec pins parity with
      // the chain below); same totalizing zero-token guard, same formula
      val qc = call_function("quality_components", text)
      when(qc.getField("n_tokens") === 0, lit(0.0)).otherwise(
        qualityScoreFrom(qc.getField("n_tokens"), qc.getField("punct_cnt"),
          qc.getField("stop_occ"), qc.getField("len")))
    } else {
      val toks = tokens(text)
      when(size(toks) === 0, lit(0.0)).otherwise(
        qualityScoreFrom(size(toks),
          size(regexp_extract_all(text, lit("[^a-z0-9 ]"), lit(0))),
          stopwordOccurrences(toks, StopwordsByLang.head._2),
          length(text)))
    }

  /** The raw formula over pre-computed components — for callers (q24)
    * that already materialize token/punctuation/stopword counts as
    * columns, so the shared definition costs no recomputation and stays
    * arithmetic-identical to the DuckDB oracle. Partial by design:
    * zero `nTokens` or `len` divides by zero (ANSI: throws) — guard at
    * the call site if the input can contain empty docs.
    */
  def qualityScoreFrom(nTokens: Column, punctCnt: Column,
      stopOcc: Column, len: Column): Column =
    when(nTokens.between(20, 1000), lit(0.4)).otherwise(lit(0.0)) +
      lit(0.3) * (lit(1.0) - punctCnt / len) +
      lit(0.3) * (stopOcc / nTokens)

  /** Deterministic train/val/test fold of a document id — md5 over the
    * domain-separated "split:" prefix, hex-threshold widths (val ≈
    * 3.1 %, test the next 3.1 %). Shared by the oracle-checked q89 and
    * [[graft.pipeline.Curation]] (same no-drift contract as
    * [[qualityScore]]).
    */
  def foldOf(docId: Column): Column = {
    val h = substring(md5(concat(lit("split:"), docId.cast("string"))), 1, 4)
    when(h < "0800", "val").when(h < "1000", "test").otherwise("train")
  }

  /** Normalized text: lowercase, punctuation→space, collapsed whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Content fingerprint = md5 of normalized text. Native
    * `norm_fingerprint` when registered — one byte walk instead of the
    * chain's two full-document java.util.regex passes (152 s of q26's
    * sf100 wall); the composable form below is the bit-identical
    * no-extensions fallback and the spec's parity reference
    * (NativeTextSpec, both ASCII and Unicode-lowercase edge cases).
    * Same resolution pattern as [[rollingHashExpr]].
    */
  def fingerprint(text: Column): Column = fingerprint(text, forceComposable = false)

  def fingerprint(text: Column, forceComposable: Boolean): Column =
    if (!forceComposable && org.apache.spark.sql.SparkSession.getActiveSession
          .exists(_.catalog.functionExists("norm_fingerprint")))
      call_function("norm_fingerprint", text)
    else md5(normalize(text))

  /** Polynomial rolling hash of the raw text: h = (h*31 + codepoint) mod
    * 1e9+7. Portable integer arithmetic (exact in any engine), used both as
    * a cheap fingerprint and as the deterministic "decode" seed for the
    * multimodal stub. Native `rolling_hash31` when registered — the
    * composable fold below is its exact-parity twin but O(len²) per doc
    * (`substr(text, i, 1)` re-seeks the UTF-8 buffer for every i; 328 s
    * of the sf10 verify), kept as the extension-less fallback and the
    * spec's parity reference.
    */
  def rollingHashExpr(textCol: String): Column =
    rollingHashExpr(textCol, forceComposable = false)

  def rollingHashExpr(textCol: String, forceComposable: Boolean): Column =
    if (!forceComposable && org.apache.spark.sql.SparkSession.getActiveSession
          .exists(_.catalog.functionExists("rolling_hash31")))
      expr(s"rolling_hash31($textCol)")
    else expr(
      s"""aggregate(
         |  transform(sequence(1, length($textCol)), i -> ascii(substr($textCol, i, 1))),
         |  cast(0 as bigint),
         |  (acc, c) -> (acc * 31 + c) % 1000000007)""".stripMargin)
}
