package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Mechanical gate on q20's candidate-slot volume — the sub-quadratic
  * property that round 12 bought by moving the LSH signature from word
  * bigrams to 4-word shingles (Extensions.scala:369, SCALING.md round-12
  * section). The property held by MEASUREMENT (Q20Diag slot table:
  * 423 / 1,687 / 114,651 at sf0.1/1/10 vs 28 k / 2.8 M / 179 M before),
  * but only as prose — this spec makes a signature regression a test
  * failure instead of a bench surprise, the way Q61RoundsSpec pins
  * connected-components round counts.
  *
  * Ceiling: slots ≤ Bands × truePairs + ε·N², where
  *   - Bands × truePairs bounds the USEFUL slots (a qualifying pair can
  *     collide in at most every band),
  *   - ε·N² bounds the BACKGROUND collisions. Current measured ε at the
  *     500-doc test scales is ≤ 2.5e-4 (62 slots at sf0.01 ≈ all from
  *     the one true pair; 122 at sf0.001 against 1+ true pairs); the
  *     pre-fix word-bigram signature ran at ε ≈ 1e-3 and climbing with
  *     corpus size (Θ(N²·c) — 2.8 M slots at sf1), so any re-narrowing
  *     of the shingle or re-widening of the background term lands well
  *     above this line.
  */
class Q20SlotSpec extends SparkSpec {

  private val EpsBg = 2.5e-4

  /** (docs, live candidate-pair slots, q20 qualifying pairs) at sfDir —
    * the slot accounting mirrors tools.Q20Diag exactly.
    */
  private def measure(dir: String): (Long, Long, Long) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"),
        expr(s"ngram_h60s(coalesce(text, ''), ${Extensions.JacShingle})").as("sgs"),
        expr("bigram_h60s(coalesce(text, ''))").as("ghs"))
      .filter(size(col("ghs")) > 0)
    val n = docs.count()
    val bands = docs
      .select(col("source"), col("doc_id"), posexplode(expr("jac_band_keys(sgs)")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "k"))
    val slots = bands.groupBy("source", "band", "k").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= Extensions.HotBucketCap)
      .agg(coalesce(sum(((col("n") * (col("n") - 1)) / 2).cast("long")), lit(0L)))
      .head.getLong(0)
    val truePairs = SparkEntry.queries("q20_jaccard_pairs")(spark, dir).count()
    (n, slots, truePairs)
  }

  private def assertCeiling(dir: String): Unit = {
    val (n, slots, truePairs) = measure(dir)
    val ceiling = Extensions.JacBands * truePairs + math.ceil(EpsBg * n * n).toLong
    assert(slots <= ceiling,
      s"$dir: $slots candidate slots > ceiling $ceiling " +
        s"(${Extensions.JacBands} bands x $truePairs true pairs + " +
        s"$EpsBg x $n^2) — the LSH signature's background collision " +
        "term regressed (see Extensions.scala:369 and SCALING.md r12)")
    info(s"$dir: docs=$n slots=$slots truePairs=$truePairs ceiling=$ceiling")
  }

  test("q20 candidate slots stay under the closed-form ceiling at sf0.001") {
    assertCeiling("/root/testdata/sf0.001")
  }

  test("q20 candidate slots stay under the closed-form ceiling at sf0.01") {
    assertCeiling("/root/testdata/sf0.01")
  }
}
