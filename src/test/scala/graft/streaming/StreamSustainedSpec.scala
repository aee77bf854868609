package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.KmeansCodebook

/** Sustained-rate streaming e2e: 20 micro-batches × 2,000 vectors
  * (sf0.1-rate embeddings — the full sf0.1 table per batch) through
  * assign → SemDeDup with CapAuto, with history compaction running
  * MID-STREAM every 5 batches. The 3-batch specs prove semantics; this
  * one proves STEADY STATE:
  *
  *   - per-batch wall-clock stays flat while history grows 20× — the
  *     partition-pruned, recency-capped history join really is bounded
  *     by cap·|batch|, not by corpus size (a regression to an uncapped
  *     history join would grow late batches linearly and trip the
  *     drift gate);
  *   - CapAuto re-derivation runs every batch against the growing
  *     corpus without wedging or mis-sizing (all planted recent dups
  *     stay caught through the cap growth);
  *   - compaction interleaves with the live stream: batches read
  *     compacted history (batch-0 roots after the b=4 fold) and the
  *     dir count stays bounded instead of growing one per batch.
  *
  * Every row's fate is closed-form: doc (b, i) is either a base doc
  * (fresh deterministic vector) or an EXACT copy of an earlier doc per
  * the plant rules below, so expected kept/dup labels and `dup_of`
  * roots are computed by the same functions that generate the data.
  * Exact-copy families make the outcome geometry-free (cosine 1 vs
  * chance cosine ~N(0, 1/√32); P(chance ≥ τ=0.9) ≈ 1e-11): only the
  * root of a copy family is kept, every later member points at it.
  *
  * Plant rules (disjoint by construction; id = b·10⁴ + i):
  *   cross:  b≥1, i%5=0          → copy of (b-1, i+r), r∈{2,3,4} picked
  *                                 so the target is a base doc
  *   old:    b∈{5,7}, i%11=6,
  *           i%5≠0, i%7≠1        → copy of (0, i) — post-compaction read,
  *                                 and the recency-cap MISS CLASS: a
  *                                 batch-0 root can fall outside a hot
  *                                 cell's cap·recency window, so these
  *                                 assert ≥90% recall with misses KEPT
  *                                 (never mislabeled), per the documented
  *                                 contract
  *   within: b≥1, i%7=1, i%5≠0,
  *           (i-1)%5≠0           → copy of (b, i-1) in the same batch
  */
class StreamSustainedSpec extends SparkSpec {
  import spark.implicits._

  private val B = 20      // micro-batches
  private val N = 2000    // rows per batch — the sf0.1 embeddings row count
  private val Dim = 32
  private val K = 32      // codebook cells
  private val Tau = 0.9

  private def id(b: Int, i: Int): Long = b * 10000L + i

  private def baseVec(docId: Long): Seq[Double] = {
    val rnd = new scala.util.Random(docId * 2654435761L + 17)
    Seq.fill(Dim)(rnd.nextGaussian())
  }

  /** Copy target of a planted doc, None for base docs. */
  private def target(b: Int, i: Int): Option[(Int, Int)] =
    if (b >= 1 && i % 5 == 0 && i <= N - 5)
      Some((b - 1, i + Seq(2, 3, 4).find(r => (i + r) % 7 != 1).get))
    else if ((b == 5 || b == 7) && i % 11 == 6 && i % 5 != 0 && i % 7 != 1)
      Some((0, i))
    else if (b >= 1 && i % 7 == 1 && i % 5 != 0 && (i - 1) % 5 != 0)
      Some((b, i - 1))
    else None

  private def root(b: Int, i: Int): (Int, Int) =
    target(b, i).map { case (tb, ti) => root(tb, ti) }.getOrElse((b, i))

  private def vec(b: Int, i: Int): Seq[Double] = {
    val (rb, ri) = root(b, i); baseVec(id(rb, ri))
  }

  private def isOldPlant(b: Int, i: Int): Boolean =
    (b == 5 || b == 7) && i % 11 == 6 && i % 5 != 0 && i % 7 != 1

  test("20 sf0.1-rate batches: flat per-batch cost, exact dup bookkeeping, mid-stream compaction") {
    val out = java.nio.file.Files.createTempDirectory("sus_out").toString
    val hist = java.nio.file.Files.createTempDirectory("sus_hist").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sus_ck").toString

    val cells = StreamAssign.cellsOf(KmeansCodebook.train(
      (0 until N).map(i => (id(0, i), vec(0, i))).toDF("vec_id", "vec"),
      k = K, iters = 2))

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamSemDedup.writer(in.toDF().toDF("vec_id", "vec"), cells,
      hist, out, tau = Tau) // cap = CapAuto: re-derived per batch
      .option("checkpointLocation", ckpt).outputMode("update").start()

    val secs = new scala.collection.mutable.ArrayBuffer[Double]
    var folded = 0
    try {
      for (b <- 0 until B) {
        in.addData((0 until N).map(i => (id(b, i), vec(b, i))))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        secs += (System.nanoTime() - t0) / 1e9
        if (b == 4 || b == 9 || b == 14) {
          val n = StreamSemDedup.compactHistory(spark, hist, b - 1L)
          assert(n >= 1, s"compaction at batch $b folded nothing")
          folded += n
        }
      }
    } finally q.stop()
    assert(folded >= 9, s"three compactions folded only $folded dirs")

    // --- correctness: every row's fate vs the closed-form plant plan ---
    val ann = spark.read.parquet(out).select("vec_id", "dup_of").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(ann.size == B * N, s"expected ${B * N} annotated rows, got ${ann.size}")

    var oldPlanted, oldCaught = 0
    for (b <- 0 until B; i <- 0 until N) target(b, i) match {
      case None =>
        assert(ann(id(b, i)).isEmpty, s"base doc ($b,$i) must be kept: ${ann(id(b, i))}")
      case Some(_) if isOldPlant(b, i) =>
        oldPlanted += 1
        val got = ann(id(b, i))
        val (rb, ri) = root(b, i)
        assert(got.isEmpty || got.contains(id(rb, ri)),
          s"old plant ($b,$i): caught-or-kept only, got $got")
        if (got.nonEmpty) oldCaught += 1
      case Some(_) =>
        val (rb, ri) = root(b, i)
        assert(ann(id(b, i)).contains(id(rb, ri)),
          s"plant ($b,$i) must point at root ($rb,$ri): ${ann(id(b, i))}")
    }
    assert(oldPlanted > 100, s"plant plan degenerate: $oldPlanted old plants")
    assert(oldCaught >= 0.9 * oldPlanted,
      s"old-root recall $oldCaught/$oldPlanted below 0.9 — recency cap mis-sized?")

    // --- history == kept survivors, through three compactions ---
    val keptIds = ann.collect { case (id0, None) => id0 }.toSet
    val histIds = spark.read.option("basePath", hist).parquet(hist)
      .select("vec_id").as[Long].collect().toSet
    assert(histIds == keptIds,
      s"history diverged from kept set: ${(histIds diff keptIds).size} extra, " +
        s"${(keptIds diff histIds).size} missing")
    val dirs = new java.io.File(hist).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id=")).map(_.getName)
    assert(dirs.length <= 8, s"history dirs unbounded: ${dirs.sorted.mkString(",")}")

    // --- steady state: late batches must not pay for corpus growth ---
    val minRate = N / secs.max
    assert(minRate >= 100,
      f"slowest batch ${secs.max}%.1f s = $minRate%.0f rows/s — below the 100 rows/s floor")
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val early = median(secs.slice(2, 7).toSeq)
    val late = median(secs.slice(B - 5, B).toSeq)
    assert(late <= 4.0 * math.max(early, 0.5),
      f"per-batch cost drifting: early median $early%.2f s → late median $late%.2f s " +
        "(history join no longer bounded by cap·|batch|?)")
  }
}
