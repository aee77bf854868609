package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.KmeansCodebook
import graft.streaming.StreamAssign

/** The closed-form sustained-load plan + invariant audit shared by
  * [[StreamSustained]] (rate decades) and [[StreamCrashReplay]] (the same
  * load with crash injections). One definition so the two tools cannot
  * drift: every row's content, duplicate target, and root are pure
  * functions of (batch, index, rowsPerBatch), and the audit re-derives
  * the full expectation from those functions alone — no state is carried
  * from the generating side to the checking side.
  *
  * Plant rules (per batch b, index i, rate n):
  *   - i % 5 == 0 (away from the tail): a CROSS-BATCH dup of a batch b-1
  *     row — the steady planted-dup load;
  *   - batches 5 and 7 only, i % 11 == 6: an OLD-ROOT dup pointing at
  *     batch 0 — alive across compactions, exercising the folded history;
  *   - i % 7 == 1: a WITHIN-BATCH dup of the previous index;
  *   - everything else: fresh content seeded by its own id.
  *
  * Invariant contract (the rate-stable one, SCALING.md round 13): zero
  * content mislabels (every `dup_of` points at a KEPT doc with the
  * identical root vector), zero false drops of base docs, recent-plant
  * recall ≥ 0.99, old-root recall ≥ 0.9, history == kept survivors
  * exactly, bounded history dirs, and a flat per-batch wall.
  */
object SustainedLoad {

  val Dim = 32
  val Tau = 0.9

  /** Batch-strided global id. Callers must keep n < Stride (enforced in
    * the tool mains): at or above it, ids collide across batches and the
    * audit's decode() mis-attributes rows.
    */
  val Stride = 1000000L
  def id(b: Int, i: Int): Long = b * Stride + i
  def decode(x: Long): (Int, Int) = ((x / Stride).toInt, (x % Stride).toInt)

  def baseVec(docId: Long): Seq[Double] = {
    val rnd = new scala.util.Random(docId * 2654435761L + 17)
    Seq.fill(Dim)(rnd.nextGaussian())
  }

  /** The planted duplicate target of (b, i), if any — None = base doc. */
  def target(n: Int)(b: Int, i: Int): Option[(Int, Int)] =
    if (b >= 1 && i % 5 == 0 && i <= n - 5)
      Some((b - 1, i + Seq(2, 3, 4).find(r => (i + r) % 7 != 1).get))
    else if ((b == 5 || b == 7) && i % 11 == 6 && i % 5 != 0 && i % 7 != 1)
      Some((0, i))
    else if (b >= 1 && i % 7 == 1 && i % 5 != 0 && (i - 1) % 5 != 0)
      Some((b, i - 1))
    else None

  /** Transitive root of (b, i) under [[target]]. */
  def root(n: Int)(b: Int, i: Int): (Int, Int) =
    target(n)(b, i).map { case (tb, ti) => root(n)(tb, ti) }.getOrElse((b, i))

  def vec(n: Int)(b: Int, i: Int): Seq[Double] = {
    val (rb, ri) = root(n)(b, i)
    baseVec(id(rb, ri))
  }

  def isOldPlant(b: Int, i: Int): Boolean =
    (b == 5 || b == 7) && i % 11 == 6 && i % 5 != 0 && i % 7 != 1

  /** Codebook over batch 0's content; K scales like √rate (32 cells at
    * the spec's 2k rate).
    */
  def trainCells(spark: SparkSession, n: Int): Seq[(Int, Seq[Double])] = {
    import spark.implicits._
    val k = math.max(32, math.sqrt(n.toDouble).toInt)
    StreamAssign.cellsOf(KmeansCodebook.train(
      (0 until n).map(i => (id(0, i), vec(n)(0, i))).toDF("vec_id", "vec"),
      k = k, iters = 2))
  }

  /** Audit the finished run against the closed-form plan. Prints one
    * PASS/FAIL line per invariant; returns the failure count.
    *
    * `dirsMax`/`foldedMin` parametrize the compaction-bound check — the
    * crash tool's injected failures legitimately change how many dirs a
    * given compaction call folds, but the END state must still be
    * bounded.
    */
  def audit(spark: SparkSession, out: String, hist: String, n: Int,
      batches: Int, folded: Int, foldedMin: Int, dirsMax: Int,
      secs: Seq[Double]): Int = {
    import spark.implicits._
    var failures = 0
    def check(ok: Boolean, msg: String): Unit = {
      println((if (ok) "PASS " else "FAIL ") + msg)
      if (!ok) failures += 1
    }

    val ann = spark.read.parquet(out).select("vec_id", "dup_of").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    check(ann.size == batches * n, s"annotated rows ${ann.size} == ${batches * n}")

    // Failure taxonomy (SCALING.md round 13): a CONTENT mislabel (dup_of
    // pointing at a doc with a different root vector, or at a dropped
    // doc) is a correctness bug at any rate; a MISS (planted dup kept)
    // is the operator's documented recency-cap class — and misses
    // compound, so the label check is content identity (same root
    // vector) + keeper validity (target kept), not the generator's root
    // id. Contract: ZERO content mislabels, ZERO false drops of base
    // docs, recent-plant recall >= 0.99, old-plant recall >= 0.9.
    var baseDropped, recentMiss, contentMislabel, recentPlanted = 0
    var oldPlanted, oldCaught = 0
    for (b <- 0 until batches; i <- 0 until n) target(n)(b, i) match {
      case None => if (ann(id(b, i)).nonEmpty) baseDropped += 1
      case Some(_) =>
        val old = isOldPlant(b, i)
        if (old) oldPlanted += 1 else recentPlanted += 1
        ann(id(b, i)) match {
          case None => if (!old) recentMiss += 1
          case Some(t) =>
            if (old) oldCaught += 1
            val (tb, ti) = decode(t)
            if (root(n)(tb, ti) != root(n)(b, i) || ann(t).nonEmpty) contentMislabel += 1
        }
    }
    check(baseDropped == 0, s"base docs never dropped ($baseDropped dropped)")
    check(contentMislabel == 0,
      s"zero content mislabels (same-vector kept target required): $contentMislabel")
    check(recentMiss <= 0.01 * recentPlanted,
      s"recent-plant recall ${recentPlanted - recentMiss}/$recentPlanted >= 0.99")
    check(oldCaught >= 0.9 * oldPlanted, s"old-root recall $oldCaught/$oldPlanted >= 0.9")

    val keptIds = ann.collect { case (i0, None) => i0 }.toSet
    val histRows = spark.read.option("basePath", hist).parquet(hist)
      .select("vec_id").as[Long].collect()
    check(histRows.length == histRows.distinct.length,
      s"history has no duplicate vec_ids (${histRows.length - histRows.distinct.length} dups)")
    check(histRows.toSet == keptIds,
      s"history == kept (${(histRows.toSet diff keptIds).size} extra, " +
        s"${(keptIds diff histRows.toSet).size} missing)")
    val dirs = new java.io.File(hist).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id=")).length
    check(dirs <= dirsMax && folded >= foldedMin,
      s"compaction bounded: $dirs dirs (<= $dirsMax), $folded folded (>= $foldedMin)")

    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val early = median(secs.slice(2, 7).toSeq)
    val late = median(secs.slice(batches - 5, batches).toSeq)
    check(late <= 4.0 * math.max(early, 0.5),
      f"flat wall: early median $early%.2f s, late median $late%.2f s (<= 4x)")
    println(f"rate=$n/batch batches=$batches early=$early%.2f late=$late%.2f " +
      f"max=${secs.max}%.2f total=${secs.sum}%.1f s")
    failures
  }
}
