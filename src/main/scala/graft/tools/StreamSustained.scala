package graft.tools

import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.KmeansCodebook
import graft.streaming.{StreamAssign, StreamSemDedup}

/** Sustained-rate streaming e2e at an ARBITRARY rate — the scale twin of
  * StreamSustainedSpec (which pins the sf0.1 rate, 2,000 rows/batch, on
  * the shared local[4] test session). Same closed-form plant rules, same
  * invariants, own local[32] session, so the per-batch walls measure the
  * operator at the target rate instead of the test harness:
  *
  *   StreamSustained [rowsPerBatch] [batches]   # default 20000 20 = sf1-rate
  *
  * Prints one line per batch (wall + planted/caught counts ride the final
  * summary), then PASS/FAIL per invariant; non-zero exit on any FAIL.
  * Results are pinned in SCALING.md (round 13: the sf1-rate decade).
  *
  * Invariants (the spec's, restated):
  *   - every base doc kept; every cross/within plant points at its root
  *   - old plants (post-compaction batch-0 roots) caught-or-kept,
  *     recall ≥ 0.9 — the recency-cap miss class stays bounded
  *   - history == kept survivors through three mid-stream compactions;
  *     history dir count bounded
  *   - late-batch median wall ≤ 4× early median — per-batch cost must
  *     not grow with corpus size (the cap·|batch| bound is the claim)
  */
object StreamSustained {

  private val Dim = 32
  private val Tau = 0.9

  private def id(b: Int, i: Int): Long = b * 1000000L + i

  private def baseVec(docId: Long): Seq[Double] = {
    val rnd = new scala.util.Random(docId * 2654435761L + 17)
    Seq.fill(Dim)(rnd.nextGaussian())
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val batches = if (args.length > 1) args(1).toInt else 20
    // The id packing is batch*1e6+i: a row rate at or above the stride
    // would silently collide ids across batches and corrupt the very
    // mislabel/recall accounting this tool measures — fail loudly
    // (r13 ADVICE). A >=1M-row rate needs a wider stride AND new
    // closed-form plant rules, not a quiet wraparound.
    require(n > 0 && n < 1000000,
      s"rowsPerBatch=$n out of range: id stride is 1,000,000 (see id())")
    // Plant rules (old plants at batches 5/7), the three mid-stream
    // compaction points (4/9/14), and the folded>=9 / dirs<=8 invariant
    // are closed-form for a >=15-batch run; a shorter run would fail
    // the compaction check spuriously instead of testing a weaker
    // bound (r13 ADVICE).
    require(batches >= 15, s"batches=$batches < 15: the plant/compaction " +
      "invariants are closed-form for >= 15 batches")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    def target(b: Int, i: Int): Option[(Int, Int)] =
      if (b >= 1 && i % 5 == 0 && i <= n - 5)
        Some((b - 1, i + Seq(2, 3, 4).find(r => (i + r) % 7 != 1).get))
      else if ((b == 5 || b == 7) && i % 11 == 6 && i % 5 != 0 && i % 7 != 1)
        Some((0, i))
      else if (b >= 1 && i % 7 == 1 && i % 5 != 0 && (i - 1) % 5 != 0)
        Some((b, i - 1))
      else None
    def root(b: Int, i: Int): (Int, Int) =
      target(b, i).map { case (tb, ti) => root(tb, ti) }.getOrElse((b, i))
    def vec(b: Int, i: Int): Seq[Double] = { val (rb, ri) = root(b, i); baseVec(id(rb, ri)) }
    def isOldPlant(b: Int, i: Int): Boolean =
      (b == 5 || b == 7) && i % 11 == 6 && i % 5 != 0 && i % 7 != 1

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val out = java.nio.file.Files.createTempDirectory("sus_out").toString
    val hist = java.nio.file.Files.createTempDirectory("sus_hist").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sus_ck").toString

    // codebook K scales like the batch: 32 cells at the spec's 2k rate
    val k = math.max(32, math.sqrt(n.toDouble).toInt)
    val cells = StreamAssign.cellsOf(KmeansCodebook.train(
      (0 until n).map(i => (id(0, i), vec(0, i))).toDF("vec_id", "vec"),
      k = k, iters = 2))

    implicit val ctx: SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamSemDedup.writer(in.toDF().toDF("vec_id", "vec"), cells,
      hist, out, tau = Tau)
      .option("checkpointLocation", ckpt).outputMode("update").start()

    val secs = new scala.collection.mutable.ArrayBuffer[Double]
    var folded = 0
    try {
      for (b <- 0 until batches) {
        in.addData((0 until n).map(i => (id(b, i), vec(b, i))))
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val s = (System.nanoTime() - t0) / 1e9
        secs += s
        println(f"batch $b%2d: $s%7.2f s  (${n / s}%,.0f rows/s)")
        if (b == 4 || b == 9 || b == 14) {
          val nf = StreamSemDedup.compactHistory(spark, hist, b - 1L)
          println(s"  compaction at batch $b folded $nf dirs")
          folded += nf
        }
      }
    } finally q.stop()

    var failures = 0
    def check(ok: Boolean, msg: String): Unit = {
      println((if (ok) "PASS " else "FAIL ") + msg)
      if (!ok) failures += 1
    }

    val ann = spark.read.parquet(out).select("vec_id", "dup_of").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    check(ann.size == batches * n, s"annotated rows ${ann.size} == ${batches * n}")

    // Failure taxonomy matters: a CONTENT mislabel (dup_of pointing at a
    // doc with a DIFFERENT vector, or at a dropped doc) is a correctness
    // bug at any rate; a MISS (a planted dup kept) is the operator's
    // documented recency-cap class — at 10× the spec's rate, hot kmeans
    // cells hold more rows than the cap·recency window covers, so even
    // recent plants acquire a bounded miss rate. AND misses compound:
    // a missed copy is (correctly) kept, enters history as a legitimate
    // root, and LATER copies of the same content point at IT rather than
    // the generator's original root — so the label check is content
    // identity (same root vector) + keeper validity (target kept), not
    // the generator's root id. Contract: ZERO content mislabels, ZERO
    // false drops of base docs, recent-plant recall ≥ 0.99, old-plant
    // recall ≥ 0.9.
    def decode(x: Long): (Int, Int) = ((x / 1000000L).toInt, (x % 1000000L).toInt)
    var baseDropped, recentMiss, contentMislabel, recentPlanted = 0
    var oldPlanted, oldCaught = 0
    for (b <- 0 until batches; i <- 0 until n) target(b, i) match {
      case None => if (ann(id(b, i)).nonEmpty) baseDropped += 1
      case Some(_) =>
        val old = isOldPlant(b, i)
        if (old) oldPlanted += 1 else recentPlanted += 1
        ann(id(b, i)) match {
          case None => if (!old) recentMiss += 1
          case Some(t) =>
            if (old) oldCaught += 1
            val (tb, ti) = decode(t)
            if (root(tb, ti) != root(b, i) || ann(t).nonEmpty) contentMislabel += 1
        }
    }
    check(baseDropped == 0, s"base docs never dropped ($baseDropped dropped)")
    check(contentMislabel == 0,
      s"zero content mislabels (same-vector kept target required): $contentMislabel")
    check(recentMiss <= 0.01 * recentPlanted,
      s"recent-plant recall ${recentPlanted - recentMiss}/$recentPlanted >= 0.99")
    check(oldCaught >= 0.9 * oldPlanted, s"old-root recall $oldCaught/$oldPlanted >= 0.9")

    val keptIds = ann.collect { case (i0, None) => i0 }.toSet
    val histIds = spark.read.option("basePath", hist).parquet(hist)
      .select("vec_id").as[Long].collect().toSet
    check(histIds == keptIds,
      s"history == kept (${(histIds diff keptIds).size} extra, ${(keptIds diff histIds).size} missing)")
    val dirs = new java.io.File(hist).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id=")).length
    check(dirs <= 8 && folded >= 9, s"compaction bounded: $dirs dirs, $folded folded")

    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val early = median(secs.slice(2, 7).toSeq)
    val late = median(secs.slice(batches - 5, batches).toSeq)
    check(late <= 4.0 * math.max(early, 0.5),
      f"flat wall: early median $early%.2f s, late median $late%.2f s (<= 4x)")

    println(f"rate=$n/batch batches=$batches early=$early%.2f late=$late%.2f " +
      f"max=${secs.max}%.2f total=${secs.sum}%.1f s")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
