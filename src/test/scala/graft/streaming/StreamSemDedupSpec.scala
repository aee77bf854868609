package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.KmeansCodebook

/** StreamSemDedup: within-batch dups point at the lowest earlier
  * cell-mate (q90 semantics), cross-batch dups point at the kept
  * history doc, uniques survive, history holds only survivors
  * (cell-partitioned under batch_id dirs), and a replayed batch id
  * never sees its own rows as history.
  */
class StreamSemDedupSpec extends SparkSpec {
  import spark.implicits._

  // four well-separated directions in R^4 -> 4 clean cells
  private val axes = Seq(
    Seq(10.0, 0.0, 0.0, 0.0), Seq(0.0, 10.0, 0.0, 0.0),
    Seq(0.0, 0.0, 10.0, 0.0), Seq(0.0, 0.0, 0.0, 10.0))

  private def jitter(axis: Seq[Double], eps: Double): Seq[Double] =
    axis.zipWithIndex.map { case (v, i) => v + (if (v == 0.0) eps * (i + 1) else 0.0) }

  private lazy val cells = {
    val emb = axes.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "vec")
    StreamAssign.cellsOf(KmeansCodebook.train(emb, k = 4, iters = 1))
  }

  test("within-batch + cross-batch dedup with partition-pruned history") {
    val out = java.nio.file.Files.createTempDirectory("ssd_out").toString
    val hist = java.nio.file.Files.createTempDirectory("ssd_hist").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssd_ck").toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamSemDedup.writer(in.toDF().toDF("vec_id", "vec"), cells,
      hist, out, tau = 0.9)
      .option("checkpointLocation", ckpt).outputMode("update").start()
    try {
      // batch 0: doc 10 on axis0; doc 11 a near-copy of 10 (same batch);
      // doc 12 on axis1 (unique)
      in.addData(Seq(
        (10L, axes(0)), (11L, jitter(axes(0), 0.1)), (12L, axes(1))).toIndexedSeq)
      q.processAllAvailable()
      // batch 1: doc 20 near-copies doc 10 (history); doc 21 on axis2
      // (new); doc 22 has a NULL embedding (null cell — must not crash
      // the touched-cells collect, is kept, matches nothing)
      in.addData(Seq((20L, jitter(axes(0), 0.2)), (21L, axes(2)),
        (22L, null: Seq[Double])).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    val ann = spark.read.parquet(out)
      .select("vec_id", "dup_of", "n_dups")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2))).toMap

    assert(ann(10L) == ((None, 0L)), s"doc 10 is the original: ${ann(10L)}")
    assert(ann(11L)._1 == Some(10L), s"within-batch dup must point at 10: ${ann(11L)}")
    assert(ann(12L)._1 == None)
    assert(ann(20L)._1 == Some(10L), s"cross-batch dup must point at kept doc 10: ${ann(20L)}")
    assert(ann(21L)._1 == None)
    assert(ann(22L)._1 == None, s"null-embedding doc is kept, not crashed on: ${ann(22L)}")

    // history holds exactly the survivors, cell-partitioned per batch dir
    val kept = spark.read.option("basePath", hist).parquet(hist)
    assert(kept.select("vec_id").as[Long].collect().toSet == Set(10L, 12L, 21L, 22L))
    assert(kept.columns.contains("cell") && kept.columns.contains("batch_id"))
    val dirs = new java.io.File(s"$hist/batch_id=0").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell=")),
      s"history must be cell-partitioned: ${dirs.mkString(",")}")
  }

  test("history candidates are capped at the cap most recent kept cell-mates") {
    // two kept docs in one cell: 30 on axis3, 31 at 0.8 cosine to it
    // (same argmax cell, below tau=0.9 so both survive)
    val v30 = axes(3)
    val v31 = Seq(0.0, 0.0, 6.0, 8.0)
    val probe = jitter(axes(3), 0.05) // ~1.0 cosine to 30, ~0.8 to 31

    def run(cap: Int): Option[Long] = {
      val out = java.nio.file.Files.createTempDirectory(s"ssd_cap${cap}_o").toString
      val hist = java.nio.file.Files.createTempDirectory(s"ssd_cap${cap}_h").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"ssd_cap${cap}_c").toString
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, Seq[Double])]
      val q = StreamSemDedup.writer(in.toDF().toDF("vec_id", "vec"), cells,
        hist, out, tau = 0.9, cap = cap)
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        in.addData(Seq((30L, v30), (31L, v31)).toIndexedSeq)
        q.processAllAvailable()
        in.addData(Seq((40L, probe)).toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      val r = spark.read.parquet(out).filter(col("vec_id") === 40L)
        .select("dup_of").head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }

    // cap=2: both history cell-mates considered -> dup of 30 found
    assert(run(2) == Some(30L))
    // cap=1: only the most RECENT survivor (31, cosine 0.8 < tau) is a
    // candidate -> the older match is invisible: the documented miss
    // class of the recency cap, proving the cap binds
    assert(run(1) == None)
  }

  test("CapAuto derives the cap from history size and tracks its growth") {
    import graft.queries.Extensions
    // the pure derivation: explicit wins; auto = semDedupCap(history+batch),
    // which FOLLOWS the corpus as it grows instead of pinning 128
    assert(StreamSemDedup.effectiveCap(7, 1000000L, 10L) === 7)
    assert(StreamSemDedup.effectiveCap(StreamSemDedup.CapAuto, 0L, 100L) ===
      Extensions.semDedupCap(100L))
    val small = StreamSemDedup.effectiveCap(StreamSemDedup.CapAuto, 1000L, 50L)
    val big = StreamSemDedup.effectiveCap(StreamSemDedup.CapAuto, 1000000L, 50L)
    assert(small === Extensions.semDedupCap(1050L))
    assert(big === Extensions.semDedupCap(1000050L))
    assert(big > small, "cap must grow with the kept-doc history")

    // e2e: an auto-cap stream annotates identically to one run with the
    // equivalent explicit cap (batch/stream parity of the derivation) —
    // batch 1 has no history (N = 2), batch 2 sees history 2 + batch 1
    def run(cap: Int): Seq[(Long, Option[Long])] = {
      val out = java.nio.file.Files.createTempDirectory(s"ssd_auto${cap}_o").toString
      val hist = java.nio.file.Files.createTempDirectory(s"ssd_auto${cap}_h").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"ssd_auto${cap}_c").toString
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[(Long, Seq[Double])]
      val q = StreamSemDedup.writer(in.toDF().toDF("vec_id", "vec"), cells,
        hist, out, tau = 0.9, cap = cap)
        .option("checkpointLocation", ckpt).outputMode("update").start()
      try {
        in.addData(Seq((10L, axes(0)), (11L, axes(1))).toIndexedSeq)
        q.processAllAvailable()
        in.addData(Seq((20L, jitter(axes(0), 0.05)), (21L, axes(2))).toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(out).select("vec_id", "dup_of").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSeq.sortBy(_._1)
    }
    val auto = run(StreamSemDedup.CapAuto)
    val explicit = run(Extensions.semDedupCap(4L)) // == the auto cap at this size
    assert(auto === explicit)
    assert(auto.toMap.apply(20L) === Some(10L), "cross-batch dup must still resolve")
  }

  test("compactHistory folds committed dirs; the restarted stream dedups against them") {
    val out = java.nio.file.Files.createTempDirectory("ssd_cmp_o").toString
    val hist = java.nio.file.Files.createTempDirectory("ssd_cmp_h").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ssd_cmp_c").toString
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    def start() = StreamSemDedup.writer(in.toDF().toDF("vec_id", "vec"), cells,
      hist, out, tau = 0.9)
      .option("checkpointLocation", ckpt).outputMode("update").start()
    val q1 = start()
    try {
      in.addData(Seq((50L, axes(0)), (51L, axes(1))).toIndexedSeq) // batch 0
      q1.processAllAvailable()
      in.addData(Seq((52L, axes(2))).toIndexedSeq)                 // batch 1
      q1.processAllAvailable()
      in.addData(Seq((53L, axes(3))).toIndexedSeq)                 // batch 2
      q1.processAllAvailable()
    } finally q1.stop()

    def batchDirs = new java.io.File(hist).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(batchDirs == Seq("batch_id=0", "batch_id=1", "batch_id=2"))

    // last committed = 2, so up to 1 is safely non-replayable
    assert(StreamSemDedup.compactHistory(spark, hist, upToBatchId = 1) == 1)
    assert(batchDirs == Seq("batch_id=0", "batch_id=2"))
    val kept = spark.read.option("basePath", hist).parquet(hist)
    assert(kept.select("vec_id").as[Long].collect().toSet == Set(50L, 51L, 52L, 53L))
    assert(new java.io.File(s"$hist/batch_id=0").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("cell=")),
      "cell partitioning must survive compaction")

    // same checkpoint => ids continue; the new batch dedups against the
    // COMPACTED dir
    val q2 = start()
    try {
      in.addData(Seq((60L, jitter(axes(0), 0.05))).toIndexedSeq)   // batch 3
      q2.processAllAvailable()
    } finally q2.stop()
    val r = spark.read.parquet(out).filter(col("vec_id") === 60L)
      .select("dup_of").head()
    assert(!r.isNullAt(0) && r.getLong(0) == 50L,
      s"post-compaction dedup must still find doc 50: $r")

    // fold the rest of the committed range (batch 3 — the dup's empty
    // survivor dir — is the latest batch and stays outside upTo)
    assert(StreamSemDedup.compactHistory(spark, hist, upToBatchId = 2) == 1)
    assert(batchDirs == Seq("batch_id=0", "batch_id=3"))
    val after = spark.read.option("basePath", hist).parquet(hist)
    assert(after.select("vec_id").as[Long].collect().toSet == Set(50L, 51L, 52L, 53L))
    // no-op when there is nothing to fold
    assert(StreamSemDedup.compactHistory(spark, hist, upToBatchId = 0) == 0)
  }

  test("replaying a batch id is idempotent: same annotations, same history, no self-reads") {
    val out = java.nio.file.Files.createTempDirectory("ssd_rep_o").toString
    val hist = java.nio.file.Files.createTempDirectory("ssd_rep_h").toString
    def snap() = (
      spark.read.parquet(s"$out/batch_id=1").select("vec_id", "dup_of", "n_dups")
        .collect().map(_.toString).sorted.toSeq,
      spark.read.option("basePath", hist).parquet(hist)
        .select("vec_id", "cell", "batch_id").collect().map(_.toString).sorted.toSeq)

    val b0 = Seq((70L, axes(0)), (71L, axes(1))).toDF("vec_id", "vec")
    val b1 = Seq((72L, jitter(axes(0), 0.05)), (73L, axes(2))).toDF("vec_id", "vec")
    StreamSemDedup.processBatch(b0, 0L, cells, hist, out, tau = 0.9,
      cap = 8, idCol = "vec_id", vecCol = "vec")
    StreamSemDedup.processBatch(b1, 1L, cells, hist, out, tau = 0.9,
      cap = 8, idCol = "vec_id", vecCol = "vec")
    val first = snap()
    // crash-replay of batch 1: identical contents, same id — the fence
    // must hide batch 1's own previous output (so 72 still dups to 70,
    // not to its own ghost) and the overwrite layout must not duplicate
    StreamSemDedup.processBatch(b1, 1L, cells, hist, out, tau = 0.9,
      cap = 8, idCol = "vec_id", vecCol = "vec")
    assert(snap() == first, "replay must be byte-for-byte idempotent")
    val d72 = spark.read.parquet(s"$out/batch_id=1")
      .filter(col("vec_id") === 72L).select("dup_of").head()
    assert(d72.getLong(0) == 70L, s"replayed 72 must still dup to history doc 70: $d72")
  }

  test("compactHistory recovers a crash-parked batch dir without losing rows") {
    val hist = java.nio.file.Files.createTempDirectory("ssd_rec_h").toString
    def writeBatch(id: Int, docs: Seq[(Long, Seq[Double], Int)]): Unit =
      docs.toDF("vec_id", "vec", "cell")
        .write.mode("overwrite").partitionBy("cell")
        .parquet(s"$hist/batch_id=$id")
    writeBatch(0, Seq((1L, axes(0), 0), (2L, axes(1), 1)))
    writeBatch(1, Seq((3L, axes(2), 2)))
    // simulate a crash between park and publish: batch_id=0 sits parked
    // under its self-describing name, its original gone
    val root = new java.io.File(hist)
    assert(new java.io.File(root, "batch_id=0")
      .renameTo(new java.io.File(root, ".compact.parked.batch_id=0")))
    // recovery restores it, then compaction folds both dirs — no loss
    assert(StreamSemDedup.compactHistory(spark, hist, upToBatchId = 1) == 1)
    val rows = spark.read.option("basePath", hist).parquet(hist)
      .select("vec_id").as[Long].collect().toSet
    assert(rows == Set(1L, 2L, 3L), s"parked rows must survive recovery: $rows")
    assert(!root.listFiles().exists(_.getName.startsWith(".compact.parked")),
      "stale park must be cleaned up")
  }
}
