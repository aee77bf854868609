package graft.tools

import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamSemDedup

/** Sustained-rate streaming e2e at an ARBITRARY rate — the scale twin of
  * StreamSustainedSpec (which pins the sf0.1 rate, 2,000 rows/batch, on
  * the shared local[4] test session). Same closed-form plant rules, same
  * invariants ([[SustainedLoad]]), own local[32] session, so the
  * per-batch walls measure the operator at the target rate instead of
  * the test harness:
  *
  *   StreamSustained [rowsPerBatch] [batches]   # default 20000 20 = sf1-rate
  *
  * Prints one line per batch (wall + planted/caught counts ride the final
  * summary), then PASS/FAIL per invariant; non-zero exit on any FAIL.
  * Results are pinned in SCALING.md (round 13: the sf1-rate decade).
  * For the same load under crash injection, see [[StreamCrashReplay]].
  */
object StreamSustained {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val batches = if (args.length > 1) args(1).toInt else 20
    // The id packing is batch*Stride+i: a row rate at or above the stride
    // would silently collide ids across batches and corrupt the very
    // mislabel/recall accounting this tool measures — fail loudly
    // (r13 ADVICE). A >=1M-row rate needs a wider stride AND new
    // closed-form plant rules, not a quiet wraparound.
    require(n > 0 && n < SustainedLoad.Stride,
      s"rowsPerBatch=$n out of range: id stride is ${SustainedLoad.Stride}")
    // Plant rules (old plants at batches 5/7), the three mid-stream
    // compaction points (4/9/14), and the folded>=9 / dirs<=8 invariant
    // are closed-form for a >=15-batch run; a shorter run would fail
    // the compaction check spuriously instead of testing a weaker
    // bound (r13 ADVICE).
    require(batches >= 15, s"batches=$batches < 15: the plant/compaction " +
      "invariants are closed-form for >= 15 batches")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

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

    val cells = SustainedLoad.trainCells(spark, n)

    implicit val ctx: SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamSemDedup.writer(in.toDF().toDF("vec_id", "vec"), cells,
      hist, out, tau = SustainedLoad.Tau)
      .option("checkpointLocation", ckpt).outputMode("update").start()

    val secs = new scala.collection.mutable.ArrayBuffer[Double]
    var folded = 0
    try {
      for (b <- 0 until batches) {
        in.addData((0 until n).map(i =>
          (SustainedLoad.id(b, i), SustainedLoad.vec(n)(b, i))))
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

    val failures = SustainedLoad.audit(spark, out, hist, n, batches,
      folded, foldedMin = 9, dirsMax = 8, secs = secs.toSeq)
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
