package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec
import graft.io.Rollup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Micro-batch rows/sec floors for the streaming operators — the
  * streaming twin of ExpressionThroughputSpec: plan-shape audits cannot
  * catch a per-ROW cost bug (the q79 class — per-row state
  * deserialization ran at ~600 rows/s with a perfect plan), and the
  * batch suite never drives these operators through the micro-batch
  * engine. Floors sit ~10-20× below healthy local throughput: loose
  * enough for shared-box noise (plus min-of-two batches), tight enough
  * that any per-row pathology in digesting, state lookup, the per-batch
  * as-of join, or partial aggregation fails `sbt test` rather than a
  * round's bench.
  *
  * Method: one small warmup batch (stream start, codegen, state store
  * init — all fixed costs), then two identical large batches, each timed
  * over `processAllAvailable`; assert on the MIN (same methodology as
  * the bench and ExpressionThroughputSpec).
  */
class StreamingThroughputSpec extends SparkSpec {
  import spark.implicits._

  private val Rows = 60000

  private def floorCheck(name: String, perBatchRows: Int, secs: Seq[Double],
      floorRowsPerSec: Double): Unit = {
    val best = secs.min
    val rate = perBatchRows / math.max(best, 1e-9)
    assert(rate >= floorRowsPerSec,
      f"$name: $rate%.0f rows/s is below the $floorRowsPerSec%.0f floor " +
        f"($perBatchRows rows, best ${best}%.2f s) — per-row cost regressed")
  }

  private def ts(minute: Int) = new Timestamp(1767225600000L + minute * 60000L)

  test("StreamDedup.dedupWithinWatermark ≥ 10k rows/s per micro-batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val out = StreamDedup.dedupWithinWatermark(in.toDF(), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd_tp").outputMode("append").start()
    try {
      in.addData(DocEvent(0, "warmup", ts(0))); q.processAllAvailable()
      val secs = (1 to 2).map { b =>
        // distinct texts so state grows like real traffic, disjoint per batch
        in.addData((1 to Rows).map(i => DocEvent(i.toLong, s"doc b$b n$i", ts(b))): _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      floorCheck("dedupWithinWatermark", Rows, secs, 10000)
    } finally q.stop()
  }

  test("RollupSink partial append ≥ 10k rows/s per micro-batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("rollup_tp").toString
    val spec = Rollup.Spec(groupKeys = Seq("seg"), sumCols = Seq("v"), distinctCols = Seq("u"))
    val in = MemoryStream[SaleEvent]
    val q = RollupSink.writer(in.toDS(), dir, spec)
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      in.addData(SaleEvent("w", 1.0, 1L)); q.processAllAvailable()
      val secs = (1 to 2).map { b =>
        in.addData((1 to Rows).map(i => SaleEvent(s"s${i % 32}", i / 4.0, (b * Rows + i).toLong)): _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      floorCheck("RollupSink", Rows, secs, 10000)
    } finally q.stop()
  }

  test("StreamAsOf per-batch enrichment ≥ 10k rows/s per micro-batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("asof_tp").toString
    // a 500-version dimension timeline, re-resolved per batch
    val dim = (1 to 500).map(i => (i.toLong % 50, ts(i), s"v$i")).toDF("dk", "vts", "dval")
    val in = MemoryStream[DocEvent]
    val q = StreamAsOf.writer(
        in.toDF().selectExpr("doc_id % 50 AS k", "ts", "doc_id"),
        _ => dim, dir,
        leftKeyCols = Seq("k"), rightKeyCols = Seq("dk"),
        leftTimeCol = "ts", rightTimeCol = "vts")
      .option("checkpointLocation", s"$dir/_ckpt").start()
    try {
      in.addData(DocEvent(0, "warmup", ts(600))); q.processAllAvailable()
      val secs = (1 to 2).map { b =>
        in.addData((1 to Rows).map(i => DocEvent(i.toLong, "", ts(600 + b))): _*)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      floorCheck("StreamAsOf", Rows, secs, 10000)
    } finally q.stop()
  }

  test("StreamAssign cell routing ≥ 10k rows/s per micro-batch") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // production geometry: 64 cells x 64 dims — the K*dim argmax is the
    // per-row cost a regression (e.g. per-row codebook rebuild) would
    // inflate
    val cells = (0 until 64).map(c =>
      (c, (0 until 64).map(d => ((c * 31 + d * 7) % 17 - 8).toDouble)))
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamAssign.assign(in.toDF().toDF("vec_id", "vec"), cells)
      .writeStream.format("memory").queryName("sa_tp").outputMode("append").start()
    try {
      in.addData((0L, (0 until 64).map(_.toDouble))); q.processAllAvailable()
      val secs = (1 to 2).map { b =>
        in.addData((1 to Rows).map(i =>
          ((b * Rows + i).toLong,
            (0 until 64).map(d => ((i * 13 + d) % 23 - 11).toDouble))).toIndexedSeq)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      floorCheck("StreamAssign", Rows, secs, 10000)
    } finally q.stop()
  }
}
