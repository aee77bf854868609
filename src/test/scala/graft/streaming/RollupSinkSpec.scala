package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.io.Rollup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SaleEvent(seg: String, v: Double, u: Long)

/** Streamed partials merge to the same answer as aggregating all events
  * directly, batch labels order correctly, and a replayed batch (same
  * label, same content) does not double-count.
  */
class RollupSinkSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Rollup.Spec(
    groupKeys = Seq("seg"), sumCols = Seq("v"), distinctCols = Seq("u"))

  test("per-batch partials merge to the direct aggregation; replay is idempotent") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("rollupsink").toString
    val in = MemoryStream[SaleEvent]
    val q = RollupSink.writer(in.toDS(), dir, spec)
      .option("checkpointLocation", s"$dir/_ckpt").start()
    val b1 = (1 to 120).map(i => SaleEvent(s"s${i % 3}", i / 4.0, (i % 40).toLong))
    val b2 = (1 to 80).map(i => SaleEvent(s"s${i % 3}", i / 8.0, (i % 25).toLong))
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(Rollup.batches(spark, dir).size >= 2)
    val merged = Rollup.query(spark, dir, spec)
      .orderBy("seg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2), r.getLong(3))).toSeq
    val direct = (b1 ++ b2).toDF("seg", "v", "u")
      .groupBy($"seg").agg(
        count(lit(1)).as("count"),
        sum($"v".cast("decimal(28,6)")).as("sum_v"),
        hll_sketch_estimate(hll_sketch_agg($"u")).as("approx_distinct_u"))
      .orderBy("seg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2), r.getLong(3))).toSeq
    assert(merged === direct)
    // crash-replay: batch 0 re-appended with identical content replaces,
    // never double-counts
    val label0 = Rollup.batches(spark, dir).head
    Rollup.append(spark, dir, label0, b1.toDF("seg", "v", "u"), spec)
    val replayed = Rollup.query(spark, dir, spec)
      .orderBy("seg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2), r.getLong(3))).toSeq
    assert(replayed === direct)
  }
}
