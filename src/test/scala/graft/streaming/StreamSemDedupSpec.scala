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
      // batch 1: doc 20 near-copies doc 10 (history); doc 21 on axis2 (new)
      in.addData(Seq((20L, jitter(axes(0), 0.2)), (21L, axes(2))).toIndexedSeq)
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

    // history holds exactly the survivors, cell-partitioned per batch dir
    val kept = spark.read.option("basePath", hist).parquet(hist)
    assert(kept.select("vec_id").as[Long].collect().toSet == Set(10L, 12L, 21L))
    assert(kept.columns.contains("cell") && kept.columns.contains("batch_id"))
    val dirs = new java.io.File(s"$hist/batch_id=0").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell=")),
      s"history must be cell-partitioned: ${dirs.mkString(",")}")
  }
}
