package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.KmeansCodebook

/** StreamAssign: streaming cell ids/scores are bit-identical to the
  * batch assignment over the same codebook, arrive map-only (stateless
  * append — no state store rows in progress), and partitioned-by-cell
  * output is exactly the inverted-file append the batch probes read.
  */
class StreamAssignSpec extends SparkSpec {
  import spark.implicits._

  // deterministic little corpus: 30 vectors, dim 4
  private def emb = spark.range(30)
    .select(col("id").as("vec_id"),
      array((0 until 4).map(d =>
        ((col("id") * 7 + d * 3) % 11 - 5).cast("double")): _*).as("vec"))

  test("streaming assignment == batch assignment, stateless, bit-identical") {
    val cb = KmeansCodebook.train(emb, k = 5, iters = 2)
    val cells = StreamAssign.cellsOf(cb)
    assert(cells.map(_._1) == cells.map(_._1).sorted, "cellsOf keeps cb_id order")

    // batch truth: the q34 shape (crossJoin broadcast + bestByName)
    val batch = emb.crossJoin(broadcast(cb))
      .withColumn("b", KmeansCodebook.bestByName(spark, "vec", "cbs"))
      .select(col("vec_id"), col("b.id").as("cell"), col("b.d").as("cell_score"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Double])]
    val stream = in.toDF().toDF("vec_id", "vec")
    val assigned = StreamAssign.assign(stream, cells)
    assert(assigned.isStreaming, "assignment must not break the streaming plan")
    val q = assigned.writeStream.format("memory").queryName("stream_assign")
      .outputMode("append").start()
    try {
      val rows = emb.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      in.addData(rows.take(17).toIndexedSeq)
      in.addData(rows.drop(17).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("stream_assign")
        .select(col("vec_id"), col("cell"), col("cell_score"))
        .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
      assert(got == batch, "streaming cells/scores must equal the batch assignment")
      // stateless: no state-store rows after processing (map-only, no
      // dropDuplicates/aggregation snuck into the plan)
      val p = q.lastProgress
      assert(p == null || p.stateOperators.isEmpty,
        s"expected a stateless query, got state operators: $p")
    } finally q.stop()

    // partitioned-by-cell sink: the inverted-file append a probe prunes to
    val out = java.nio.file.Files.createTempDirectory("stream_assign_idx").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_assign_ck").toString
    val in2 = MemoryStream[(Long, Seq[Double])]
    val q2 = StreamAssign.assign(in2.toDF().toDF("vec_id", "vec"), cells)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).partitionBy("cell")
      .outputMode("append").start()
    try {
      in2.addData(emb.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toIndexedSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("cell=\\d+")),
      s"expected cell= partition dirs, got: ${dirs.mkString(",")}")
    val reread = spark.read.parquet(out)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    assert(reread == batch.map { case (id, (c, _)) => (id, c) },
      "partitioned re-read must reproduce every assignment")
  }
}
