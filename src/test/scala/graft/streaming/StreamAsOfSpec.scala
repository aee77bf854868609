package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.plans.AsOf

case class TradeEvent(trade_id: Long, sym: String, ts: Timestamp)

/** Streaming point-in-time enrichment via the native as-of join: batch
  * parity per micro-batch, dimension updates visible to later batches,
  * and the batch_id layout contract.
  */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("micro-batches enrich against the dimension version in force") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dimDir = java.nio.file.Files.createTempDirectory("dim").toString
    val outDir = java.nio.file.Files.createTempDirectory("out").toString

    // Dimension timeline v1: price versions per symbol.
    Seq(
      (1L, "a", t("2026-01-01 00:00:00"), 10.0),
      (2L, "a", t("2026-01-01 12:00:00"), 11.0),
      (3L, "b", t("2026-01-01 00:00:00"), 20.0)
    ).toDF("ver_id", "d_sym", "eff_ts", "price")
      .write.mode("overwrite").parquet(dimDir)

    val trades = MemoryStream[TradeEvent]
    val q = StreamAsOf.writer(
      trades.toDF(),
      s => s.read.parquet(dimDir),
      outDir,
      Seq("sym"), Seq("d_sym"), "ts", "eff_ts", Seq("ver_id"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt").toString)
      .start()
    try {
      trades.addData(
        TradeEvent(101L, "a", t("2026-01-01 06:00:00")), // before v2 -> ver 1
        TradeEvent(102L, "a", t("2026-01-01 13:00:00")), // after v2  -> ver 2
        TradeEvent(103L, "c", t("2026-01-01 06:00:00"))) // no dim    -> null
      q.processAllAvailable()

      // Dimension evolves BETWEEN batches: a later version for b.
      Seq((4L, "b", t("2026-01-02 00:00:00"), 21.0))
        .toDF("ver_id", "d_sym", "eff_ts", "price")
        .write.mode("append").parquet(dimDir)
      trades.addData(
        TradeEvent(104L, "b", t("2026-01-02 06:00:00"))) // sees the new ver 4
      q.processAllAvailable()

      val rows = StreamAsOf.readAll(spark, outDir)
        .select("trade_id", "ver_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(rows == Map(101L -> 1L, 102L -> 2L, 103L -> -1L, 104L -> 4L))

      // Batch parity: the streamed result equals one batch as-of join of
      // the same events against the final dimension, EXCEPT where the
      // dimension changed after the event's batch ran (none here: ver 4
      // postdates trades 101-103's times, so backward matches agree).
      val batchRows = AsOf.join(
        Seq(
          (101L, "a", t("2026-01-01 06:00:00")),
          (102L, "a", t("2026-01-01 13:00:00")),
          (103L, "c", t("2026-01-01 06:00:00")),
          (104L, "b", t("2026-01-02 06:00:00"))
        ).toDF("trade_id", "sym", "ts"),
        spark.read.parquet(dimDir),
        Seq("sym"), Seq("d_sym"), "ts", "eff_ts", Seq("ver_id"))
        .select("trade_id", "ver_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(rows == batchRows)

      // Layout contract: per-batch dirs (exactly-once replay unit).
      val fs = new java.io.File(outDir).list().toSet
      assert(fs.exists(_.startsWith("batch_id=")))
    } finally q.stop()
  }
}
