package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class DocEvent(doc_id: Long, text: String, ts: Timestamp)

/** Streaming dedup contract: first copy emitted, horizon copies
  * suppressed, post-eviction copies re-emitted (bounded state is a
  * FEATURE, not a bug — full history belongs to the anti-join), and the
  * history anti-join exactly suppresses known digests while passing
  * novel ones.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("within-watermark: first copy out, near copies suppressed, evicted keys re-emit") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val out = StreamDedup.dedupWithinWatermark(in.toDF(), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd").outputMode("append").start()
    try {
      in.addData(
        DocEvent(1, "alpha text", t("2026-01-01 08:00:00")),
        DocEvent(2, "alpha text", t("2026-01-01 08:03:00")), // dup inside horizon
        DocEvent(3, "beta text", t("2026-01-01 08:01:00")))
      q.processAllAvailable()
      // advance the watermark far past 08:00 + 10min → digest state evicts
      in.addData(DocEvent(4, "gamma text", t("2026-01-01 12:00:00")))
      q.processAllAvailable()
      // the same content arriving AFTER eviction is a new row by design
      in.addData(DocEvent(5, "alpha text", t("2026-01-01 12:01:00")))
      q.processAllAvailable()
      val ids = spark.table("sd").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 3L, 4L, 5L),
        s"expected first copies + post-eviction re-emit, got $ids")
    } finally q.stop()
  }

  test("against history: known digests exactly suppressed, novel pass") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val seen = Seq("old doc one", "old doc two").toDF("text")
      .selectExpr("md5(text) AS digest")
    val in = MemoryStream[DocEvent]
    val out = StreamDedup.dedupAgainstHistory(in.toDF(), seen)
    val q = out.writeStream.format("memory").queryName("sh").outputMode("append").start()
    try {
      in.addData(
        DocEvent(1, "old doc one", t("2026-01-01 08:00:00")),
        DocEvent(2, "fresh doc", t("2026-01-01 08:01:00")),
        DocEvent(3, "old doc two", t("2026-01-01 08:02:00")),
        DocEvent(4, "another fresh", t("2026-01-01 08:03:00")))
      q.processAllAvailable()
      val ids = spark.table("sh").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(2L, 4L))
    } finally q.stop()
  }
}
