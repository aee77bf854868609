package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Idempotent-by-construction foreachBatch parquet sink — the exactly-once
  * building block the streaming sinks rest on.
  *
  * Structured Streaming guarantees each micro-batch a stable `batchId`
  * across crash-replays (the offset log fixes the batch's contents before
  * the sink runs). Exactly-once output therefore only needs the SINK to be
  * idempotent per (batchId, data): this one writes every batch into its own
  * `batch_id=<id>` partition dir with mode overwrite, so a replayed batch
  * — same id, same contents — REPLACES its previous (possibly partial)
  * output instead of duplicating it. A crash between the write and the
  * checkpoint commit costs a rewrite, never a duplicate or a loss.
  *
  * The same contract is what makes [[Scd2Sink]] exactly-once: its merge is
  * value-idempotent (re-merging identical rows is "unchanged"), where this
  * sink is layout-idempotent. Crash-replay of both is pinned by
  * StreamReplaySpec.
  */
object BatchIdSink {

  def writer(stream: Dataset[_], path: String): DataStreamWriter[Row] =
    stream.toDF().writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      ()
    }

  /** All batches, with the originating `batch_id` as a partition column. */
  def readAll(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
