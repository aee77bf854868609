package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.plans.{AsOf, AsOfBackward, AsOfDirection}

/** Streaming point-in-time enrichment: every micro-batch of events is
  * as-of joined (graft.plans.AsOf — the native operator) against a
  * versioned dimension that is RE-RESOLVED each batch, so an event picks
  * the dimension version in force at its event time and dimension updates
  * between triggers are visible to the next batch without restarting the
  * query. This is the streaming form of the batch point-in-time lookup
  * (the inquiry-date probes over SCD2 history, reference
  * `Silver Layer.py:86-118`), built on foreachBatch because the match is
  * against a TABLE's timeline, not a second stream's watermarked window
  * (cf. [[StreamJoin]] for stream-stream).
  *
  * Scale shape: a micro-batch is small and the dimension's CURRENT
  * timeline is dimension-sized, so the planner takes the broadcast as-of
  * path (zero shuffle of either side per trigger — the batch is scanned in
  * place, the dimension rides one broadcast). A dimension too large to
  * broadcast falls back to the co-partitioned merge path per batch; at
  * that size pre-bucket the dimension on the join keys.
  *
  * Exactly-once: the [[BatchIdSink]] layout contract — each batch writes
  * its own `batch_id=<id>` dir with overwrite, so crash-replays replace
  * rather than duplicate (StreamReplaySpec pins the equivalent window for
  * the other sinks).
  */
object StreamAsOf {

  /** Attach an enriching parquet sink to an event stream.
    *
    * @param dim re-resolved once per micro-batch (e.g. a fresh read of the
    *            dimension snapshot / SCD2 current partition)
    */
  def writer(
      stream: Dataset[_],
      dim: SparkSession => DataFrame,
      path: String,
      leftKeyCols: Seq[String],
      rightKeyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightTieCols: Seq[String] = Nil,
      direction: AsOfDirection = AsOfBackward,
      leftOuter: Boolean = true): DataStreamWriter[Row] =
    stream.toDF().writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val enriched = AsOf.join(batch.toDF(), dim(batch.sparkSession),
        leftKeyCols, rightKeyCols, leftTimeCol, rightTimeCol, rightTieCols,
        direction, leftOuter)
      enriched.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      ()
    }

  /** All enriched batches, `batch_id` as a partition column. */
  def readAll(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
