package graft.streaming

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.io.Rollup

/** Streaming → incremental rollup state: every micro-batch aggregates
  * ONLY itself and appends its mergeable partials (count / decimal sums /
  * HLL sketches per group) under `batch=<batchId>`; any later dashboard
  * query is a [[Rollup.query]] merge-on-read with ZERO rescans of stream
  * history. The streaming twin of the q83 staged-sketch pattern, closing
  * the loop: ingest → per-batch KB-sized partials → any-time rollup.
  *
  * Exactly-once for free: Structured Streaming replays a failed batch
  * with the SAME batchId and contents (the offset log commits first),
  * and [[Rollup.append]] on an existing label REPLACES it — so a
  * crash-replay rewrites identical partials instead of double-counting,
  * the same idempotency contract as [[BatchIdSink]] (layout) and
  * [[Scd2Sink]] (values).
  *
  * Batch ids are zero-padded to 9 digits: [[Rollup.batches]] orders
  * labels lexicographically, and unpadded numbers would sort '10' before
  * '9'.
  */
object RollupSink {

  def writer(stream: Dataset[_], stateDir: String, spec: Rollup.Spec): DataStreamWriter[Row] =
    stream.toDF().writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      Rollup.append(batch.sparkSession, stateDir, f"$batchId%09d", batch.toDF(), spec)
      ()
    }
}
