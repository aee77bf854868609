package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.engine.KmeansCodebook
import graft.expressions.ArgmaxDot

/** Streaming IVF-cell assignment — continuous index INGESTION, the
  * streaming half of the train-once codebook contract
  * ([[graft.io.CodebookStore]] persists the cells; the batch family
  * q34/q53/q64/q90 queries them). New embeddings arrive as a stream and
  * join the inverted file by being routed to their argmax-dot cell;
  * writing the assigned stream out partitioned by `cell` IS the index
  * append (a later IVF search prunes to its probe cells' partitions).
  *
  * Plan shape: the codebook is captured ONCE at stream construction as a
  * foldable literal (k·dim doubles — 32 KB at k=64; the same size bound
  * as the batch one-row broadcast) and assignment is a per-row
  * [[graft.expressions.ArgmaxDot]] — a pure PROJECTION. No stream-static
  * join, no state store, no watermark, no shuffle: every micro-batch is
  * map-only, so throughput is scan-bound at any cluster width and the
  * query works in append mode with no output-mode caveats.
  *
  * Capture-once semantics are deliberate: an index's cells must NOT
  * drift mid-stream (candidates written under codebook A are
  * unreachable by probes routed under codebook B). Re-training is a
  * RESTART boundary — exactly FAISS's contract, where retraining
  * rebuilds the index — so the codebook rides the plan, not a
  * per-batch re-read. Cell ids/scores are bit-identical to the batch
  * assignment (same expression, same tie-break), pinned by
  * StreamAssignSpec.
  */
object StreamAssign {

  /** A collected codebook as a foldable literal column
    * (`array<struct<cb_id:int, cb_vec:array<double>>>`, sorted by cb_id
    * so the strict-`>` argmax keeps the batch family's lowest-id
    * tie-break).
    *
    * ONE `Literal` node carrying the whole value (`typedlit`), not one
    * `lit()` per double: at production cell counts (K ∝ √N, e.g. 2¹⁵
    * cells × 64 dims) a per-double tree is millions of expression nodes
    * the analyzer walks on EVERY micro-batch plan — planning cost that
    * would dominate the map-only execution. The cast only renames the
    * tuple's `_1/_2` struct fields (same physical types) and constant-
    * folds back into the single literal at optimization.
    */
  def literalCbs(cells: Seq[(Int, Seq[Double])]): Column =
    typedlit(cells.sortBy(_._1))
      .cast("array<struct<cb_id:int,cb_vec:array<double>>>")

  /** Collect a one-row codebook frame (the [[KmeansCodebook.train]] /
    * [[graft.io.CodebookStore.load]] shape: single `cbs` column) into
    * the literal form. One driver-side row of k·dim doubles — the C1
    * scalar-collect shape, not a data collect.
    */
  def cellsOf(cb: DataFrame): Seq[(Int, Seq[Double])] =
    cb.select(explode(col("cbs")).as("c"))
      .select(col("c.cb_id"), col("c.cb_vec"))
      .collect()
      // a corpus with null-vec rows trains a codebook carrying a
      // null-cb_id cell (the null assignments' centroid) — not a
      // routable cell; drop it rather than NPE at getInt
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq))
      .toSeq

  /** Assign each streaming row's `vecCol` to its codebook cell: adds
    * `cell` (int) and `cell_score` (double) — the exact column contract
    * of q34 and [[graft.io.CodebookStore.assign]], as a stateless
    * streaming projection.
    */
  def assign(stream: DataFrame, cells: Seq[(Int, Seq[Double])],
      vecCol: String = "vec"): DataFrame = {
    require(cells.nonEmpty, "StreamAssign: empty codebook")
    val b = GraftSqlBridge.column(ArgmaxDot(
      GraftSqlBridge.expression(col(vecCol)),
      GraftSqlBridge.expression(literalCbs(cells))))
    stream.withColumn("__b", b)
      .withColumn("cell", col("__b").getField("id"))
      .withColumn("cell_score", col("__b").getField("d"))
      .drop("__b")
  }

  /** [[assign]] against a one-row codebook frame (trained in this job or
    * loaded from [[graft.io.CodebookStore]]).
    */
  def assignFrom(stream: DataFrame, cb: DataFrame,
      vecCol: String = "vec"): DataFrame =
    assign(stream, cellsOf(cb), vecCol)
}
