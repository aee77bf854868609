package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.functions.NumFunctions.r4
import graft.functions.{SimilarityFunctions => Sim}
import graft.queries.Extensions

/** Streaming SemDeDup — the streaming twin of q90: embedding near-dup
  * suppression for a continuously-ingesting corpus, with per-batch work
  * bounded by the SAME two levers as the batch operator (cells +
  * per-doc candidate caps), composed from pieces that already carry
  * those contracts:
  *
  *   1. [[StreamAssign.assign]] routes each arriving doc to its trained
  *      codebook cell — map-only, stateless.
  *   2. WITHIN-BATCH pairing reuses q90's banded cell join verbatim
  *      ([[Extensions.semdedupFromCells]]): every doc checks ≤ cap
  *      immediately-preceding (by id rank) cell-mates, never |cell|².
  *   3. AGAINST-HISTORY pairing joins the batch to the kept-doc history
  *      on cell equality — and because history is laid out
  *      `batch_id=N/cell=C`, the read is PARTITION-PRUNED to the
  *      batch's touched cells: a micro-batch touching 5 of 4096 cells
  *      reads 5/4096ths of the index, not the corpus. Candidates are
  *      capped per cell at the `cap` most RECENT (highest-id) kept
  *      docs, so join volume is ≤ cap·|batch| no matter how hot a cell
  *      runs — the recency-directed analogue of the batch operator's
  *      rank-band cap, with the matching miss class (a dup of only a
  *      doc older than the cell's last `cap` survivors passes).
  *   4. Survivors append via the [[BatchIdSink]] layout (one
  *      `batch_id=<id>` dir per batch, mode overwrite) — layout-
  *      idempotent, so a crash-replayed batch REPLACES its own partial
  *      output; the history join filters `batch_id < current`, so a
  *      replay never sees its own half-written rows as history.
  *
  * A doc is a duplicate when it matches (cosine ≥ τ) a recent KEPT
  * history cell-mate or any earlier (lower-id) doc in its own batch;
  * `dup_of` is the
  * lowest matching id — so every dup points at a doc that is either in
  * the history or earlier in the same batch, and ids must be globally
  * unique and arrival-monotone for "earlier" to be meaningful.
  * Mirrors q90's min-id convention; differs from batch q90 only in
  * that CROSS-BATCH matches are always against kept docs (the batch
  * operator ranks dups among its candidates too), i.e. `dup_of` names
  * a canonical survivor.
  *
  * History growth is #batches × touched cells of small parquet files;
  * [[compactHistory]] folds committed batch dirs periodically — the
  * cell partition column survives compaction, and pruning with it.
  *
  * The history path is bound to ONE checkpoint lineage: batch ids must
  * stay monotone for both the replay fence and the batch_id layout
  * (a fresh checkpoint restarts ids at 0, which would both hide all
  * existing history from the fence and overwrite its dirs on id
  * collision). Restart the stream with its checkpoint — standard
  * streaming practice, the checkpoint IS the query identity — or
  * start a new history.
  */
object StreamSemDedup {

  /** `cap` sentinel: derive the per-batch candidate cap from the data —
    * [[Extensions.semDedupCap]] of the CURRENT corpus size (kept-doc
    * history + this batch), re-measured every micro-batch. The batch
    * operator's cap is a function of its corpus row count; the streaming
    * corpus grows, so its cap must grow with it rather than sit at a
    * compile-time constant (the r9 "fixed 128 fallback" finding). The
    * history size is one metadata-cheap parquet count over the kept-doc
    * index (footer row counts — compaction keeps the file count bounded).
    */
  val CapAuto: Int = -1

  /** The cap a batch actually runs with: explicit wins; [[CapAuto]]
    * derives from the corpus size at this batch. Pure — pinned directly
    * by StreamSemDedupSpec alongside the e2e parity case.
    */
  def effectiveCap(cap: Int, historyN: Long, batchN: Long): Int =
    if (cap > 0) cap else Extensions.semDedupCap(historyN + batchN)

  /** Per-doc annotation columns: `cell`, `dup_of` (null = kept),
    * `n_dups` (matches found), `max_sim`. Kept docs' (id, vec, cell)
    * append to `historyPath`; the full annotated batch writes to
    * `outPath` — both in the batch_id layout.
    */
  def writer(stream: DataFrame, cells: Seq[(Int, Seq[Double])],
      historyPath: String, outPath: String, tau: Double,
      cap: Int = CapAuto,
      idCol: String = "vec_id", vecCol: String = "vec"): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      processBatch(batch.toDF(), batchId, cells, historyPath, outPath,
        tau, cap, idCol, vecCol)
      ()
    }

  /** The per-micro-batch body, extracted so StreamSemDedupSpec can
    * invoke a REPLAY directly (same batchId twice) and pin that the
    * fence + overwrite layout make it idempotent — same annotations,
    * same history, no duplicates.
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      cells: Seq[(Int, Seq[Double])], historyPath: String, outPath: String,
      tau: Double, cap: Int, idCol: String, vecCol: String): Unit = {
      val s = batch.sparkSession
      if (!batch.isEmpty) {
        // one source read + argmax pass, shared by the touched-cells
        // collect, both pairing paths, and the final annotate join
        val assigned = StreamAssign.assign(batch.toDF(), cells, vecCol)
          .select(col(idCol).as("vec_id"), col(vecCol).as("vec"), col("cell"))
          .localCheckpoint(eager = true)
        val fs = new Path(historyPath)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        // absent OR still-empty (a pre-created dir with no batch output
        // yet would fail parquet schema inference)
        val hasHistory = fs.exists(new Path(historyPath)) &&
          fs.listStatus(new Path(historyPath))
            .exists(_.getPath.getName.startsWith("batch_id="))
        // CapAuto: the corpus at this batch = kept history (replay fence
        // applied, so a re-run sizes identically) + the batch itself.
        // Counting the checkpointed batch is free; the history count is
        // parquet footer metadata.
        val effCap =
          if (cap > 0) cap
          else {
            val histN = if (!hasHistory) 0L
              else s.read.option("basePath", historyPath).parquet(historyPath)
                .filter(col("batch_id") < batchId).count()
            effectiveCap(cap, histN, assigned.count())
          }
        // q90's banded within-batch pairing: (vec_id, dup_of, n_dups, max_sim)
        val intra = Extensions.semdedupFromCells(s, assigned, effCap, tau)
          .withColumnsRenamed(Map(
            "dup_of" -> "b_dup", "n_dups" -> "b_n", "max_sim" -> "b_sim"))
        // ≤ K ints — C1 scalar collect. A null-vec doc has a null cell
        // (argmax_dot null-propagates): it can match nothing (null joins
        // nothing, cosine with null is null), so it is annotated kept and
        // appended under the null partition — the q90 outcome for the
        // same row — and contributes no touched cell.
        val touched = assigned.select("cell").distinct().collect()
          .flatMap(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
        val inter =
          if (!hasHistory || touched.isEmpty) null
          else {
            // Bound the history half exactly like the batch half: each
            // batch doc compares against ≤ cap history cell-mates — the
            // cap HIGHEST-id (most recent) kept docs per touched cell,
            // ranked over the partition-pruned read (touched cells only,
            // so the window sees a sliver of the index). Without this the
            // per-batch cost would grow linearly with a hot cell's
            // history; with it, join volume ≤ cap·|batch| — the
            // SemDedupNeighborCap contract, recency-directed.
            val recent = s.read.option("basePath", historyPath).parquet(historyPath)
              .filter(col("batch_id") < batchId) // a replay's own rows are not history
              .filter(col("cell").isin(touched: _*))
              .select(col("vec_id").as("h_id"), col("vec").as("h_vec"), col("cell"))
              .withColumn("hrn", row_number().over(
                org.apache.spark.sql.expressions.Window
                  .partitionBy(col("cell")).orderBy(col("h_id").desc)))
              .filter(col("hrn") <= effCap)
              .drop("hrn")
            recent
              .join(assigned.hint("broadcast"), Seq("cell"))
              .withColumn("sim", Sim.cosine(col("vec"), col("h_vec")))
              .filter(col("sim") >= tau)
              .groupBy(col("vec_id"))
              .agg(min(col("h_id")).as("h_dup"), count(lit(1)).as("h_n"),
                r4(max(col("sim"))).as("h_sim"))
          }
        val joined0 = assigned.join(intra, Seq("vec_id"), "left")
        val joined = if (inter == null)
          joined0.withColumn("h_dup", lit(null).cast("bigint"))
            .withColumn("h_n", lit(null).cast("bigint"))
            .withColumn("h_sim", lit(null).cast("double"))
        else joined0.join(inter, Seq("vec_id"), "left")
        val annotated = joined.select(
          col("vec_id"), col("vec"), col("cell"),
          least(col("b_dup"), col("h_dup")).as("dup_of"),
          (coalesce(col("b_n"), lit(0L)) + coalesce(col("h_n"), lit(0L))).as("n_dups"),
          greatest(col("b_sim"), col("h_sim")).as("max_sim"))
          .localCheckpoint(eager = true) // one computation feeds both writes
        annotated.drop("vec")
          .write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
        annotated.filter(col("dup_of").isNull)
          .select(col("vec_id"), col("vec"), col("cell"))
          .write.mode("overwrite").partitionBy("cell")
          .parquet(s"$historyPath/batch_id=$batchId")
      }
  }

  /** Fold all history batch dirs with `batch_id <= upToBatchId` into the
    * single SMALLEST such dir — the answer to the layout's growth mode
    * (#batches × touched-cells small files), keeping both contracts:
    * cell partitioning survives (so partition pruning does), and the
    * compacted rows carry a batch_id strictly below any batch the
    * stream can still replay, so the `batch_id < current` fence is
    * untouched. Call with `upToBatchId` ≤ the last COMMITTED batch id
    * minus one (Structured Streaming can only replay the batch after
    * the last checkpoint commit); single writer, stream idle or not —
    * a reader mid-batch sees either layout, same rows.
    *
    * Crash-safe via the [[graft.io.AtomicPublish]] swap: the merged
    * image is staged (hidden dir — invisible to readers), published
    * over the min dir park-then-rename, and only then are the other
    * source dirs deleted. A crash after publish but before the deletes
    * leaves duplicate rows (n_dups inflation only — dup_of is a min,
    * stable under duplicates) that the next compaction self-heals via
    * its dropDuplicates pass. Returns the number of dirs folded away.
    */
  private val ParkedPrefix = ".compact.parked."

  def compactHistory(spark: org.apache.spark.sql.SparkSession,
      historyPath: String, upToBatchId: Long): Int = {
    val root = new Path(historyPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    // Recover an interrupted publish FIRST, before listing: the parked
    // dir's NAME carries the batch dir it was parked from (a fixed
    // parked name would orphan the survivor if a later run computed a
    // different min dir and replace() then deleted the "stale" park —
    // silent loss of a whole batch dir). Restore it if its original is
    // missing; drop it as stale if the original is live.
    fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(ParkedPrefix)).foreach { pk =>
        val orig = new Path(root, pk.getName.stripPrefix(ParkedPrefix))
        if (!fs.exists(orig)) fs.rename(pk, orig) else fs.delete(pk, true)
      }
    val dirs = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch_id="))
      .map(p => (p.getName.stripPrefix("batch_id=").toLong, p))
      .filter(_._1 <= upToBatchId).sortBy(_._1)
    if (dirs.length < 2) return 0
    val target = dirs.head._2
    val parked = new Path(root, s"$ParkedPrefix${target.getName}")
    val staging = new Path(root, ".compact.staging")
    fs.delete(staging, true)
    spark.read.option("basePath", historyPath)
      .parquet(dirs.map(_._2.toString): _*)
      .select(col("vec_id"), col("vec"), col("cell"))
      .dropDuplicates("vec_id") // self-heals a crashed previous compaction
      .repartition(col("cell")) // one file per cell after partitionBy
      .write.mode("overwrite").partitionBy("cell").parquet(staging.toString)
    if (!fs.exists(new Path(staging, "_SUCCESS")))
      throw new java.io.IOException(s"compactHistory: $staging has no _SUCCESS marker")
    graft.io.AtomicPublish.replace(fs, staging, target, parked, "StreamSemDedup.compactHistory")
    dirs.tail.foreach { case (_, p) => fs.delete(p, true) }
    dirs.length - 1
  }
}
