package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{NumFunctions, SimilarityFunctions => Sim}

/** Trained k-means coarse quantizer for the IVF/SemDeDup query family
  * (q34/q53/q64/q90) — the codebook the fixed ±1 hyperplanes stood in
  * for until round 7. Reference behavior: the SemDeDup paper's
  * cluster-then-pair blocking (Abbas et al. 2023, arXiv:2303.09540 §3)
  * and FAISS-style IVF coarse cells; cell count is a PARAMETER
  * (`Extensions.kmeansK(N)` = clamp(⌈√N⌉, 16, 65536), computed from the
  * embeddings row count per SCALING.md), not a constant of the plane
  * family.
  *
  * Everything here is engine-parity deterministic, because the trained
  * codebook feeds DuckDB-oracle-checked queries:
  *   - seed = the k lowest-id vectors (data-dependent, order-free);
  *   - assignment = argmax dot with strict `>`, so ties keep the LOWEST
  *     cb_id (the oracle's `ORDER BY dd DESC, cb_id`);
  *   - centroid means run through DECIMAL(28,14) sums (exact, merge-order
  *     independent — float sums are not associative) and are r4-rounded,
  *     so every iteration's codebook is bit-identical across engines and
  *     partitionings.
  *
  * Scale shape: training is `iters` passes of (map-only assign → one
  * ≤ cells×dim-group hash aggregate). The codebook itself is ONE row
  * (k × dim doubles ≈ k·dim·8 bytes — 32 KB at k=64, 16 MB at k=2¹⁵),
  * broadcast to every task; no join, no window, no driver collect
  * anywhere in training or assignment.
  */
object KmeansCodebook {

  /** `struct(d, id)` of the best (argmax-dot) codebook entry for `vec`
    * against a one-row codebook array `cbs`
    * (`array<struct<cb_id:int, cb_vec:array<double>>>`, sorted by cb_id).
    * Strict `>` keeps the FIRST (lowest cb_id) entry on ties. Map-only:
    * a per-row fold over the broadcast array — the assignment stage adds
    * zero exchanges to the plan (SemDedupScaleSpec pins this).
    */
  def best(vec: Column, cbs: Column): Column =
    // null-in → null-out, matching the native argmax_dot (a BinaryExpression
    // is null-propagating); without the guard the fold would fabricate the
    // (-Inf, -1) seed for a null vector
    when(vec.isNull || cbs.isNull, lit(null).cast("struct<d:double,id:int>"))
      .otherwise(aggregate(
        transform(cbs, cb => struct(
          Sim.dot(vec, cb.getField("cb_vec")).as("d"),
          cb.getField("cb_id").as("id"))),
        struct(lit(Double.NegativeInfinity).as("d"), lit(-1).as("id")),
        (acc, x) => when(x.getField("d") > acc.getField("d"), x).otherwise(acc)))

  /** [[best]] via the native fused-loop `argmax_dot` when the session has
    * GraftExtensions registered; the bit-identical HOF fold otherwise —
    * the same optional-with-fallback contract as `cosine_sim`. Name-based
    * because `expr` is the public route to an injected function.
    */
  def bestByName(s: org.apache.spark.sql.SparkSession,
      vecName: String, cbsName: String): Column =
    if (s.catalog.functionExists("argmax_dot")) expr(s"argmax_dot($vecName, $cbsName)")
    else best(col(vecName), col(cbsName))

  /** The k lowest-id vectors as a one-row codebook — the deterministic
    * seed. `orderBy(...).limit(k)` plans as TakeOrderedAndProject
    * (per-partition top-k, then a k-row merge — no global sort), and
    * unlike a `vec_id < k` filter it does not assume dense zero-based
    * ids: snowflake-style production ids seed exactly k cells instead of
    * silently yielding an empty codebook. cb_id is the 0-based RANK of
    * the seed vector (its position in id order — equal to vec_id on
    * dense corpora), a stable int label no matter the id domain; rank
    * order = id order, so the argmax tie-break direction is unchanged.
    * Null-id rows are EXCLUDED from seeding (an id-less vector has no
    * deterministic rank, and Spark orders nulls FIRST where SQL engines
    * default to LAST — the filter is the only null placement both sides
    * of an oracle agree on); they still participate in assignment and
    * centroid updates like any other row.
    */
  def seed(emb: DataFrame, k: Int): DataFrame =
    emb.filter(col("vec_id").isNotNull).orderBy(col("vec_id")).limit(k)
      .agg(sort_array(collect_list(struct(
        col("vec_id").as("vid"), col("vec")))).as("sa"))
      .select(transform(col("sa"), (x, i) => struct(
        i.cast("int").as("cb_id"), x.getField("vec").as("cb_vec"))).as("cbs"))

  /** One Lloyd iteration: assign every vector to its argmax-dot cell,
    * then rebuild the codebook as each cell's per-dimension mean (the
    * q56 step, folded back into codebook-row form). Cells that attract
    * no members drop out — the standard empty-cell rule, identical on
    * both engines because membership is identical.
    *
    * Plan: map-only assign → posexplode → hash aggregate on (cell, dim)
    * (≤ cells×dim groups, map-side partials) → two tiny per-cell/global
    * aggregations to refold the ≤ cells×dim rows into ONE codebook row.
    */
  def lloydIter(emb: DataFrame, cb: DataFrame): DataFrame = {
    val assigned = emb.crossJoin(broadcast(cb))
      .select(col("vec"),
        bestByName(emb.sparkSession, "vec", "cbs").getField("id").as("cell"))
    val cent = assigned
      .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(col("v").cast("decimal(28,14)")).as("sv"), count(lit(1)).as("n"))
      .select(col("cell"), col("pos"),
        NumFunctions.r4(col("sv").cast("double") / col("n")).as("c"))
    cent.groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cb_vec"))
      .agg(sort_array(collect_list(struct(
        col("cell").as("cb_id"), col("cb_vec")))).as("cbs"))
  }

  /** `iters` Lloyd iterations from the k-seed — the trained codebook as a
    * one-row DataFrame ready for `broadcast(...)` + [[best]]. `emb` must
    * be (vec_id, vec: array<double>); callers pass an already-materialized
    * frame so the training passes and the final query share one scan.
    */
  def train(emb: DataFrame, k: Int, iters: Int): DataFrame =
    (1 to iters).foldLeft(seed(emb, k))((cb, _) => lloydIter(emb, cb))
}
