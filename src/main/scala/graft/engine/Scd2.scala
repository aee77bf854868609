package graft.engine

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 merge — the reference's signature operator: six structurally
  * identical Delta `MERGE` blocks (Silver Layer.py:83-120,224-263,321-365,
  * 434-475,535-557,630-651).
  *
  * No Delta jars are available, and more importantly the reference's
  * single-pass MERGE has two semantic bugs we fix rather than replicate
  * (SURVEY.md §7.4):
  *   1. a *changed* row matches ON the key, so it is expired but its new
  *      version is never re-inserted;
  *   2. `!=` change detection never fires for NULL→value transitions.
  *
  * This implementation is the correct two-action merge as a pure DataFrame
  * composition (joins + filters + union) — no custom Catalyst node needed,
  * Catalyst plans the key join as broadcast or sort-merge on its own. The
  * incoming batch is usually much smaller than accumulated history, so at
  * scale AQE broadcast-joins it; history partitioned by key bucketing would
  * remove the shuffle entirely (the composition is agnostic to that).
  *
  * Change detection uses null-safe equality (`<=>`), fixing bug 2.
  */
object Scd2 {

  val EffectiveDate = "effective_date"
  val EndDate = "end_date"
  val IsCurrent = "is_current"

  /** Append the SCD2 triplet to a source batch (Silver Layer.py:74-76),
    * with an explicit as-of date instead of the reference's
    * non-deterministic `current_date()` (SL:74).
    */
  def withScd2Columns(df: DataFrame, asOf: LocalDate): DataFrame =
    df.withColumn(EffectiveDate, lit(asOf.toString).cast("date"))
      .withColumn(EndDate, lit(null).cast("date"))
      .withColumn(IsCurrent, lit(true))

  /** Merge `source` (a raw batch, business columns only) into `target`
    * (an SCD2 table: business columns + triplet). Returns the new state:
    *
    *  - historical (non-current) target rows: unchanged;
    *  - current target rows with no matching source key: unchanged;
    *  - current target rows whose source version differs on any
    *    `compareCols`: expired (end_date = asOf, is_current = false)
    *    AND a new current version inserted (fixes reference bug 1);
    *  - current target rows whose source version is identical: unchanged;
    *  - source keys absent from target: inserted as new current rows.
    *
    * Contract: `source` must be key-unique (dedup upstream — Silver does);
    * duplicate source keys would fan out the full-outer join and produce
    * duplicate current rows.
    */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String],
      asOf: LocalDate): DataFrame = {

    val bizCols = target.columns.filterNot(Seq(EffectiveDate, EndDate, IsCurrent).contains)
    val history = target.filter(!col(IsCurrent))
    val current = target.filter(col(IsCurrent))

    // Physically rename the source side before joining: alias-based "t"/"s"
    // disambiguation breaks when `target` is itself the output of a previous
    // merge over the same source lineage (Spark resolves both aliases to the
    // same attribute ids). Renamed columns make the plan self-join-proof.
    def s_(c: String) = s"__s_$c"
    val src = source.select(bizCols.map(c => col(c).as(s_(c))).toIndexedSeq: _*)
    // Business keys are assumed non-null (the reference dropna's essential
    // columns before merging, SL:69) — plain equality, null keys never match.
    val joinCond = keys.map(k => col(k) === col(s_(k))).reduce(_ && _)
    val joined = current.join(src, joinCond, "full_outer")

    def anyDiff = compareCols
      .map(c => !(col(c) <=> col(s_(c))))
      .reduce(_ || _)

    // SINGLE-PASS emission: a filter-per-outcome union would re-execute the
    // full-outer join once per branch (the dominant shuffle, 5× at scale).
    // Instead each joined row emits an ARRAY of output rows — two for
    // changed keys (expired version + new current version), one otherwise —
    // and one explode flattens them. One join, one pass, same result.
    val asOfDate = lit(asOf.toString).cast("date")
    val nullDate = lit(null).cast("date")

    def mk(cols: Seq[Column], eff: Column, end: Column, cur: Column) =
      struct(cols.zip(bizCols).map { case (c, n) => c.as(n) } :+
        eff.as(EffectiveDate) :+ end.as(EndDate) :+ cur.as(IsCurrent): _*)

    val tCols = bizCols.map(col).toIndexedSeq
    val srcCols = bizCols.map(c => col(s_(c))).toIndexedSeq
    val keepTarget = mk(tCols, col(EffectiveDate), col(EndDate), col(IsCurrent))
    val expired = mk(tCols, col(EffectiveDate), asOfDate, lit(false))
    val newVersion = mk(srcCols, asOfDate, nullDate, lit(true))

    val emitted =
      when(col(keys.head).isNull, array(newVersion))            // brand-new key
        .when(col(s_(keys.head)).isNull, array(keepTarget))     // target-only
        .when(anyDiff, array(expired, newVersion))              // changed: expire + reinsert
        .otherwise(array(keepTarget))                           // unchanged

    history.unionByName(
      joined.select(explode(emitted).as("r")).select(col("r.*")))
  }

  /** Bootstrap: first run just stamps the triplet (Silver Layer.py:120). */
  def bootstrap(source: DataFrame, asOf: LocalDate): DataFrame =
    withScd2Columns(source, asOf)

  /** Snapshot of the table as it was on `date`: the version whose validity
    * interval [effective_date, end_date) covers it.
    */
  def snapshotAt(history: DataFrame, date: LocalDate): DataFrame = {
    val d = lit(date.toString).cast("date")
    history.filter(
      col(EffectiveDate) <= d && (col(EndDate).isNull || d < col(EndDate)))
      .drop(EffectiveDate, EndDate, IsCurrent)
  }

  /** Point-in-time (as-of) join — the read side SCD2 exists for: each fact
    * row matches the dimension VERSION that was valid on the fact's own
    * date (equi-join on the key + validity-interval predicate). Facts dated
    * before the key's first version drop out (inner semantics). The range
    * predicate rides the key equi-join, so the plan is a plain hash/merge
    * join with a post-probe filter — no custom operator needed, and at
    * scale the per-key version count stays small so the probe amplification
    * is bounded. `facts` column names (beyond the keys) must not collide
    * with history's — rename on the fact side first.
    */
  def pointInTimeJoin(
      facts: DataFrame,
      history: DataFrame,
      keys: Seq[String],
      factDate: Column): DataFrame = {
    val validity =
      col(EffectiveDate) <= factDate &&
        (col(EndDate).isNull || factDate < col(EndDate))
    facts.join(history, keys).filter(validity)
  }
}
