package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Version-to-version diff of a managed [[Tables]] snapshot table — the
  * change-data-feed a corpus pipeline derives from time travel when the
  * sink doesn't record row-level changes itself (the reference's Delta
  * tables get this from `CHANGE DATA FEED`; our versioned-overwrite sink
  * reconstructs it from any two retained snapshots).
  *
  * Contract: rows are identified by `keyCols`; change detection compares
  * an md5 digest over each frame's remaining columns in ALPHABETICAL
  * order (values null-safe-concatenated with a field separator). With
  * identical schemas the two digests are comparable; under schema
  * evolution (a version adds/drops a column) every surviving key
  * digests differently and reports `changed` — the conservative answer
  * for a reconciliation scan. Output is one row per changed key with
  * `change` ∈ {added, removed, changed} — unchanged keys never leave
  * the join, so the output scales with the CHANGE volume, not table
  * size.
  *
  * Plan shape: one full-outer hash join on the key columns, digests
  * computed map-side from each snapshot's scan — at 100 TB this is the
  * canonical reconciliation join, and both sides prune to key+digest
  * before shuffling (never full rows).
  */
object SnapshotDiff {

  private def digest(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val valueCols = df.columns.filterNot(keyCols.contains).sorted
    // \u0001 field separator + \u0000 null marker: ("ab","c") vs ("a","bc")
    // and null vs "" must digest differently.
    val parts = valueCols.flatMap(c =>
      Seq(lit("\u0001"), coalesce(col(c).cast("string"), lit("\u0000"))))
    df.select(keyCols.map(col) :+ md5(concat(parts: _*)).as("__digest"): _*)
  }

  /** Diff two arbitrary frames sharing `keyCols` (exposed for tests and
    * for diffing across stores); `diffVersions` is the time-travel entry.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    val o = digest(oldDf, keyCols).withColumnRenamed("__digest", "__old")
    val n = digest(newDf, keyCols).withColumnRenamed("__digest", "__new")
    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(col("__old") =!= col("__new"), "changed"))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  def diffVersions(spark: SparkSession, path: String,
      oldVersion: String, newVersion: String, keyCols: Seq[String]): DataFrame =
    diff(
      Tables.readVersion(spark, path, oldVersion),
      Tables.readVersion(spark, path, newVersion),
      keyCols)
}
