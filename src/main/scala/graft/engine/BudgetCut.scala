package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted budget cut in deterministic hash order, per group — "keep
  * documents until ⌊budget⌋ of the group's tokens are spent", the
  * operator behind q91 and the general form of any "N units of domain X"
  * curation decision.
  *
  * Semantics (the ONLY contract): order each group's rows by
  * (`orderHashCol`, `tieCol`), take rows while the running `weightCol`
  * sum stays ≤ budget(group total). Equal to the naive per-group
  * cumulative-sum window — which is #groups single tasks at scale. This
  * runs the scalable two-pass instead:
  *
  *  1. aggregate weight sums per (group, bucket) where bucket = the
  *     2-hex-char PREFIX of the ordering hash (256-way); collect the
  *     ≤ 256·#groups rows to the driver (C1 scalar-sized) and prefix-sum
  *     them in bucket order — each bucket classifies KEEP-ALL, BOUNDARY
  *     (at most one per group), or DROP-ALL;
  *  2. KEEP-ALL rows pass with a broadcast semi-join; only the BOUNDARY
  *     bucket (1/256 of the group) pays an exact within-bucket
  *     cumulative-sum window.
  *
  * Because the bucket is a prefix of the ordering hash, bucket-then-hash
  * order IS global hash order, so the kept set is row-identical to the
  * naive form (BudgetCutSpec pins this, boundary edges included;
  * q91's DuckDB oracle is the naive form).
  *
  * `orderHashCol` must be a fixed-width hex string (md5 of the content —
  * also what makes the cut deterministic across engines and layouts).
  */
object BudgetCut {

  /** `kept`: the input rows that survive the cut (original columns).
    * `totals`: one row per group — (group, budget, total).
    */
  final case class Cut(kept: DataFrame, totals: DataFrame)

  def cut(df: DataFrame, groupCol: String, weightCol: String,
      orderHashCol: String, tieCol: String, budgetOf: Long => Long): Cut = {
    // Contract (validated here, not discovered as a ClassCastException
    // three stages in): STRING group + ordering hash, integral
    // NON-NEGATIVE weights (negative weights break the monotone
    // running-sum classification), and non-null group/hash values (a
    // null key would silently vanish through the equi-joins instead of
    // being cut; pre-filter or coalesce nulls upstream).
    val schema = df.schema
    def tpe(c: String) = schema(c).dataType
    require(tpe(groupCol) == org.apache.spark.sql.types.StringType,
      s"BudgetCut: $groupCol must be STRING, got ${tpe(groupCol).sql}")
    require(tpe(orderHashCol) == org.apache.spark.sql.types.StringType,
      s"BudgetCut: $orderHashCol must be a STRING hash, got ${tpe(orderHashCol).sql}")
    require(Seq("TINYINT", "SMALLINT", "INT", "BIGINT").contains(tpe(weightCol).sql),
      s"BudgetCut: $weightCol must be integral, got ${tpe(weightCol).sql}")
    val s = df.sparkSession
    val inputCols = df.columns.toSeq
    val d = df
      .withColumn("__bucket", substring(col(orderHashCol), 1, 2))
      .localCheckpoint(true) // feeds bucket stats + both kept branches
    val stats = d.groupBy(col(groupCol), col("__bucket"))
      .agg(sum(col(weightCol)).as("__bw"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val fullKeep = Seq.newBuilder[(String, String)]
    val boundary = Seq.newBuilder[(String, String, Long)]
    val totals = Seq.newBuilder[(String, Long, Long)]
    stats.groupBy(_._1).foreach { case (g, rows) =>
      val ordered = rows.sortBy(_._2)
      val total = ordered.map(_._3).sum
      val budget = budgetOf(total)
      totals += ((g, budget, total))
      var cum = 0L
      var cutDone = false
      ordered.foreach { case (_, b, bw) =>
        if (!cutDone) {
          if (cum + bw <= budget) { fullKeep += ((g, b)); cum += bw }
          else { boundary += ((g, b, budget - cum)); cutDone = true }
        } // buckets after the boundary: running sum > budget for every row
      }
    }
    import s.implicits._
    val keepDf = fullKeep.result().toDF(groupCol, "__bucket")
    val boundaryDf = boundary.result().toDF(groupCol, "__bucket", "__remaining")
    val totalsDf = totals.result().toDF(groupCol, "budget", "total")
    // positional union: pin both branches to the input column list
    val keptFull = d.join(broadcast(keepDf), Seq(groupCol, "__bucket"), "left_semi")
      .select(inputCols.map(col): _*)
    val wB = Window.partitionBy(col(groupCol), col("__bucket"))
      .orderBy(col(orderHashCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = d.join(broadcast(boundaryDf), Seq(groupCol, "__bucket"))
      .withColumn("__cum", sum(col(weightCol)).over(wB))
      .filter(col("__cum") <= col("__remaining"))
      .select(inputCols.map(col): _*)
    Cut(keptFull.union(keptBoundary), totalsDf)
  }
}
