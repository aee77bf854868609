package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
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
  * runs a scalable recursive refinement instead:
  *
  *  1. aggregate weight sums per (group, bucket) where bucket = the
  *     2-hex-char PREFIX of the ordering hash (256-way); collect the
  *     ≤ 256·#groups rows to the driver (C1 scalar-sized) and prefix-sum
  *     them in bucket order — each bucket classifies KEEP-ALL, BOUNDARY
  *     (at most one per group), or DROP-ALL;
  *  2. the BOUNDARY bucket re-runs the same classification on the NEXT
  *     two hash chars (another 256-way split of 1/256 of the group),
  *     `levels` times in total — each level is one more ≤ 256·#groups
  *     stats aggregate and shrinks the boundary by 256×;
  *  3. KEEP-ALL buckets at every level pass via broadcast semi-joins;
  *     only the FINAL boundary bucket — 1/256^levels of each group
  *     (1/65,536 at the default 2) — pays an exact within-bucket
  *     cumulative-sum window. A 100 TB group's exact task is ~1.5 GB at
  *     levels=2, and one more level buys another 256× if ever needed.
  *
  * Because every bucket is a PREFIX of the ordering hash, bucket-then-
  * hash order IS global hash order at every level, so the kept set is
  * row-identical to the naive form (BudgetCutSpec pins this, boundary
  * edges and a deliberately hot boundary bucket included; q91's DuckDB
  * oracle is the naive form).
  *
  * `orderHashCol` must be a fixed-width hex string (md5 of the content —
  * also what makes the cut deterministic across engines and layouts).
  */
object BudgetCut {

  /** `kept`: the input rows that survive the cut (original columns).
    * `totals`: one row per group — (group, budget, total).
    */
  final case class Cut(kept: DataFrame, totals: DataFrame)

  /** Hex chars consumed per refinement level (2 → 256-way fan-out). */
  private val HexPerLevel = 2

  def cut(df: DataFrame, groupCol: String, weightCol: String,
      orderHashCol: String, tieCol: String, budgetOf: Long => Long,
      levels: Int = 2): Cut = {
    // Type contract (validated here, not discovered as a
    // ClassCastException three stages in): STRING group + ordering hash,
    // integral weights. Value preconditions — non-NULL group/hash/weight
    // and non-negative weights (negatives break the monotone running-sum
    // classification) — are validated on the level-1 stats pass below,
    // where they cost one extra aggregate column instead of a data scan.
    val schema = df.schema
    def tpe(c: String) = schema(c).dataType
    require(levels >= 1 && levels * HexPerLevel <= 32,
      s"BudgetCut: levels must be in [1, 16], got $levels")
    require(tpe(groupCol) == org.apache.spark.sql.types.StringType,
      s"BudgetCut: $groupCol must be STRING, got ${tpe(groupCol).sql}")
    require(tpe(orderHashCol) == org.apache.spark.sql.types.StringType,
      s"BudgetCut: $orderHashCol must be a STRING hash, got ${tpe(orderHashCol).sql}")
    require(Seq("TINYINT", "SMALLINT", "INT", "BIGINT").contains(tpe(weightCol).sql),
      s"BudgetCut: $weightCol must be integral, got ${tpe(weightCol).sql}")
    val s = df.sparkSession
    import s.implicits._
    val inputCols = df.columns.toSeq
    val d = Materialize.pin(df) // feeds every stats pass + kept branches

    def prefix(level: Int): Column = substring(col(orderHashCol), 1, HexPerLevel * level)

    /** Driver-side prefix-sum classification of one level's bucket stats
      * under per-group budgets: (keep-all buckets, boundary bucket +
      * remaining budget). Buckets sort lexicographically — same-length
      * hash prefixes, so bucket order is hash order.
      */
    def classify(stats: Seq[(String, String, Long)], budgets: Map[String, Long])
        : (Seq[(String, String)], Seq[(String, String, Long)]) = {
      val keep = Seq.newBuilder[(String, String)]
      val boundary = Seq.newBuilder[(String, String, Long)]
      stats.groupBy(_._1).foreach { case (g, rows) =>
        val budget = budgets(g)
        var cum = 0L
        var cutDone = false
        rows.sortBy(_._2).foreach { case (_, b, bw) =>
          if (!cutDone) {
            if (cum + bw <= budget) { keep += ((g, b)); cum += bw }
            else { boundary += ((g, b, budget - cum)); cutDone = true }
          } // buckets after the boundary: running sum > budget for every row
        }
      }
      (keep.result(), boundary.result())
    }

    // ---- level 1: stats over the full input, plus value validation ----
    val stats1Rows = d.groupBy(col(groupCol), prefix(1).as("__bucket"))
      .agg(sum(col(weightCol)).as("__bw"),
        min(col(weightCol)).as("__minw"),
        count(when(col(weightCol).isNull, lit(1))).as("__nullw"))
      .collect()
    val stats1 = stats1Rows.toSeq.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        s"BudgetCut: NULL $groupCol or $orderHashCol — a null key would " +
          "silently vanish through the equi-joins; coalesce upstream")
      require(r.getLong(4) == 0,
        s"BudgetCut: NULL $weightCol values in group '${r.getString(0)}' — " +
          "the running sum would skip them; coalesce upstream")
      require(r.getLong(3) >= 0,
        s"BudgetCut: negative $weightCol (min ${r.getLong(3)}) in group " +
          s"'${r.getString(0)}' — the monotone bucket classification requires >= 0")
      (r.getString(0), r.getString(1), r.getLong(2))
    }
    val budgets1 = stats1.groupBy(_._1).map { case (g, rows) =>
      g -> (budgetOf(rows.map(_._3).sum), rows.map(_._3).sum)
    }
    val totalsDf = budgets1.toSeq.map { case (g, (b, t)) => (g, b, t) }
      .toDF(groupCol, "budget", "total")
    val (keep1, boundary1) = classify(stats1, budgets1.view.mapValues(_._1).toMap)

    // ---- levels 2..n: re-classify inside the shrinking boundary bucket ----
    // each pass aggregates ONLY the rows of the current boundary buckets
    // (1/256^(l-1) of each group) into ≤ 256·#groups sub-bucket rows
    var keeps = List(keep1.toDF(groupCol, "__bucket") -> 1)
    var boundary = boundary1
    var level = 1
    while (level < levels && boundary.nonEmpty) {
      val bKeys = boundary.map { case (g, b, _) => (g, b) }.toDF(groupCol, "__bucket")
      val rem = boundary.map { case (g, _, r) => g -> r }.toMap
      level += 1
      val stats = d.withColumn("__bucket", prefix(level - 1))
        .join(broadcast(bKeys), Seq(groupCol, "__bucket"), "left_semi")
        .groupBy(col(groupCol), prefix(level).as("__b2"))
        .agg(sum(col(weightCol)).as("__bw"))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val (keepL, boundaryL) = classify(stats, rem)
      keeps ::= keepL.toDF(groupCol, "__bucket") -> level
      boundary = boundaryL
    }

    // ---- assemble: semi-join each level's keep-all set, exact window on
    // the final boundary only ----
    val keptFull = keeps.map { case (keepDf, l) =>
      d.withColumn("__bucket", prefix(l))
        .join(broadcast(keepDf), Seq(groupCol, "__bucket"), "left_semi")
        .select(inputCols.map(col): _*) // positional-union pin
    }.reduce(_ union _)
    val boundaryDf = boundary.toDF(groupCol, "__bucket", "__remaining")
    val wB = Window.partitionBy(col(groupCol), col("__bucket"))
      .orderBy(col(orderHashCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = d.withColumn("__bucket", prefix(level))
      .join(broadcast(boundaryDf), Seq(groupCol, "__bucket"))
      .withColumn("__cum", sum(col(weightCol)).over(wB))
      .filter(col("__cum") <= col("__remaining"))
      .select(inputCols.map(col): _*)
    Cut(keptFull.union(keptBoundary), totalsDf)
  }
}
