package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BudgetCut ≡ the naive per-group cumulative-sum window, including the
  * boundary edges the bucket classification must get exactly right:
  * budget landing precisely on a bucket edge, zero budget, budget ≥
  * total, single-bucket groups, and layout independence.
  */
class BudgetCutSpec extends SparkSpec {
  import spark.implicits._

  /** The naive definition: keep while running weight (ordered by h, id)
    * stays ≤ budget(group total).
    */
  private def naive(df: DataFrame, budgetOf: Long => Long): Set[(String, Long)] = {
    val w = Window.partitionBy($"g").orderBy($"h", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = df.groupBy($"g").agg(sum($"wt").as("total"))
      .collect().map(r => r.getString(0) -> budgetOf(r.getLong(1))).toMap
    df.withColumn("cum", sum($"wt").over(w))
      .collect()
      .filter(r => r.getAs[Long]("cum") <= totals(r.getAs[String]("g")))
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("id"))).toSet
  }

  private def cutSet(df: DataFrame, budgetOf: Long => Long): Set[(String, Long)] =
    BudgetCut.cut(df, "g", "wt", "h", "id", budgetOf)
      .kept.select($"g", $"id").as[(String, Long)].collect().toSet

  private def docs(n: Int): DataFrame =
    (1 to n).map { i =>
      (if (i % 3 == 0) "a" else "b", i.toLong, (i % 7 + 1).toLong, s"row $i content")
    }.toDF("g", "id", "wt", "text")
      .withColumn("h", md5($"text")).drop("text")

  test("matches the naive window across budget fractions") {
    val d = docs(500)
    for (frac <- Seq[Long => Long](_ / 10, _ / 2, t => t * 3 / 5, t => t * 9 / 10)) {
      assert(cutSet(d, frac) === naive(d, frac))
    }
  }

  test("budget landing exactly on a bucket edge keeps precisely that prefix") {
    val d = docs(500)
    // engineer a budget equal to the cumulative weight of g='a' rows in
    // its first few buckets: compute bucket sums and target an exact edge
    val buckets = d.filter($"g" === "a")
      .groupBy(substring($"h", 1, 2).as("b")).agg(sum($"wt").as("bw"))
      .orderBy($"b").collect().map(_.getLong(1))
    val edge = buckets.take(3).sum // exact cum at end of 3rd bucket
    val total = d.filter($"g" === "a").agg(sum($"wt")).head.getLong(0)
    val budgetOf: Long => Long = t => if (t == total) edge else t / 2
    assert(cutSet(d, budgetOf) === naive(d, budgetOf))
    // and the kept weight for 'a' is exactly the edge (nothing dropped
    // from a fully-affordable bucket, nothing leaked past it)
    val keptW = BudgetCut.cut(d, "g", "wt", "h", "id", budgetOf)
      .kept.filter($"g" === "a").agg(sum($"wt")).head.getLong(0)
    assert(keptW === edge)
  }

  test("zero budget keeps nothing; budget >= total keeps everything") {
    val d = docs(200)
    assert(cutSet(d, _ => 0L) === Set.empty)
    assert(cutSet(d, t => t) === naive(d, t => t))
    assert(cutSet(d, t => t).size === 200)
  }

  test("layout-independent: repartitioned input cuts the identical set") {
    val d = docs(300)
    val expected = cutSet(d, t => t * 3 / 5)
    assert(cutSet(d.repartition(13), t => t * 3 / 5) === expected)
    assert(expected.nonEmpty && expected.size < 300)
  }

  test("recursion levels all agree with the naive window") {
    val d = docs(400)
    val want = naive(d, t => t * 3 / 5)
    for (lv <- Seq(1, 2, 3)) {
      val got = BudgetCut.cut(d, "g", "wt", "h", "id", t => t * 3 / 5, levels = lv)
        .kept.select($"g", $"id").as[(String, Long)].collect().toSet
      assert(got === want, s"levels=$lv")
    }
  }

  test("deliberately hot boundary bucket: recursion still row-identical") {
    // all rows share the SAME first two hash chars (one giant level-1
    // bucket — the worst case the recursion exists for), while chars 3+
    // still vary; the budget lands strictly inside it so the whole group
    // is one boundary bucket at level 1
    val d = (1 to 600).map { i => ("g1", i.toLong, (i % 5 + 1).toLong, s"doc $i") }
      .toDF("g", "id", "wt", "text")
      .withColumn("h", concat(lit("ab"), md5($"text"))).drop("text")
    val want = naive(d, t => t / 3)
    for (lv <- Seq(1, 2, 3)) {
      val got = BudgetCut.cut(d, "g", "wt", "h", "id", t => t / 3, levels = lv)
        .kept.select($"g", $"id").as[(String, Long)].collect().toSet
      assert(got === want, s"levels=$lv")
      assert(got.nonEmpty && got.size < 600)
    }
  }

  test("value preconditions fail fast with named errors") {
    val neg = Seq(("g", 1L, -2L, "aa00"), ("g", 2L, 3L, "bb00"))
      .toDF("g", "id", "wt", "h")
    val e1 = intercept[IllegalArgumentException] {
      BudgetCut.cut(neg, "g", "wt", "h", "id", t => t).kept.count()
    }
    assert(e1.getMessage.contains("negative"))
    val nul = Seq(("g", 1L, Some(2L), "aa00"), ("g", 2L, None, "bb00"))
      .toDF("g", "id", "wt", "h")
    val e2 = intercept[IllegalArgumentException] {
      BudgetCut.cut(nul, "g", "wt", "h", "id", t => t).kept.count()
    }
    assert(e2.getMessage.contains("NULL wt"))
    val nullKey = Seq((Some("g"), 1L, 2L, "aa00"), (None, 2L, 3L, "bb00"))
      .toDF("g", "id", "wt", "h")
    val e3 = intercept[IllegalArgumentException] {
      BudgetCut.cut(nullKey, "g", "wt", "h", "id", t => t).kept.count()
    }
    assert(e3.getMessage.contains("NULL g"))
  }
}
