package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `exact_moments` must be BIT-IDENTICAL to the five separate decimal
  * sums it fuses (`count(1)`, `sum(q)`, `sum(p)`, `sum(q*q)`,
  * `sum(p*p)`, `sum(q*p)` over `decimal(18,6)` casts) — it accumulates
  * the same exact values as 128-bit integers and converts to the same
  * Decimal types once per group, so any divergence (value, type, or
  * null pattern) means the integer path broke. Coverage: grouped +
  * global, negatives, magnitudes that force non-compact decimal sums
  * and 128-bit carries, per-column nulls (the sum-null vs count-all
  * contract), empty/all-null groups, a forced multi-partition path so
  * partial update + serialize/deserialize/merge all execute, and the
  * exact q88 shape on the sf0.001 lineitem.
  */
class ExactMomentsSpec extends SparkSpec {

  import spark.implicits._

  private def builtinAgg(df: org.apache.spark.sql.DataFrame, group: Option[String]) = {
    val qd = col("q").cast("decimal(18,6)")
    val pd = col("p").cast("decimal(18,6)")
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(qd).as("sq"), sum(pd).as("sp"),
      sum(qd * qd).as("sqq"), sum(pd * pd).as("spp"), sum(qd * pd).as("sqp"))
    group match {
      case Some(g) => df.groupBy(col(g)).agg(aggs.head, aggs.tail: _*).orderBy(g)
      case None => df.agg(aggs.head, aggs.tail: _*)
    }
  }

  private def nativeAgg(df: org.apache.spark.sql.DataFrame, group: Option[String]) = {
    val m = expr("exact_moments(cast(q as decimal(18,6)), cast(p as decimal(18,6)))")
    val base = group match {
      case Some(g) => df.groupBy(col(g)).agg(m.as("m")).orderBy(g)
      case None => df.agg(m.as("m"))
    }
    val cols = (group.toSeq.map(col) :+ col("m.n").as("n")) ++
      Seq("sq", "sp", "sqq", "spp", "sqp").map(c => col(s"m.$c").as(c))
    base.select(cols: _*)
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame,
      group: Option[String], tag: String): Unit = {
    val a = nativeAgg(df, group)
    val b = builtinAgg(df, group)
    assert(a.schema == b.schema, s"$tag schema: ${a.schema} vs ${b.schema}")
    assert(a.collect().toSeq == b.collect().toSeq, s"$tag values diverged")
  }

  test("random data incl. negatives, grouped + global, multi-partition") {
    val rnd = new scala.util.Random(18)
    val df = (1 to 20000).map { i =>
      (i % 5, rnd.nextDouble() * 100 - 20, rnd.nextDouble() * 200000 - 1000)
    }.toDF("g", "q", "p").repartition(7)
    assertSame(df, Some("g"), "random grouped")
    assertSame(df, None, "random global")
  }

  test("large magnitudes: non-compact decimal sums / 128-bit carries") {
    // values near decimal(18,6)'s ceiling: unscaled ~1e17, squares ~1e34
    val df = (1 to 3000).map { i =>
      (i % 3, 9.99e10 + i, -9.98e10 - 2.0 * i)
    }.toDF("g", "q", "p").repartition(5)
    assertSame(df, Some("g"), "large magnitudes")
  }

  test("null pattern matches the built-in sums (count-all vs sum-null)") {
    val df = Seq[(Int, java.lang.Double, java.lang.Double)](
      (0, 1.5, null), (0, null, 2.5), (0, 3.0, 4.0),
      (1, null, null), (1, null, 7.25),
      (2, null, null), (2, null, null) // n>0, every sum null
    ).toDF("g", "q", "p").repartition(3)
    assertSame(df, Some("g"), "null pattern")
  }

  test("empty input: global agg emits one row, all sums null") {
    val df = Seq((0, 1.0, 2.0)).toDF("g", "q", "p").filter(lit(false))
    assertSame(df, None, "empty global")
  }

  test("q88 shape on sf0.001 lineitem is bit-identical") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        col("l_quantity").as("q"), col("l_extendedprice").as("p"))
    assertSame(li, Some("g"), "q88 sf0.001")
  }

  test("non-decimal or wide-decimal input fails analysis") {
    val df = Seq((1.0, 2.0)).toDF("q", "p")
    intercept[Exception] {
      df.selectExpr("exact_moments(q, p)").collect() // raw doubles
    }
    intercept[Exception] {
      df.selectExpr(
        "exact_moments(cast(q as decimal(38,6)), cast(p as decimal(18,6)))")
        .collect() // precision > 18: unscaled long unavailable
    }
  }
}
