package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `hllpp_distinct` must be BIT-IDENTICAL to `approx_count_distinct` at
  * the same rsd — it delegates to the same HyperLogLogPlusPlusHelper, so
  * any divergence means the re-hosting broke update/merge/query wiring.
  * Coverage: grouped + global, multiple input types (long, string,
  * double, date), nulls ignored, empty/all-null groups, rsd 0.01 and
  * 0.05, and a forced multi-partition path so map-side partials and the
  * serialize/deserialize/merge seam all execute.
  */
class HllppDistinctSpec extends SparkSpec {

  import spark.implicits._

  private def assertSame(df: org.apache.spark.sql.DataFrame, column: String,
      rsd: Double, group: Option[String]): Unit = {
    val native = expr(s"hllpp_distinct($column, ${rsd}d)").as("d")
    val builtin = approx_count_distinct(col(column), rsd).as("d")
    val (a, b) = group match {
      case Some(g) => (
        df.groupBy(col(g)).agg(native).orderBy(g).collect().toSeq,
        df.groupBy(col(g)).agg(builtin).orderBy(g).collect().toSeq)
      case None => (df.agg(native).collect().toSeq, df.agg(builtin).collect().toSeq)
    }
    assert(a == b, s"hllpp_distinct($column, $rsd) diverged from builtin: $a vs $b")
  }

  private lazy val rows = (1 to 5000).map { i =>
    (i % 7, i % 997L, s"s${i % 1213}", (i % 577) / 3.0,
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i % 365)),
      if (i % 5 == 0) null else s"n${i % 311}")
  }.toDF("g", "l", "s", "d", "dt", "ns")
    .repartition(7) // multiple partials: partial update + merge both run

  test("bit-identical to approx_count_distinct: grouped, rsd 0.01") {
    Seq("l", "s", "d", "dt", "ns").foreach(c => assertSame(rows, c, 0.01, Some("g")))
  }

  test("bit-identical to approx_count_distinct: global, rsd 0.05") {
    Seq("l", "s", "ns").foreach(c => assertSame(rows, c, 0.05, None))
  }

  test("nulls ignored; all-null and empty inputs estimate 0") {
    val allNull = Seq.fill(100)(Tuple1(null: String)).toDF("x").repartition(3)
    assert(allNull.selectExpr("hllpp_distinct(x, 0.01d)").head().getLong(0) == 0L)
    val empty = spark.emptyDataFrame.withColumn("x", lit("a")).filter(lit(false))
    assert(empty.selectExpr("hllpp_distinct(x, 0.01d)").head().getLong(0) == 0L)
  }

  test("q30/q36 sketch columns match the pre-native formulation at sf0.001") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val native = li.groupBy($"l_returnflag").agg(
      expr("hllpp_distinct(l_partkey, 0.01d)").as("pa"),
      expr("hllpp_distinct(l_suppkey, 0.01d)").as("sa"))
    val builtin = li.groupBy($"l_returnflag").agg(
      approx_count_distinct($"l_partkey", 0.01).as("pa"),
      approx_count_distinct($"l_suppkey", 0.01).as("sa"))
    assert(native.orderBy("l_returnflag").collect().toSeq ==
      builtin.orderBy("l_returnflag").collect().toSeq)
  }

  test("non-literal or non-positive rsd fails analysis") {
    intercept[Exception] {
      rows.selectExpr("hllpp_distinct(l, cast(l as double))").collect()
    }
    intercept[Exception] {
      rows.selectExpr("hllpp_distinct(l, 0.0d)").collect()
    }
  }
}
