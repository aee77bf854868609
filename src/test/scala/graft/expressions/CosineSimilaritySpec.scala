package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.{SimilarityFunctions => Sim}

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(1.0, 0.0), Seq(0.0, 1.0)),
    (Seq(-1.0, 2.5, 0.125, 3.75), Seq(2.0, -0.5, 1.0, 0.25)))

  test("native expression registered via SparkSessionExtensions resolves in SQL and expr()") {
    assert(spark.catalog.functionExists("cosine_sim"))
    val out = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .as[Double].collect()
    assert(math.abs(out.head - 1.0) < 1e-15)
  }

  test("bit-identical to the composable HOF formulation") {
    val df = vecs.toDF("a", "b")
    val rows = df.select(
      expr("cosine_sim(a, b)").as("native"),
      Sim.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native=$n hof=$h") }
  }

  test("participates in whole-stage codegen (doGenCode path exercised)") {
    // range → WSCG stage; a local-relation plan may skip WSCG regardless
    // of the expression.
    val df = spark.range(3).select(expr(
      "cosine_sim(array(cast(id as double), 1.0d), array(1.0d, cast(id as double)))").as("c"))
    // the "*(n)" operator prefix marks WholeStageCodegen participation
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val out = df.as[Double].collect()
    assert(math.abs(out(1) - 1.0) < 1e-15) // [1,1]·[1,1]
  }

  test("null inputs yield null (nullSafeEval contract)") {
    val df = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val out = df.select(expr("cosine_sim(a, b)").as("c")).as[Option[Double]].collect()
    assert(out.head.isEmpty)
  }

  test("null ELEMENT yields null, matching the HOF form (codegen + interpreted)") {
    val df = Seq(
      (Seq(Some(1.0), None, Some(3.0)), Seq(Some(4.0), Some(5.0), Some(6.0))),
      (Seq(Some(1.0), Some(0.0)), Seq(Some(0.0), Some(1.0))))
      .toDF("a", "b")
    val out = df.select(
      expr("cosine_sim(a, b)").as("native"),
      Sim.cosine(col("a"), col("b")).as("hof"))
      .as[(Option[Double], Option[Double])].collect()
    assert(out(0) == ((None, None)))
    assert(out(1)._1.isDefined && out(1)._1 == out(1)._2)
  }

  test("zero vector yields IEEE NaN (where the ANSI HOF form would throw DIVIDE_BY_ZERO)") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    val native = df.select(expr("cosine_sim(a, b)").as("c")).as[Double].collect().head
    assert(native.isNaN)
    // the composable fallback raises under ANSI — a documented reason the
    // native expression is the preferred path
    intercept[Exception] {
      df.select(Sim.cosine(col("a"), col("b")).as("c")).as[Double].collect()
    }
  }
}
