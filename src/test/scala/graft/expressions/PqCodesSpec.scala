package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Extensions

/** Native `pq_codes` == the HOF fold (Extensions.pqCodesExpr),
  * bit-for-bit, on healthy AND degenerate inputs — the same
  * native/fallback-can-never-flip-an-oracle contract as argmax_dot.
  */
class PqCodesSpec extends SparkSpec {
  import spark.implicits._

  private val M = Extensions.PqM
  private val Sub = Extensions.PqSubDim
  private val Dim = M * Sub

  private def compare(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.select(
      col("vec_id"),
      expr(s"pq_codes(vec, cbs, $M, $Sub)").as("native"),
      when(col("vec").isNull || col("cbs").isNull,
        lit(null).cast("array<struct<code:int,score:double>>"))
        .otherwise(Extensions.pqCodesExpr).as("fold"))
      .collect()
    rows.foreach { r =>
      assert((r.get(1) == null) == (r.get(2) == null), s"null mismatch: $r")
      if (r.get(1) != null) {
        val n = r.getSeq[org.apache.spark.sql.Row](1)
        val f = r.getSeq[org.apache.spark.sql.Row](2)
        assert(n.size == f.size, s"length mismatch: $r")
        n.zip(f).zipWithIndex.foreach { case ((a, b), s) =>
          assert(a.get(0) == b.get(0), s"code mismatch at subspace $s: $a vs $b (vec_id=${r.get(0)})")
          val ad = a.getDouble(1); val bd = b.getDouble(1)
          assert(ad == bd || (ad.isNaN && bd.isNaN),
            s"score mismatch at subspace $s: $a vs $b (vec_id=${r.get(0)})")
        }
      }
    }
  }

  test("healthy inputs: native == fold over a random corpus and codebook") {
    val emb = spark.range(200).select(col("id").as("vec_id"),
      array((0 until Dim).map(d =>
        (pmod(hash(col("id") * 31 + d), lit(1001)).cast("double") - 500.0) / 100.0): _*).as("vec"))
    val cb = spark.range(1).select(array((0 until 16).map(c =>
      struct(lit(c).as("cb_id"), array((0 until Dim).map(d =>
        (pmod(hash(lit(c) * 17 + d + 7), lit(1001)).cast("double") - 500.0) / 100.0): _*).as("cb_vec"))): _*).as("cbs"))
    compare(emb.crossJoin(cb))
  }

  test("degenerate inputs: nulls, short arrays, empty codebook — native == fold") {
    val cbsSql = "array(" +
      "named_struct('cb_id', 0, 'cb_vec', array(1.0d, 1.0d, 1.0d, 1.0d, 1.0d, 1.0d, 1.0d, 1.0d)), " + // full first subspace only
      "cast(null as struct<cb_id:int, cb_vec:array<double>>), " +
      "named_struct('cb_id', 2, 'cb_vec', cast(null as array<double>)), " +
      "named_struct('cb_id', 3, 'cb_vec', array(5.0d, cast(null as double), 1.0d)), " + // null element, shorter
      "named_struct('cb_id', cast(null as int), 'cb_vec', array(2.0d, 2.0d)))" // short, null id
    val vecs = Seq(
      (1L, Some((0 until Dim).map(_.toDouble))),       // full-length vec
      (2L, Some(Seq(1.0, 2.0))),                       // shorter than one subspace
      (3L, Some(Seq.empty[Double])),                   // empty vec
      (4L, None)                                       // null vec
    ).toDF("vec_id", "vec").withColumn("vec", col("vec").cast("array<double>"))
    compare(vecs.withColumn("cbs", expr(cbsSql)))
    // empty codebook: every subspace keeps the (-1, -Inf) seed
    val emptyCb = vecs.filter(col("vec_id") === 1)
      .withColumn("cbs", expr("cast(array() as array<struct<cb_id:int, cb_vec:array<double>>>)"))
    compare(emptyCb)
    val seed = emptyCb.select(expr(s"pq_codes(vec, cbs, $M, $Sub)").as("n")).head().getSeq[org.apache.spark.sql.Row](0)
    assert(seed.size == M && seed.forall(s =>
      s.getInt(0) == -1 && s.getDouble(1) == Double.NegativeInfinity))
  }
}
