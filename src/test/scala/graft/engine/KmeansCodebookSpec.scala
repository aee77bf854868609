package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained-codebook contracts: native/fallback parity (the argmax_dot
  * expression must be bit-identical to the HOF fold so the session's
  * extension registration can never flip an oracle), tie-break direction,
  * empty-cell drop, and training determinism across partitionings (the
  * DECIMAL-sum argument).
  */
class KmeansCodebookSpec extends SparkSpec {
  import spark.implicits._

  private def emb(n: Int, parts: Int): DataFrame =
    spark.range(n).repartition(parts).select(col("id").as("vec_id"),
      array((0 until 8).map(d =>
        (pmod(hash(col("id") * 13 + d), lit(101)).cast("double") - 50.0) / 9.0): _*).as("vec"))

  test("native argmax_dot == HOF fold, bit-for-bit") {
    val e = emb(200, 4)
    val cb = broadcast(KmeansCodebook.train(e, k = 8, iters = 2))
    val both = e.crossJoin(cb).select(
      col("vec_id"),
      expr("argmax_dot(vec, cbs)").as("native"),
      KmeansCodebook.best(col("vec"), col("cbs")).as("fold"))
    val diff = both.filter(
      col("native.id") =!= col("fold.id") || col("native.d") =!= col("fold.d")).count()
    assert(diff == 0)
  }

  test("tie-break keeps the lowest cb_id") {
    // two identical codebook entries -> every vector must land on id 0
    val e = Seq((0L, Seq(1.0, 2.0))).toDF("vec_id", "vec")
    val cbs = typedlit(Seq((0, Seq(1.0, 0.0)), (1, Seq(1.0, 0.0))))
      .cast("array<struct<cb_id:int,cb_vec:array<double>>>")
    val picked = e.select(expr("argmax_dot(vec, " +
      "array(named_struct('cb_id', 0, 'cb_vec', array(1.0d, 0.0d)), " +
      "named_struct('cb_id', 1, 'cb_vec', array(1.0d, 0.0d)))).id").as("id"))
      .as[Int].head()
    assert(picked == 0)
    val fold = e.select(KmeansCodebook.best(col("vec"), cbs).getField("id")).as[Int].head()
    assert(fold == 0)
  }

  test("training is partitioning-invariant (DECIMAL sums, sorted refold)") {
    val a = KmeansCodebook.train(emb(300, 2), k = 8, iters = 2).collect()
    val b = KmeansCodebook.train(emb(300, 7), k = 8, iters = 2).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("degenerate inputs: native == fold on NaN dots, null vec, length mismatch") {
    // cbs: entry 0 matches dim 2, entry 1 mismatched (dim 3 — fold gets a
    // NULL dot and skips it; native must skip too, not partial-dot it)
    val cbsSql = "array(named_struct('cb_id', 0, 'cb_vec', array(1.0d, 1.0d)), " +
      "named_struct('cb_id', 1, 'cb_vec', array(9.0d, 9.0d, 9.0d)))"
    val rows = Seq(
      (1L, Some(Seq(1.0, 2.0))),                 // normal
      (2L, Some(Seq(Double.NaN, 1.0))),          // NaN dot — NaN wins as largest
      (3L, None)                                 // null vec — null out
    ).toDF("vec_id", "vec")
    val both = rows.select(
      col("vec_id"),
      expr(s"argmax_dot(vec, $cbsSql)").as("native"),
      KmeansCodebook.best(col("vec"), expr(cbsSql)).as("fold"))
      .collect().sortBy(_.getLong(0))
    both.foreach { r =>
      assert(r.get(1) == null == (r.get(2) == null), s"null mismatch: $r")
      if (r.get(1) != null) {
        val n = r.getStruct(1); val f = r.getStruct(2)
        assert(n.getInt(1) == f.getInt(1), s"id mismatch: $r")
        val nd = n.getDouble(0); val fd = f.getDouble(0)
        assert(nd == fd || (nd.isNaN && fd.isNaN), s"d mismatch: $r")
      }
    }
    // and both picked the matching-length entry despite entry 1's bigger values
    assert(both(0).getStruct(1).getInt(1) == 0)
    // NaN dot on entry 0 must WIN (NaN is largest in Spark comparisons)
    assert(both(1).getStruct(1).getInt(1) == 0 && both(1).getStruct(1).getDouble(0).isNaN)
    assert(both(2).get(1) == null)
  }

  test("degenerate inputs: null entry / null cb_vec / null elements / null cb_id — native == fold") {
    val cbsSql = "array(" +
      "named_struct('cb_id', 0, 'cb_vec', array(1.0d, 1.0d)), " +
      "cast(null as struct<cb_id:int, cb_vec:array<double>>), " +
      "named_struct('cb_id', 2, 'cb_vec', cast(null as array<double>)), " +
      "named_struct('cb_id', 3, 'cb_vec', array(5.0d, cast(null as double))), " +
      "named_struct('cb_id', cast(null as int), 'cb_vec', array(2.0d, 2.0d)))"
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)),   // normal vec
      (2L, Seq[java.lang.Double](null, 2.0))   // null ELEMENT in vec
    ).toDF("vec_id", "vec").withColumn("vec", col("vec").cast("array<double>"))
    val both = rows.select(
      col("vec_id"),
      expr(s"argmax_dot(vec, $cbsSql)").as("native"),
      KmeansCodebook.best(col("vec"), expr(cbsSql)).as("fold"))
      .collect().sortBy(_.getLong(0))
    both.foreach { r =>
      val n = r.getStruct(1); val f = r.getStruct(2)
      assert(n.get(0) == f.get(0) && n.get(1) == f.get(1), s"parity mismatch: $r")
    }
    // normal vec: poisoned entries (null struct, null cb_vec, null element)
    // all skipped; the null-cb_id entry wins on dot 6.0 and carries its
    // null id through both forms
    assert(both(0).getStruct(1).getDouble(0) == 6.0 && both(0).getStruct(1).isNullAt(1))
    // null element in vec poisons every dot: both forms return the seed
    assert(both(1).getStruct(1).getDouble(0) == Double.NegativeInfinity
      && both(1).getStruct(1).getInt(1) == -1)
  }

  test("seed uses the k lowest ids as ranks — not a dense-id assumption") {
    // snowflake-style ids: vec_id < k matches nothing, rank-seed must
    // still produce a k-cell codebook labeled 0..k-1
    val e = spark.range(20).select((col("id") * 1000000007L + 5000000000L).as("vec_id"),
      array((0 until 4).map(d =>
        (pmod(hash(col("id") * 7 + d), lit(31)).cast("double") - 15.0) / 4.0): _*).as("vec"))
    val cbs = KmeansCodebook.seed(e, 6).select(explode(col("cbs")).as("c"))
      .select(col("c.cb_id")).as[Int].collect().sorted.toSeq
    assert(cbs == (0 until 6))
    val trained = KmeansCodebook.train(e, 6, 1)
    assert(trained.select(size(col("cbs"))).as[Int].head() > 0)
  }

  test("cells with no members drop out of the codebook") {
    // all vectors identical -> every vector joins one argmax cell; after
    // one iteration only that single cell survives
    val e = spark.range(20).select(col("id").as("vec_id"),
      typedlit(Seq(1.0, 1.0, 1.0, 1.0)).as("vec"))
    val cb = KmeansCodebook.train(e, k = 4, iters = 1)
    val k = cb.select(size(col("cbs"))).as[Int].head()
    assert(k == 1)
  }

  test("K is data-derived: clamp(ceil(sqrt(N)), 16, 65536) grows with N") {
    import graft.queries.Extensions.{kmeansK, semDedupCap}
    assert(kmeansK(100) == 16) // below the floor -> clamped up
    assert(kmeansK(500) == 23) // the sf0.01 testdata regime
    assert(kmeansK(2000) == 45) // sf0.1
    assert(kmeansK(20000) == 142) // sf1
    assert(kmeansK(2025) == 45) // perfect square: IEEE sqrt exact, no off-by-one
    assert(kmeansK(10L * 1000 * 1000 * 1000) == 65536) // 10^10 docs -> ceiling
    // the paired cap knob: 4x the mean cell size, clamped [64, 4096]
    assert(semDedupCap(100) == 64)
    assert(semDedupCap(2000) == 180)
    assert(semDedupCap(10L * 1000 * 1000 * 1000) == 4096)
  }

  test("trainedCbN serves the measured N alongside the codebook") {
    import graft.queries.Extensions
    val dir = java.nio.file.Files.createTempDirectory("cbn").toString
    spark.range(300).select(col("id").as("vec_id"),
      array((0 until 4).map(d =>
        (pmod(hash(col("id") * 7 + d), lit(31)).cast("double") - 15.0) / 4.0): _*)
        .cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
    val (cb, n) = Extensions.trainedCbN(spark, dir, emb)
    assert(n == 300)
    // trained cell count is <= K(N) (empty cells drop) and well above 1
    val cells = cb.select(size(col("cbs"))).as[Int].head()
    assert(cells > 1 && cells <= Extensions.kmeansK(n))
  }
}
