package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Validates the sf-scale generator (GenScale) on a copies=2 run over the
  * sf0.001 driver data — the generator is the denominator of every sf1
  * bench/correctness claim, so its invariants get their own gate:
  *
  *   - relational tables are exactly copies× the source row count, with
  *     per-copy key domains disjoint and join fan-out per key preserved;
  *   - fixed dims (region/nation) are verbatim;
  *   - documents' planted exact-duplicate rate matches the source ±ε and
  *     the synthesized rows' source/lang mixes match the measured mixes;
  *   - reruns are value-identical (pure function of id — no dependence on
  *     partition layout, asserted by regenerating under a different
  *     parallelism and comparing full contents).
  */
class GenScaleSpec extends SparkSpec {
  private val src = "/root/testdata/sf0.001"
  private lazy val outDir = {
    val d = Files.createTempDirectory("genscale").toString
    GenScale.run(spark, src, d, copies = 2)
    d
  }

  private def rd(dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  test("relational tables scale exactly copies× with disjoint key domains") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem", "events")) {
      val srcN = rd(src, t).count()
      assert(rd(outDir, t).count() === 2 * srcN, s"table $t")
    }
    // Disjoint domains: copy-1 keys all sit above the source max.
    val srcMax = rd(src, "orders").agg(max("o_orderkey")).head.getLong(0)
    val scaled = rd(outDir, "orders")
    assert(scaled.where(col("o_orderkey") > srcMax).count() ===
      rd(src, "orders").count())
    assert(scaled.select("o_orderkey").distinct().count() === scaled.count())
  }

  test("join fan-out per key is preserved in the scaled copy") {
    // lineitem-per-order histogram must be identical between source and
    // the scaled table (offsets move key values, never group sizes).
    def fanout(dir: String): Array[(Long, Long)] = {
      import spark.implicits._
      rd(dir, "lineitem").groupBy("l_orderkey").count()
        .groupBy("count").agg(count("*").as("orders"))
        .as[(Long, Long)].collect().sortBy(_._1)
    }
    val s = fanout(src).map { case (sz, n) => (sz, n * 2) }
    assert(fanout(outDir).toSeq === s.toSeq)
  }

  test("fixed dims are verbatim") {
    for (t <- Seq("region", "nation")) {
      assert(rd(outDir, t).exceptAll(rd(src, t)).count() === 0, s"table $t")
      assert(rd(outDir, t).count() === rd(src, t).count(), s"table $t")
    }
  }

  test("documents: dup rate and categorical mixes match the source") {
    val sDocs = rd(src, "documents")
    val n = sDocs.count()
    val srcDupRate = (n - sDocs.select("text").distinct().count()).toDouble / n
    // Synthesized half only (copy 0 is the source verbatim).
    val synth = rd(outDir, "documents").where(col("doc_id") >= n)
    assert(synth.count() === n)
    val synthDupRate =
      (n - synth.select("text").distinct().count()).toDouble / n
    assert(math.abs(synthDupRate - srcDupRate) < 0.02,
      s"dup rate synth=$synthDupRate src=$srcDupRate")

    // Source/lang mix within 5 % absolute of the measured shares.
    for (cat <- Seq("source", "lang")) {
      import spark.implicits._
      val srcMix = sDocs.groupBy(cat).count().as[(String, Long)].collect()
        .map { case (k, c) => k -> c.toDouble / n }.toMap
      val synthMix = synth.groupBy(cat).count().as[(String, Long)].collect()
        .map { case (k, c) => k -> c.toDouble / n }.toMap
      for ((k, p) <- srcMix)
        assert(math.abs(synthMix.getOrElse(k, 0.0) - p) < 0.05, s"$cat=$k")
    }
  }

  test("embeddings: copies× rows, synthesized label mix matches source") {
    val sEmb = rd(src, "embeddings")
    val n = sEmb.count()
    val out = rd(outDir, "embeddings")
    assert(out.count() === 2 * n)
    import spark.implicits._
    val srcMix = sEmb.groupBy("label").count().as[(Int, Long)].collect()
      .map { case (k, c) => k -> c.toDouble / n }.toMap
    val synthMix = out.where(col("vec_id") >= n)
      .groupBy("label").count().as[(Int, Long)].collect()
      .map { case (k, c) => k -> c.toDouble / n }.toMap
    for ((k, p) <- srcMix)
      assert(math.abs(synthMix.getOrElse(k, 0.0) - p) < 0.05, s"label=$k")
  }

  test("regeneration under a different partition layout is value-identical") {
    // Every per-row decision is a pure function of id, so the synthesis
    // range's split count must not change any value.
    val d2 = Files.createTempDirectory("genscale2").toString
    val d7 = Files.createTempDirectory("genscale7").toString
    GenScale.run(spark, src, d2, copies = 2, slices = Some(2))
    GenScale.run(spark, src, d7, copies = 2, slices = Some(7))
    for (t <- Seq("documents", "embeddings")) {
      val a = rd(d2, t)
      val b = rd(d7, t)
      assert(a.count() === b.count(), s"table $t")
      assert(a.exceptAll(b).count() === 0, s"table $t differs")
    }
  }
}
