package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants for the round-6 curation operators (q66-q68,
  * q70); value-level correctness is pinned by the DuckDB oracles.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q66: chunk accounting and reassembly invariants") {
    val out = Extensions.q66LineDedup(spark, dir).cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.count() == docs) // no document disappears
    assert(out.filter($"n_kept" === 0 && $"text_clean".isNotNull).count() == 0)
    assert(out.filter($"n_kept" > 0 && $"text_clean".isNull).count() == 0)
    val joined = out.join(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
      Seq("doc_id"))
    // kept + dropped = total chunk count derived from the source text
    assert(joined.filter($"n_kept" + $"n_dropped" =!=
      ceil(size(split($"text", " ")) / lit(Extensions.ChunkTokens.toDouble))
        .cast("long")).count() == 0)
    // reassembly never grows the document
    assert(joined.filter(size(split($"text_clean", " ")) >
      size(split($"text", " "))).count() == 0)
    out.unpersist()
  }

  test("q66: a planted corpus-wide chunk is dropped from every doc") {
    // Verify the boilerplate rule directly on a tiny controlled corpus by
    // reproducing the pipeline's chunking constants.
    val boiler = "please subscribe now"   // one exact chunk (3 tokens)
    val base = (1 to 6).map(i => (i.toLong, s"$boiler unique$i tail$i extra$i"))
    val df = base.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("q66").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Extensions.q66LineDedup(spark, tmp)
    val clean = out.orderBy("doc_id").collect()
    assert(clean.forall(r => !r.getString(1).contains("subscribe")))
    assert(clean.forall(r => r.getLong(3) >= 1)) // each doc dropped >= 1 chunk
  }

  test("q67: benchmark docs excluded, hits consistent") {
    val out = Extensions.q67Decontaminate(spark, dir).cache()
    assert(out.filter($"doc_id" % Extensions.BenchmarkMod === 0).count() == 0)
    assert(out.filter($"contaminated" =!= ($"n_hits" > 0)).count() == 0)
    assert(out.filter($"n_hits" < 0).count() == 0)
    out.unpersist()
  }

  test("q67: a doc sharing a benchmark shingle is flagged") {
    val bench = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (0L, bench),                                  // benchmark (0 % mod == 0)
      (1L, s"noise one two alpha beta gamma delta filler"), // contains a 4-gram
      (2L, "totally disjoint words here nothing shared at all")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("q67").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Extensions.q67Decontaminate(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L))
    assert(!out(2L))
    assert(!out.contains(0L))
  }

  test("q70: fluency score bounds and controlled-corpus values") {
    val out = Extensions.q70BigramFluency(spark, dir).cache()
    // every scored doc has >= 1 bigram and both ratios land in range:
    // avg_df in [1, #docs], rare_frac in [0, 1]
    assert(out.filter($"n_bigrams" < 1).count() == 0)
    assert(out.filter($"avg_df" < 1.0 || $"rare_frac" < 0.0 || $"rare_frac" > 1.0)
      .count() == 0)
    out.unpersist()

    // Controlled corpus: "a b" is in 3 docs (common), each docN tail bigram
    // is unique (rare at RareMaxDocs = 2).
    val df = Seq(
      (1L, "a b one1 two1"), (2L, "a b one2 two2"), (3L, "a b one3 two3")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("q70").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Extensions.q70BigramFluency(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    // each doc: 3 bigrams ("a b" df=3; "b oneN" df=1; "oneN twoN" df=1)
    rows.values.foreach { case (n, avg, rare) =>
      assert(n == 3L)
      assert(math.abs(avg - 5.0 / 3) < 1e-3) // (3 + 1 + 1) / 3, floor-rounded
      assert(math.abs(rare - 2.0 / 3) < 1e-3)
    }
  }

  test("q68: envelope sanity — MAD >= 0, outliers a strict minority") {
    val out = Extensions.q68RobustOutliers(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (mad, n, nOut) = (r.getDouble(2), r.getLong(3), r.getLong(4))
      assert(mad >= 0.0)
      assert(nOut >= 0 && nOut < n / 2) // median-based: < half can be outliers
    }
  }
}
