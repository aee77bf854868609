package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error envelope for the q92 bottom-k-by-hash quantile sketch: md5 order
  * is a uniform random order of the rows, so the k-row sample's quantile
  * at q has rank error ~ √(q(1-q)/k); we pin the observed error at
  * ≤ 3/√k (c = 3 ≈ 6σ of the binomial rank deviation at the median —
  * deterministic data, deterministic sample, so this is a fixed fact
  * about the operator at each k, not a flaky statistical test). Also
  * pins monotone improvement k = 64 → 1024 in aggregate, and that the
  * sample size is exactly min(k, group size).
  */
class SampleQuantileErrorSpec extends SparkSpec {
  import spark.implicits._

  // values 1..N uniform: the TRUE quantile q is q·N, so the sketch's
  // relative rank error is |p − q·N| / N
  private val N = 40000
  private def ghv = spark.range(1, N + 1).select(
    lit("g1").as("g"),
    md5(col("id").cast("string")).as("h"),
    col("id").cast("double").as("v"))

  test("observed rank error ≤ 3/√k for k in {64, 256, 1024}; error shrinks with k") {
    val errs = Seq(64, 256, 1024).map { k =>
      val row = Extensions.sampleQuantiles(spark, ghv, k)
        .select("n_sample", "p50", "p90", "p99").head()
      assert(row.getLong(0) == k.toLong, s"sample size at k=$k")
      val errAt = Seq(0.5 -> row.getDouble(1), 0.9 -> row.getDouble(2))
        .map { case (q, p) => math.abs(p - q * N) / N }
      val bound = 3.0 / math.sqrt(k.toDouble)
      errAt.zip(Seq(0.5, 0.9)).foreach { case (e, q) =>
        assert(e <= bound, f"k=$k q=$q: rank error $e%.4f > bound $bound%.4f")
      }
      errAt.max
    }
    assert(errs.last < errs.head,
      s"error did not shrink from k=64 (${errs.head}) to k=1024 (${errs.last})")
  }

  test("sample is min(k, group size); tiny group reproduces exact quantiles") {
    val tiny = spark.range(1, 11).select(
      lit("g1").as("g"), md5(col("id").cast("string")).as("h"),
      col("id").cast("double").as("v"))
    val row = Extensions.sampleQuantiles(spark, tiny, k = 256)
      .select("n_sample", "p50").head()
    assert(row.getLong(0) == 10L)
    assert(row.getDouble(1) == 5.5) // exact interpolated median of 1..10
  }
}
