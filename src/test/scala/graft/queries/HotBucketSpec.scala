package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-input behavior of the capped bucket pair generators: a
  * duplicate flood (10⁴ identical docs → one bucket) must complete with
  * bounded aggregation state and still emit correct pairs for the
  * non-degenerate remainder — the failure mode a 100 TB corpus hits
  * whenever a boilerplate page is crawled a million times.
  */
class HotBucketSpec extends SparkSpec {
  import spark.implicits._

  /** The q18/q37/q32 shape: bucket → capped member list → i<j expansion. */
  private def pairsOf(df: DataFrame): DataFrame =
    df.groupBy(col("bucket"))
      .agg(expr(s"bounded_sorted_list(${Extensions.HotBucketCap}, id)").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> named_struct('a_id', x, 'b_id', y))))""".stripMargin)).as("p"))
      .select(col("p.a_id"), col("p.b_id"))

  test("a 10k-member flood bucket is capped; normal buckets are exact; the dedup survivor is kept") {
    val cap = Extensions.HotBucketCap
    // flood: 10^4 members in bucket 0; normal: 3 members in bucket 1, 2 in bucket 2
    val flood = (1L to 10000L).map(id => (0, id))
    val normal = Seq((1, 20001L), (1, 20002L), (1, 20003L), (2, 30001L), (2, 30002L))
    val df = (flood ++ normal).toDF("bucket", "id").repartition(16)

    val got = pairsOf(df).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // normal buckets: exact pairs survive untouched
    val wantNormal = Set((20001L, 20002L), (20001L, 20003L), (20002L, 20003L), (30001L, 30002L))
    assert(wantNormal.subsetOf(got))

    // flood bucket: exactly C(cap, 2) pairs over the cap smallest ids —
    // not C(10^4, 2) ≈ 5·10⁷ — and id=1 (the dedup survivor) is present
    val floodPairs = got.filter(_._1 <= 10000L)
    assert(floodPairs.size == cap * (cap - 1) / 2,
      s"flood emitted ${floodPairs.size} pairs, want C($cap,2)")
    assert(floodPairs.flatMap(p => Set(p._1, p._2)) == (1L to cap.toLong).toSet,
      "capped members are the k smallest — the minimum id (dedup survivor) is kept")
  }

  test("the cap never binds at test scale: every real bucket is far below HotBucketCap") {
    // The premise that lets the uncapped DuckDB oracles keep hash-matching
    // q18/q37/q32: on non-adversarial data no bucket reaches the cap. The
    // largest bucket across all three generators' keys stays well under it.
    val dir = "/root/testdata/sf0.001"
    val emb = graft.io.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.SimilarityFunctions
          .lshBucket(col("embedding").cast("array<double>"), Extensions.Planes).as("bucket"))
    val maxEmbBucket = emb.groupBy("bucket").count().agg(max("count")).as[Long].head()
    assert(maxEmbBucket < Extensions.HotBucketCap,
      s"embedding bucket size $maxEmbBucket reaches the cap — oracle equivalence would break")

    // and the capped queries still run end-to-end with their contracts
    assert(Extensions.q37SimhashPairs(spark, dir).filter(col("hamming") > 2).count() == 0)
    assert(Extensions.q32CosineNeardup(spark, dir).filter(col("sim") < 0.3).count() == 0)
  }
}
