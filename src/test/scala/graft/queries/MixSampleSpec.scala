package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants for q75-q78 (cube, unpivot, balanced sampling,
  * mixture weights); value-level correctness is pinned by the DuckDB
  * oracles.
  */
class MixSampleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q75: cube emits the full grouping lattice with consistent totals") {
    val out = Parity.q75CubeAgg(spark, dir).cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    val nLang = docs.select("lang").distinct().count()
    val nSrc = docs.select("source").distinct().count()
    val nPair = docs.select("lang", "source").distinct().count()
    // gid bitmask: 0 = (lang, source), 1 = per-lang (source aggregated),
    // 2 = per-source, 3 = grand total.
    assert(out.filter($"gid" === 0).count() == nPair)
    assert(out.filter($"gid" === 1).count() == nLang)
    assert(out.filter($"gid" === 2).count() == nSrc)
    assert(out.filter($"gid" === 3).count() == 1)
    assert(out.count() == nPair + nLang + nSrc + 1)
    // every slice of the lattice accounts for all documents
    val total = docs.count()
    Seq(0, 1, 2, 3).foreach { g =>
      assert(out.filter($"gid" === g).agg(sum($"n_docs")).as[Long].head() == total)
    }
    // aggregated-away dimensions are null exactly per the bitmask
    assert(out.filter($"gid" === 1 && $"source".isNotNull).count() == 0)
    assert(out.filter($"gid" === 2 && $"lang".isNotNull).count() == 0)
    assert(out.filter($"gid" === 0 && ($"lang".isNull || $"source".isNull)).count() == 0)
    out.unpersist(); docs.unpersist()
  }

  test("q76: unpivot emits one row per (year, metric) and preserves values") {
    val out = Parity.q76Unpivot(spark, dir).cache()
    val years = spark.read.parquet(s"$dir/orders.parquet")
      .select(year($"o_orderdate")).distinct().count()
    assert(out.count() == years * 3)
    assert(out.select("metric").distinct().as[String].collect().sorted
      .sameElements(Array("n_custs", "n_orders", "revenue")))
    // long-format revenue equals the wide aggregation it was melted from
    val wide = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(year($"o_orderdate").as("order_year"))
      .agg(round(sum($"o_totalprice".cast("decimal(18,6)")), 2).cast("double").as("v"))
    val melted = out.filter($"metric" === "revenue").select($"order_year", $"value")
    assert(melted.join(wide, Seq("order_year")).filter($"value" =!= $"v").count() == 0)
    out.unpersist()
  }

  test("q77: exactly min(k, stratum size) rows per stratum, minimal hashes win") {
    val out = Extensions.q77BalancedSample(spark, dir).cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"lang", $"source", $"doc_id",
        md5(concat($"doc_id".cast("string"), lit(":"), $"text")).as("h"))
      .cache()
    val strata = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val got = out.groupBy("lang", "source").agg(count(lit(1)).as("k"))
    assert(got.join(strata, Seq("lang", "source"), "full")
      .filter($"k" =!= least($"n", lit(Extensions.SampleK.toLong))).count() == 0)
    // the kept hashes are the k smallest of each stratum (window reference)
    val ref = docs.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"lang", $"source").orderBy($"h", $"doc_id")))
      .filter($"rn" <= Extensions.SampleK)
      .select("lang", "source", "doc_id", "h")
    assert(out.except(ref).count() == 0 && ref.except(out).count() == 0)
    out.unpersist(); docs.unpersist()
  }

  test("q77: membership is content-deterministic across partitionings") {
    val a = Extensions.q77BalancedSample(spark, dir)
    val b = Extensions.q77BalancedSample(spark, dir)
      .repartition(7).sort("lang", "source", "doc_id")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("q78: shares and weights each sum to ~1, boost consistent") {
    val out = Extensions.q78MixtureWeights(spark, dir).cache()
    val sums = out.agg(sum($"share"), sum($"weight")).as[(Double, Double)].head()
    assert(math.abs(sums._1 - 1.0) < 1e-3, s"share sum ${sums._1}")
    assert(math.abs(sums._2 - 1.0) < 1e-3, s"weight sum ${sums._2}")
    assert(out.filter($"weight" <= 0 || $"share" <= 0).count() == 0)
    // boost == weight/share up to the rounding of its factors
    assert(out.filter(abs($"boost" - $"weight" / $"share") > lit(0.01)).count() == 0)
    // temperature flattens: the smallest domain is boosted above the largest
    val rows = out.orderBy($"tokens").select($"boost").as[Double].collect()
    assert(rows.head > rows.last)
    out.unpersist()
  }
}
