package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Extensions.{HotBucketCap, JacBands}

/** Diagnostic for q20's LSH stage costs across scale factors: bucket-size
  * histogram, live/flooded bucket counts, and the candidate-pair volume
  * Σ C(n,2) that the exact-verify join must absorb. Reads the same
  * `bigram_h60s` + `jac_band_keys` pipeline as q20 itself.
  *
  * Usage: `Q20Diag <sfDir> [stage]` — stage `buckets` (default) or
  * `cands` (also counts distinct candidate pairs).
  */
object Q20Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata_sf1")
    val stage = if (args.length > 1) args(1) else "buckets"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Mirrors q20's round-12 split: ghs (bigram hashes) is the VERIFY
    // set, sgs (JacShingle-word shingle hashes) is the SIGNATURE set.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("doc_id"),
        expr("bigram_h60s(coalesce(text, ''))").as("ghs"),
        expr(s"ngram_h60s(coalesce(text, ''), ${graft.queries.Extensions.JacShingle})")
          .as("sgs"))
      .filter(size(col("ghs")) > 0)
    val n = docs.count()
    println(s"docs=$n sig_shingle=${graft.queries.Extensions.JacShingle}")

    val bands = docs.select(col("source"), col("doc_id"),
        posexplode(expr("jac_band_keys(sgs)")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "k"))

    val sizes = bands.groupBy("source", "band", "k").agg(count(lit(1)).as("n"))
    val hist = sizes.select(
        when(col("n") === 1, "1")
          .when(col("n") <= 4, "2-4")
          .when(col("n") <= 16, "5-16")
          .when(col("n") <= HotBucketCap, s"17-$HotBucketCap")
          .otherwise(s">$HotBucketCap (flooded)").as("bucket_size"),
        col("n"))
      .groupBy("bucket_size")
      .agg(count(lit(1)).as("buckets"),
        sum(col("n")).as("members"),
        sum((col("n") * (col("n") - 1)).cast("long") / 2).cast("long").as("pairs"))
      .orderBy("bucket_size")
    hist.show(false)

    val live = sizes.filter(col("n") > 1 && col("n") <= HotBucketCap)
    val agg = live.agg(count(lit(1)).as("live_buckets"),
      sum((col("n") * (col("n") - 1)).cast("long") / 2).cast("long")
        .as("cand_pairs_with_dup")).collect()(0)
    println(s"live_buckets=${agg.getLong(0)} cand_pair_slots=${agg.getLong(1)}")

    if (stage == "cands") {
      val cand = bands.join(live.drop("n"), Seq("source", "band", "k"))
        .groupBy(col("source"), col("band"), col("k"))
        .agg(collect_list("doc_id").as("ids"))
        .select(col("source"), explode(expr(
          """flatten(transform(ids, (x, i) ->
            |  transform(slice(ids, i + 2, size(ids)),
            |            y -> named_struct('a_id', x, 'b_id', y))))""".stripMargin)).as("p"))
        .select(col("source"), col("p.a_id"), col("p.b_id"))
      val distinctCands = cand.distinct()
      println(s"distinct_cands=${distinctCands.count()}")
      // Exact-Jaccard histogram over a hash-sample of distinct candidates:
      // tells which similarity stratum DOMINATES candidate volume, which is
      // what any banding change (rows-per-band, band count) trades against.
      val sample = distinctCands
        .filter(pmod(xxhash64(col("a_id"), col("b_id")), lit(100)) === 0)
        .join(docs.select(col("source"), col("doc_id").as("a_id"),
          col("ghs").as("a_ghs")), Seq("source", "a_id"))
        .join(docs.select(col("source"), col("doc_id").as("b_id"),
          col("ghs").as("b_ghs")), Seq("source", "b_id"))
      val inter = size(array_intersect(col("a_ghs"), col("b_ghs")))
      sample.select((inter.cast("double") /
          (size(col("a_ghs")) + size(col("b_ghs")) - inter).cast("double")).as("jac"))
        .select(floor(col("jac") * 20).cast("int").as("jac_bin_x20"))
        .groupBy("jac_bin_x20").agg(count(lit(1)).as("sampled_pairs_x100"))
        .orderBy("jac_bin_x20")
        .show(30, false)
    }
    spark.stop()
  }
}
