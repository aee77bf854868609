
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q20Prof {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime()-t0)/1e9}%.1f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    t("bigram only: sum sizes")(
      raw.select(expr("bigram_h60s(coalesce(text,''))").as("g")).agg(sum(size(col("g")))).collect())
    t("ngram4 only: sum sizes")(
      raw.select(expr("ngram_h60s(coalesce(text,''), 4)").as("g")).agg(sum(size(col("g")))).collect())
    t("both + sort ghs: sum sizes")(
      raw.select(array_sort(expr("bigram_h60s(coalesce(text,''))")).as("g"),
        expr("ngram_h60s(coalesce(text,''), 4)").as("s"))
        .agg(sum(size(col("g"))), sum(size(col("s")))).collect())
    val hashed = raw.select(col("source"), col("doc_id"),
        array_sort(expr("bigram_h60s(coalesce(text,''))")).as("ghs"),
        expr("ngram_h60s(coalesce(text,''), 4)").as("sgs"))
      .withColumn("gsz", size(col("ghs"))).filter(col("gsz") > 0)
    val pinned = t("pin (localCheckpoint)")(hashed.localCheckpoint())
    val bands = pinned.select(col("source"), col("doc_id"),
        posexplode(expr("jac_band_keys(sgs)")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "k"))
    t("bands count")(println(bands.count()))
    val live = bands.groupBy(col("source"), col("band"), col("k"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1 && col("n") <= 64).drop("n")
    t("live count")(println(live.count()))
    val joined = bands.join(live, Seq("source", "band", "k"))
      .join(pinned.select(col("source"), col("doc_id"), col("gsz"), col("ghs")),
        Seq("source", "doc_id"))
    t("joined count")(println(joined.count()))
    // the production plan end-to-end (noop sink, like Bench): the delta
    // over the phases above is the pair-expansion + exact-verify cost
    t("full q20 (noop)")(
      graft.queries.Extensions.q20JaccardPairs(spark, dir)
        .write.mode("overwrite").format("noop").save())
  }
}
