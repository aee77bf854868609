package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnosis for q30/q36's outsized HLL wall at sf0.1: times
  * variations of the approx_count_distinct aggregate under the bench
  * session to attribute the cost (rsd, group-by vs global, action).
  */
object HllDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(f: => Unit): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); f
        println(f"[hll] $label%-50s round$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("sum baseline")(noop(li.groupBy(col("l_returnflag")).agg(sum("l_partkey"))))
    time("acd rsd=0.05 one col")(noop(
      li.groupBy(col("l_returnflag")).agg(approx_count_distinct(col("l_partkey"), 0.05))))
    time("acd rsd=0.01 one col")(noop(
      li.groupBy(col("l_returnflag")).agg(approx_count_distinct(col("l_partkey"), 0.01))))
    time("acd rsd=0.01 two cols (q30 shape)")(noop(
      li.groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_partkey"), 0.01),
        approx_count_distinct(col("l_suppkey"), 0.01))))
    time("acd rsd=0.01 global no groupBy")(noop(
      li.agg(approx_count_distinct(col("l_partkey"), 0.01))))
    time("exact countDistinct two cols (q29 shape)")(noop(
      li.groupBy(col("l_returnflag")).agg(
        countDistinct(col("l_partkey")), countDistinct(col("l_suppkey")))))
    spark.conf.set("spark.sql.codegen.maxFields", "8000")
    time("acd rsd=0.01 two cols, maxFields=8000")(noop(
      li.groupBy(col("l_returnflag")).agg(
        approx_count_distinct(col("l_partkey"), 0.01),
        approx_count_distinct(col("l_suppkey"), 0.01))))
    val df = li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey"), 0.01),
      approx_count_distinct(col("l_suppkey"), 0.01))
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("HashAggregate") || l.contains("WholeStageCodegen") || l.contains("Scan"))
      .mkString("\n"))
    spark.conf.set("spark.sql.codegen.maxFields", "100")
    println(li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey"), 0.01))
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("HashAggregate") || l.contains("WholeStageCodegen"))
      .mkString("\n"))
    spark.stop()
  }
}
