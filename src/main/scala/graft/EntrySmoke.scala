package graft

import org.apache.spark.sql.SparkSession

/** Smoke-check of the driver contract's flagship entry point: prints the
  * row count and first rows of SparkEntry.entry on sf0.001.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"[entry-smoke] rows=${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
