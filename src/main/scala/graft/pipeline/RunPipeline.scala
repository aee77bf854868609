package graft.pipeline

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import graft.io.Tables

/** CLI entry for the medallion pipeline.
  * Usage: runMain graft.pipeline.RunPipeline <rawDir> <warehouseDir> [asOfDate]
  * Re-running against an existing warehouse performs SCD2 merges
  * (incremental load); a fresh warehouse bootstraps.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val rawDir = args(0)
    val warehouse = args(1)
    val asOf = if (args.length > 2) LocalDate.parse(args(2)) else LocalDate.now()
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
    Silver.run(spark, rawDir, warehouse, asOf)
    Gold.run(spark, warehouse, asOf)
    // GL:260-288 verbatim, via PathCatalog. runSqlAggregates skips an
    // aggregate when its upstream fact wasn't built (drift tolerance), so
    // the row-count print is gated on the skip list — printing
    // unconditionally would throw NoSuchTable and defeat skip-and-continue.
    val sqlSkips = Gold.runSqlAggregates(spark, warehouse)
    if (!sqlSkips.exists(_.contains("fact_billing")))
      println(s"[pipeline] graft_gold.gold_db.agg_revenue_month rows=" +
        spark.table("graft_gold.gold_db.agg_revenue_month").count())
    (Silver.entities.map(e => Silver.silverPath(warehouse, e.name)) ++
      Seq("dim_patient", "dim_doctor", "dim_date", "fact_billing", "fact_admissions",
        "fact_vitals", "fact_doctor_activity", "agg_revenue_month",
        "agg_admissions_reason_month").map(Gold.goldPath(warehouse, _)))
      .foreach { p =>
        println(s"[pipeline] $p rows=${Tables.read(spark, p).count()}")
      }
    spark.stop()
  }
}
