package graft.queries

import java.nio.file.Files
import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** SQL/catalog surface parity (SURVEY.md §2.1 S8/S9/S10): CREATE DATABASE,
  * CTAS over parquet, catalog existence probes, and the path-catalog's
  * atomic overwrite.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE DATABASE IF NOT EXISTS + CTAS + tableExists (GL:16-21,260-288)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS gold_test")
    assert(!spark.catalog.tableExists("gold_test.agg_demo"))
    Seq((2025, 1, 10.0), (2025, 1, 5.0), (2025, 2, 7.0)).toDF("y", "m", "amount")
      .createOrReplaceTempView("fact_demo")
    // "CREATE OR REPLACE TABLE" needs a v2 catalog; the session catalog's
    // parquet source supports plain CTAS — DROP IF EXISTS + CREATE is the
    // equivalent idempotent shape.
    spark.sql("DROP TABLE IF EXISTS gold_test.agg_demo")
    spark.sql(
      """CREATE TABLE gold_test.agg_demo USING parquet AS
        |SELECT y, m, SUM(amount) AS total, COUNT(*) AS n
        |FROM fact_demo GROUP BY y, m""".stripMargin)
    assert(spark.catalog.tableExists("gold_test.agg_demo"))
    val rows = spark.table("gold_test.agg_demo")
      .select("y", "m", "total", "n").as[(Int, Int, Double, Long)].collect().toSet
    assert(rows == Set((2025, 1, 15.0, 2L), (2025, 2, 7.0, 1L)))
    spark.sql("DROP TABLE gold_test.agg_demo")
    spark.sql("DROP DATABASE gold_test")
  }

  test("Tables.overwrite is swap-atomic: old data readable until replaced, no staging leftovers") {
    val dir = Files.createTempDirectory("graft_tbl").toString
    val path = s"$dir/t"
    assert(!Tables.exists(spark, path))
    Tables.overwrite(Seq(1, 2, 3).toDF("v"), path)
    assert(Tables.exists(spark, path))
    assert(spark.read.parquet(path).count() == 3)
    Tables.overwrite(Seq(4, 5).toDF("v"), path)
    assert(spark.read.parquet(path).as[Int].collect().toSet == Set(4, 5))
    val leftovers = new java.io.File(dir).listFiles().map(_.getName).filter(_.contains("__"))
    assert(leftovers.isEmpty)
  }

  test("partitioned overwrite preserves (year,month) layout for pruning") {
    val dir = Files.createTempDirectory("graft_part").toString
    val df = Seq((2025, 1, "a"), (2025, 2, "b"), (2026, 1, "c")).toDF("y", "m", "v")
    Tables.overwritePartitioned(df, s"$dir/fact", Seq("y", "m"))
    val sub = new java.io.File(s"$dir/fact").listFiles().map(_.getName).filter(_.startsWith("y=")).sorted
    assert(sub.toSeq == Seq("y=2025", "y=2026"))
    // partition pruning: reading one partition's predicate touches 1 file set
    val pruned = spark.read.parquet(s"$dir/fact").filter(col("y") === 2025 && col("m") === 2)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(pruned.count() == 1)
    assert(scanned.contains("PartitionFilters") || pruned.inputFiles.length == 1)
  }
}
