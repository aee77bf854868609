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

  test("Tables.overwrite gives snapshot isolation: versioned dirs + manifest flip") {
    val dir = Files.createTempDirectory("graft_tbl").toString
    val path = s"$dir/t"
    assert(!Tables.exists(spark, path))
    Tables.overwrite(Seq(1, 2, 3).toDF("v"), path)
    assert(Tables.exists(spark, path))
    assert(Tables.read(spark, path).count() == 3)
    Tables.overwrite(Seq(4, 5).toDF("v"), path)
    assert(Tables.read(spark, path).as[Int].collect().toSet == Set(4, 5))
    // layout: manifest + live version + previous version (reader grace), no staging
    // (dot-prefixed entries — e.g. the local FS's checksum side files — are
    // hidden from Spark/Hadoop listings and don't participate in the layout;
    // _epoch.* fencing markers are writer bookkeeping, covered by FencingSpec)
    def visible(p: String) = new java.io.File(p).listFiles().map(_.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_epoch.")).toSet
    assert(visible(path) == Set("_current", "v00000001", "v00000002"))
    // third overwrite GCs v1, keeps v2 as the grace version
    Tables.overwrite(Seq(6).toDF("v"), path)
    assert(visible(path) == Set("_current", "v00000002", "v00000003"))
  }

  test("a reader that resolved the table before an overwrite still reads its complete snapshot") {
    val dir = Files.createTempDirectory("graft_tbl_race").toString
    val path = s"$dir/t"
    Tables.overwrite(Seq(1, 2, 3).toDF("v"), path)
    // reader resolves the manifest NOW (plan pinned to v1's files)...
    val pinned = Tables.read(spark, path)
    assert(pinned.count() == 3) // force file listing before the swap
    // ...a writer replaces the table underneath it...
    Tables.overwrite(Seq(9).toDF("v"), path)
    // ...the pinned reader still sees its complete old snapshot (v1 is
    // retained as the grace version), and a fresh reader sees the new one.
    assert(pinned.as[Int].collect().toSet == Set(1, 2, 3))
    assert(Tables.read(spark, path).as[Int].collect().toSet == Set(9))
    // at no point is the table missing: the manifest always resolves
    assert(Tables.exists(spark, path))
  }

  test("partitioned overwrite preserves (year,month) layout for pruning") {
    val dir = Files.createTempDirectory("graft_part").toString
    val df = Seq((2025, 1, "a"), (2025, 2, "b"), (2026, 1, "c")).toDF("y", "m", "v")
    Tables.overwritePartitioned(df, s"$dir/fact", Seq("y", "m"))
    val sub = new java.io.File(s"$dir/fact/v00000001").listFiles().map(_.getName).filter(_.startsWith("y=")).sorted
    assert(sub.toSeq == Seq("y=2025", "y=2026"))
    // partition pruning: reading one partition's predicate touches 1 file set
    val pruned = Tables.read(spark, s"$dir/fact").filter(col("y") === 2025 && col("m") === 2)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(pruned.count() == 1)
    assert(scanned.contains("PartitionFilters") || pruned.inputFiles.length == 1)
  }

  test("dynamic partition overwrite refreshes only the touched partitions") {
    val dir = Files.createTempDirectory("graft_dyn").toString
    val path = s"$dir/fact"
    val full = Seq((2025, 1, "jan-v1"), (2025, 2, "feb-v1"), (2025, 3, "mar-v1"))
      .toDF("y", "m", "v")
    Tables.overwritePartitionsDynamic(full, path, Seq("y", "m"))
    def fileOf(m: Int) = new java.io.File(s"$path/y=2025/m=$m").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val (jan0, feb0) = (fileOf(1), fileOf(2))
    // refresh ONLY February
    Tables.overwritePartitionsDynamic(
      Seq((2025, 2, "feb-v2")).toDF("y", "m", "v"), path, Seq("y", "m"))
    assert(fileOf(1) == jan0, "untouched partition's files must be byte-identical")
    assert(fileOf(2) != feb0, "refreshed partition rewritten")
    val now = Tables.read(spark, path).select("m", "v").as[(Int, String)].collect().toSet
    assert(now == Set((1, "jan-v1"), (2, "feb-v2"), (3, "mar-v1")))
  }
}
