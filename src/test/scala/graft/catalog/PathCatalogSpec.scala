package graft.catalog

import java.nio.file.Files
import graft.SparkSpec

/** The reference's `CREATE OR REPLACE TABLE … AS SELECT` (Gold
  * Layer.py:261,276) runs verbatim against the registered v2 catalog —
  * the form the session catalog rejects for file-source tables.
  */
class PathCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = Files.createTempDirectory("graft_cat").toString

  private def init(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[PathCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
  }

  test("CREATE OR REPLACE TABLE AS SELECT parses and executes (GL:261 verbatim shape)") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.gold_db")
    Seq((2025, 1, 10.0), (2025, 1, 5.0), (2025, 2, 7.0)).toDF("billing_year", "billing_month", "amount")
      .createOrReplaceTempView("fact_billing")
    // GL:260-271, USING parquet for USING DELTA (no Delta jars here)
    spark.sql(
      """CREATE OR REPLACE TABLE graft.gold_db.agg_revenue_month
        |USING parquet AS
        |SELECT billing_year, billing_month,
        |       SUM(amount) AS total_revenue, COUNT(*) AS lines_count
        |FROM fact_billing GROUP BY billing_year, billing_month""".stripMargin)
    val first = spark.table("graft.gold_db.agg_revenue_month")
      .select("billing_year", "billing_month", "total_revenue", "lines_count")
      .as[(Int, Int, Double, Long)].collect().toSet
    assert(first == Set((2025, 1, 15.0, 2L), (2025, 2, 7.0, 1L)))

    // OR REPLACE is the point: run again with different content, no DROP needed
    spark.sql(
      """CREATE OR REPLACE TABLE graft.gold_db.agg_revenue_month
        |USING parquet AS
        |SELECT billing_year, billing_month,
        |       SUM(amount) AS total_revenue, COUNT(*) AS lines_count
        |FROM fact_billing WHERE billing_month = 1
        |GROUP BY billing_year, billing_month""".stripMargin)
    val second = spark.table("graft.gold_db.agg_revenue_month")
      .select("billing_year", "billing_month", "total_revenue", "lines_count")
      .as[(Int, Int, Double, Long)].collect().toSet
    assert(second == Set((2025, 1, 15.0, 2L)))
  }

  test("plain CTAS, INSERT, DROP, SHOW TABLES round-trip") {
    init()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db2")
    spark.sql("CREATE TABLE graft.db2.t USING parquet AS SELECT 1 AS x")
    spark.sql("INSERT INTO graft.db2.t SELECT 2")
    assert(spark.table("graft.db2.t").as[Int].collect().toSet == Set(1, 2))
    assert(spark.sql("SHOW TABLES IN graft.db2").collect().map(_.getString(1)).toSeq == Seq("t"))
    spark.sql("DROP TABLE graft.db2.t")
    assert(!spark.catalog.tableExists("graft.db2.t"))
  }
}
