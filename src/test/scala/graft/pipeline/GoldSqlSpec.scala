package graft.pipeline

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GL:260-288's CREATE OR REPLACE TABLE aggregates run verbatim through
  * the v2 PathCatalog, fed by the real pipeline over the reference's raw
  * data, and agree with the DataFrame-built aggregate tables.
  */
class GoldSqlSpec extends SparkSpec {

  test("SQL aggregates match the DataFrame aggregates on the reference data") {
    val wh = Files.createTempDirectory("graft_goldsql").toString
    Silver.run(spark, "/root/reference/hospital_raw_data", wh, LocalDate.parse("2026-01-01"))
    Gold.run(spark, wh, LocalDate.parse("2026-02-01"), _ => ())
    val skipped = Gold.runSqlAggregates(spark, wh, _ => ())
    assert(skipped.isEmpty)

    val sqlRev = spark.table("graft_gold.gold_db.agg_revenue_month")
    val dfRev = graft.io.Tables.read(spark, Gold.goldPath(wh, "agg_revenue_month"))
    assert(sqlRev.count() == dfRev.count() && sqlRev.count() > 0)
    assert(sqlRev.join(dfRev, Seq("billing_year", "billing_month"))
      .filter(sqlRev("total_revenue") =!= dfRev("total_revenue") ||
        sqlRev("lines_count") =!= dfRev("lines_count")).count() == 0)

    val sqlAdm = spark.table("graft_gold.gold_db.agg_admissions_reason_month")
    val dfAdm = graft.io.Tables.read(spark, Gold.goldPath(wh, "agg_admissions_reason_month"))
    assert(sqlAdm.count() == dfAdm.count() && sqlAdm.count() > 0)

    // OR REPLACE semantics: a second run replaces, not fails/duplicates
    assert(Gold.runSqlAggregates(spark, wh, _ => ()).isEmpty)
    assert(spark.table("graft_gold.gold_db.agg_revenue_month").count() == dfRev.count())
  }

  test("every gold and silver table resolves by catalog name (warehouse unification)") {
    val wh = Files.createTempDirectory("graft_goldcat").toString
    Silver.run(spark, "/root/reference/hospital_raw_data", wh, LocalDate.parse("2026-01-01"))
    Gold.run(spark, wh, LocalDate.parse("2026-02-01"), _ => ())
    Gold.registerWarehouseCatalog(spark, wh, "graft_wh")

    val goldTables = Seq("dim_patient", "dim_doctor", "dim_date", "fact_billing",
      "fact_admissions", "fact_vitals", "fact_doctor_activity",
      "agg_revenue_month", "agg_admissions_reason_month")
    goldTables.foreach { t =>
      val byCatalog = spark.table(s"graft_wh.gold.$t")
      val byPath = graft.io.Tables.read(spark, Gold.goldPath(wh, t))
      assert(byCatalog.count() == byPath.count() && byCatalog.count() > 0, s"gold.$t")
      assert(byCatalog.columns.sorted.sameElements(byPath.columns.sorted), s"gold.$t schema")
    }
    Silver.entities.foreach { e =>
      val byCatalog = spark.table(s"graft_wh.silver.${e.name}")
      val byPath = graft.io.Tables.read(spark, Silver.silverPath(wh, e.name))
      assert(byCatalog.count() == byPath.count() && byCatalog.count() > 0, s"silver.${e.name}")
    }

    // partitioned facts keep partition pruning through the catalog read
    val pruned = spark.table("graft_wh.gold.fact_billing")
      .filter(col("billing_year") === 2024)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("billing_year"), s"partition column lost:\n$plan")

    // sink-managed tables are read-only through the catalog — including
    // the SCD2 history dirs, whose schema sidecar must NOT be mistaken for
    // PathCatalog's own writable-table marker
    intercept[Exception] {
      spark.sql("INSERT INTO graft_wh.gold.dim_doctor SELECT * FROM graft_wh.gold.dim_doctor")
    }
    intercept[Exception] {
      spark.sql("INSERT INTO graft_wh.silver.doctors SELECT * FROM graft_wh.silver.doctors")
    }
  }

  test("missing fact skips the aggregate with a reason (GL:262 guard)") {
    val wh = Files.createTempDirectory("graft_goldsql_empty").toString
    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = Gold.runSqlAggregates(spark, wh, logged.append)
    assert(skipped.size == 2 && skipped == logged.toSeq)
    assert(skipped.forall(_.contains("not built")))
  }
}
