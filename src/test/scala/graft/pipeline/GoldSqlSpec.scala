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

  test("missing fact skips the aggregate with a reason (GL:262 guard)") {
    val wh = Files.createTempDirectory("graft_goldsql_empty").toString
    val logged = scala.collection.mutable.ArrayBuffer.empty[String]
    val skipped = Gold.runSqlAggregates(spark, wh, logged.append)
    assert(skipped.size == 2 && skipped == logged.toSeq)
    assert(skipped.forall(_.contains("not built")))
  }
}
