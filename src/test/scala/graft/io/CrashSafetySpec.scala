package graft.io

import java.nio.file.Files
import java.time.LocalDate
import graft.SparkSpec
import graft.engine.Scd2
import org.apache.spark.sql.functions._

/** Crash-window behavior of the three write paths. Each test plants the
  * exact on-disk/metastore state a killed writer leaves behind and asserts
  * the next operation recovers instead of corrupting:
  *  - [[Tables.overwrite]]: an abandoned promoted-but-unpublished `vN`
  *    directory (crash between rename and manifest flip) must not be
  *    republished or nested into;
  *  - [[Tables.overwriteBucketed]]: a crash in the live-name-unbound window
  *    leaves `__staging`/`__old` — [[Tables.recoverStaged]] promotes the
  *    survivor so a tableExists-gated merge does not silently bootstrap;
  *  - [[graft.catalog.PathCatalog]] REPLACE: a failed write job aborts and
  *    RESTORES the previous contents (stage-and-swap, not delete-then-write).
  */
class CrashSafetySpec extends SparkSpec {
  import spark.implicits._

  test("overwrite recovers from an abandoned vN left by a crashed promotion") {
    val root = Files.createTempDirectory("graft_crash_ow").toString
    Tables.overwrite(Seq((1, "a")).toDF("id", "v"), root) // publishes v00000001
    // Crashed writer: promoted v00000002 with garbage, died before the flip.
    val stale = new java.io.File(s"$root/v00000002")
    assert(stale.mkdirs())
    Files.writeString(stale.toPath.resolve("junk.txt"), "not parquet")

    Tables.overwrite(Seq((2, "b")).toDF("id", "v"), root)
    val rows = Tables.read(spark, root).as[(Int, String)].collect().toSeq
    assert(rows == Seq((2, "b")), "the new snapshot, not the crash leftovers, is live")
  }

  test("recoverStaged promotes __staging when a crash unbound the live name") {
    val table = "crash_recover_t"
    try {
      val asOf = LocalDate.parse("2026-01-01")
      Tables.overwriteBucketed(
        Scd2.bootstrap(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), asOf), table, Seq("id"), 2)
      val merged = Scd2.merge(spark.table(table), Seq((1L, "a2")).toDF("id", "v"),
        Seq("id"), Seq("v"), asOf.plusMonths(1))
      // Replay overwriteBucketed up to the crash point: staging written,
      // live renamed away, staging NOT yet promoted.
      spark.sql(s"DROP TABLE IF EXISTS ${table}__staging")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__old")
      Tables.saveBucketed(merged, s"${table}__staging", Seq("id"), 2)
      spark.sql(s"ALTER TABLE $table RENAME TO ${table}__old")
      assert(!spark.catalog.tableExists(table))

      assert(Tables.recoverStaged(spark, table), "recovery must fire")
      val state = spark.table(table)
      assert(state.count() == 3, "full merged history (id1 expired + id1 new current + id2)")
      assert(state.filter(col("id") === 1L && col("is_current"))
        .select("v").as[String].head() == "a2")
      assert(!Tables.recoverStaged(spark, table), "idempotent once live exists")
    } finally {
      Seq(table, s"${table}__staging", s"${table}__old")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("PathCatalog INSERT OVERWRITE failure restores the previous table contents") {
    val wh = Files.createTempDirectory("graft_crash_cat").toString
    spark.conf.set("spark.sql.catalog.graft_crash", classOf[graft.catalog.PathCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_crash.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_crash.db")
    spark.sql("CREATE TABLE graft_crash.db.t USING parquet AS SELECT 1 AS x")
    spark.sql("CREATE TABLE graft_crash.db.src USING parquet AS SELECT 5 AS y")

    // The failure must happen inside the WRITE JOB (after toBatch parked the
    // old files), not at planning: raise_error on a data-dependent branch.
    intercept[Exception] {
      spark.sql(
        """INSERT OVERWRITE graft_crash.db.t
          |SELECT CASE WHEN y > 0 THEN cast(raise_error('boom') AS int) ELSE y END AS x
          |FROM graft_crash.db.src""".stripMargin)
    }
    assert(spark.table("graft_crash.db.t").as[Int].collect().toSeq == Seq(1),
      "previous contents survive a failed INSERT OVERWRITE")

    // and a successful overwrite afterwards still works (park dir cleanup)
    spark.sql("INSERT OVERWRITE graft_crash.db.t SELECT 2 AS x")
    assert(spark.table("graft_crash.db.t").as[Int].collect().toSeq == Seq(2))
  }
}
