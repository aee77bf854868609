package graft.engine

import java.time.LocalDate
import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Exchange-free SCD2 at scale: with the history table BUCKETED on the
  * merge key, Scd2.merge's full-outer join reads the history side
  * pre-partitioned — the ONLY exchange in the merge plan is the incoming
  * batch being shuffled to the bucket layout. The history (the 100 TB
  * side) never re-shuffles.
  */
class Scd2BucketedSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("id")
  private val compare = Seq("v")

  test("merge over a bucketed history plans with zero history-side exchanges") {
    val table = "scd2_bucketed_hist"
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val boot = Scd2.bootstrap(
        (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v"), LocalDate.parse("2026-01-01"))
      Tables.overwriteBucketed(boot, table, keys, 4)

      val batch = Seq((1L, "v1x"), (1001L, "new")).toDF("id", "v")
      val merged = Scd2.merge(spark.table(table), batch, keys, compare,
        LocalDate.parse("2026-02-01"))

      val plan = merged.queryExecution.executedPlan.toString
      // exactly one exchange: the source batch moving to the bucket layout
      val exchanges = "(?m)^[^\\n]*\\bExchange\\b".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected 1 exchange (source side only), got $exchanges:\n$plan")
      // and the history side genuinely reads buckets
      assert(plan.contains("Bucketed: true"), s"history scan not bucketed:\n$plan")

      // semantics unchanged: write back, check state
      Tables.overwriteBucketed(merged, table, keys, 4)
      val state = spark.table(table)
      assert(state.count() == 1002) // 1000 + expired v1 + new key
      assert(state.filter(col("is_current")).count() == 1001)
      assert(state.filter(col("id") === 1L && col("is_current"))
        .select("v").as[String].head() == "v1x")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__staging")
    }
  }

  test("overwriteBucketed supports the read-then-overwrite cycle repeatedly") {
    val table = "scd2_bucketed_cycle"
    try {
      var asOf = LocalDate.parse("2026-01-01")
      Tables.overwriteBucketed(
        Scd2.bootstrap(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), asOf), table, keys, 2)
      // three merge cycles, each reading the table it overwrites
      Seq("a2", "a3", "a4").foreach { v =>
        asOf = asOf.plusMonths(1)
        val merged = Scd2.merge(spark.table(table),
          Seq((1L, v)).toDF("id", "v"), keys, compare, asOf)
        Tables.overwriteBucketed(merged, table, keys, 2)
      }
      val state = spark.table(table)
      assert(state.count() == 5) // 2 bootstrap + 3 expired versions of id=1
      assert(state.filter(col("id") === 1L && col("is_current"))
        .select("v").as[String].head() == "a4")
      assert(state.filter(col("id") === 1L).count() == 4)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}__staging")
    }
  }
}
