package graft.tools

import java.nio.file.Files
import java.time.LocalDate

import graft.engine.Scd2
import graft.io.{Scd2History, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale measurement for the unified bucketed-incremental SCD2 sink
  * (verdict r10 item 8): Scd2BucketedIncrementalSpec proves the
  * one-exchange merge plan at toy scale; this tool measures the same chain
  * over an sf1-sized current table (default 1.5 M keys ≈ the sf1 customer
  * domain) and prints per-merge wall-clock plus the merge plan's exchange
  * count, for the SCALING.md entry.
  *
  * Synthetic shape mirrors the silver entities (Silver Layer.py:86-118):
  * a string business key, a comparison payload, and a daily batch touching
  * ~10 % of keys (changed payload) plus ~1 % brand-new keys — the
  * change-rate regime an incremental hospital feed actually has.
  *
  * Usage: `runMain graft.tools.Scd2Scale [nKeys=1500000] [buckets=32]`.
  */
object Scd2Scale {

  private def fmt(ns: Long): Double = math.rint(ns / 1e7) / 100.0

  /** Deterministic current-table synthesis: every column derives from the
    * row id alone, so batches are reproducible across runs.
    */
  private def rows(spark: SparkSession, from: Long, until: Long, gen: Int): DataFrame =
    spark.range(from, until)
      .select(
        concat(lit("key-"), format_string("%012d", col("id"))).as("k"),
        // payload changes with gen for ids selected into a batch
        md5(concat(col("id").cast("string"), lit(":"), lit(gen))).as("payload"),
        (col("id") % 97).cast("int").as("grp"),
        (col("id") % 1000 + gen).cast("int").as("v"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1500000L)
    val buckets = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = Files.createTempDirectory("graft_scd2_scale").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scd2-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", s"$wh/warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"$wh/history"
    val table = "scd2_scale_current"
    val keys = Seq("k")
    val compareCols = Seq("payload", "grp", "v")
    val days = Seq(LocalDate.parse("2026-01-01"), LocalDate.parse("2026-01-02"),
      LocalDate.parse("2026-01-03"), LocalDate.parse("2026-01-04"))

    val t0 = System.nanoTime()
    Scd2History.bootstrapBucketed(rows(spark, 0, n, 0), days.head, path, table, keys, buckets)
    val bootstrapS = fmt(System.nanoTime() - t0)

    // Day i batch: ids ≡ i (mod 10) re-emitted with a new payload (10 % of
    // keys change) plus n/100 brand-new keys appended past the domain.
    def batch(i: Int): DataFrame = {
      val changed = rows(spark, 0, n, i).filter(col("v") % 10 === i)
      val fresh = rows(spark, n + (i - 1) * n / 100, n + i.toLong * n / 100, i)
      changed.unionByName(fresh)
    }

    val mergeS = (1 to 3).map { i =>
      val t = System.nanoTime()
      Scd2History.mergeBucketed(spark, path, table, batch(i), keys, compareCols, days(i), buckets)
      fmt(System.nanoTime() - t)
    }

    // Structural gate at THIS scale: the merge join plans with exactly one
    // exchange — the batch moving to the bucket layout. Broadcast disabled
    // so a small batch can't hide a missing bucketed distribution.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try Scd2.merge(Scd2History.readCurrentBucketed(spark, table), batch(3),
          keys, compareCols, days(3)).queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val exchanges = "(?m)^[^\\n]*\\bExchange\\b".r.findAllIn(plan).size

    val current = spark.table(table).count()
    val all = Scd2History.readAllBucketed(spark, path, table).count()
    // Raw-fd single-line metric, same contract as Bench.
    val json = s"""{"metric":"scd2_bucketed_scale","n_keys":$n,"buckets":$buckets,""" +
      s""""bootstrap_s":$bootstrapS,"merge_s":[${mergeS.mkString(",")}],""" +
      s""""exchanges":$exchanges,"current_rows":$current,"history_rows":$all}"""
    new java.io.FileOutputStream(java.io.FileDescriptor.out)
      .write((json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
