package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` of named queries to files — the judge's
  * plan evidence (`plans/rNN/<query>_{before,after}.txt`). Runs under the
  * EXACT bench session config (same master/shuffle-partitions/split-size/
  * extensions as graft.Bench) so the captured plan is the benched plan,
  * and times the bench variant where one exists (the plan Bench times).
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,..>"
  *
  * `SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"` sets extra session confs before
  * building the plans — used to force an alternate code path for a
  * `_before` capture (e.g. `spark.graft.quantiles.twoPhaseMinBytes=0`).
  * Output file: `<outDir>/<query>_<suffix>.txt`.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.Sessions.initialParts(sfDir, cpus.toInt))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(";").filter(_.nonEmpty).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      }
    }
    Files.createDirectories(Paths.get(outDir))
    qlist.split(",").foreach { q =>
      val fn = graft.SparkEntry.benchVariants
        .getOrElse(q, graft.SparkEntry.queries(q))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"${q}_$suffix.txt"), txt)
      println(s"wrote $outDir/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
