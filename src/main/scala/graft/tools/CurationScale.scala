package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.io.Tables
import graft.pipeline.Curation

/** End-to-end curation funnel at sweep scale with the containment stage
  * ON (round-16 verdict #7): CurationPipelineSpec proves the survivor-
  * frame sharing (r15 #5) at test scale; this prices the full funnel —
  * quality → exact dedup → near-dup → containment → decontamination —
  * over a real documents table and records the per-stage survivor counts
  * plus the wall as one JSON line. The funnel aggregate is the single
  * action: corpus survivors == its `decontaminated` column, so the plan
  * (with its two pinned shared frames) executes exactly once.
  *
  * Usage: CurationScale <sfDir> [minQuality=0.5] [containThr=0.9]
  * The held-out set stands in as every 1000th doc_id (the q99
  * ContamBenchMod convention) — production passes the real benchmark.
  */
object CurationScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val minQ = if (args.length > 1) args(1).toDouble else 0.5
    val thr = if (args.length > 2) args(2).toDouble else 0.9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Sessions.initialParts(sfDir, cpus.toInt))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val held = docs.filter(col("doc_id") % 1000 === 0)

    val t0 = System.nanoTime()
    val funnel = Curation
      .curate(docs, heldOut = Some(held), minQuality = minQ, containment = Some(thr))
      .funnel.collect()(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val cols = Seq("raw", "quality", "dedup", "neardup", "contained", "decontaminated")
    val counts = cols.map(c => s""""$c":${funnel.getAs[Long](c)}""").mkString(",")
    println(s"""{"metric":"curation_funnel","sf_dir":"$sfDir","min_quality":$minQ,""" +
      s""""containment_thr":$thr,"wall_sec":${f"$wall%.1f"},$counts}""")
    spark.stop()
  }
}
