package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-session interleaved A/B of q41's two cumulative strategies
  * (engine.ExactQuantiles: one-phase `Window.partitionBy(group)` vs the
  * range-sliced two-phase prefix sum), conf-forced via
  * `spark.graft.quantiles.twoPhaseMinBytes` — the measurement that pins
  * the gate default with at-scale numbers (VERDICT r17 #1 follow-up;
  * interleaving removes the cross-session ambient drift that muddied the
  * r17 bucketed-star headline).
  *
  * Usage: SPARK_GRAFT_CPUS=32 java ... graft.tools.Q41AB <sfDir> [rounds]
  * Prints one line per (strategy, round): wall seconds under the exact
  * bench session + noop action.
  */
object Q41AB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
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
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    val conf = graft.engine.ExactQuantiles.TwoPhaseMinBytesConf
    val strategies = Seq(
      "one-phase" -> Long.MaxValue.toString, // gate never fires
      "two-phase" -> "0")                    // gate always fires
    for (r <- 1 to rounds; (name, gate) <- strategies) {
      spark.conf.set(conf, gate)
      spark.sparkContext.setJobDescription(s"q41 $name r$r")
      val t0 = System.nanoTime()
      graft.queries.Parity.q41Percentiles(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"Q41AB $name round $r wall ${sec}%.2f s")
      spark.sparkContext.setJobDescription(null)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
