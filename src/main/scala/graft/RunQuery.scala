package graft

import org.apache.spark.sql.SparkSession

/** Debug runner: execute one named query with plan + timing.
  * Usage: runMain graft.RunQuery <queryName> [sfDir] [explain|noexplain]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.length <= 2 || args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Sessions.initialParts(sfDir, cpus.toInt))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stage-level profile: duration + task time + GC + spill per stage
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        val m = i.taskMetrics
        stages.add(f"[stage ${i.stageId}%3d] ${i.numTasks}%4d tasks wall=${wall / 1e3}%6.2fs " +
          f"taskTime=${m.executorRunTime / 1e3}%7.2fs gc=${m.jvmGCTime / 1e3}%6.2fs " +
          f"shuffleRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"spill=${m.memoryBytesSpilled / 1e6}%6.1fMB  ${i.name.take(60)}")
      }
    })
    // Time BUILD + the NOOP SINK, like Bench: iterative queries (q61's
    // Lloyd-style loop, BudgetCut's stats pass) execute jobs during
    // DataFrame CONSTRUCTION, so timing only the action would hide most
    // of their cost (it once read q61 as 0.34 s when the bench-true cost
    // was ~1.4 s) — and the action must be the noop sink, not count():
    // count() lets Catalyst eliminate prunable final operators (q96's
    // whole novelty subtree; the map-only scorers' projections — see
    // Bench.benchAction), so a count-timed run can measure a fraction of
    // the real plan. The row count rides along via observe() — one
    // metric at the plan ROOT, so it prunes nothing below it.
    // Same plan selection as Bench: the production variant where one
    // exists (SparkEntry.benchVariants — the sketch queries whose
    // `queries` entry is a verification envelope). `verify:<name>` forces
    // the envelope plan for runs that investigate the Verify surface.
    val (qname, fn) =
      if (name.startsWith("verify:")) {
        val n = name.stripPrefix("verify:"); (n, SparkEntry.queries(n))
      } else (name, SparkEntry.benchVariants.getOrElse(name, SparkEntry.queries(name)))
    if (SparkEntry.benchVariants.contains(qname) && !name.startsWith("verify:"))
      println(s"[runquery] $qname: production variant (verify:$qname for the envelope plan)")
    // explain FIRST: the runner's main use is investigating misbehaving
    // queries, so the plan must print even when execution later throws
    if (doExplain) fn(spark, sfDir).explain("formatted")
    def noopRun(): Long = {
      val obs = new org.apache.spark.sql.Observation()
      fn(spark, sfDir)
        .observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)))
        .write.mode("overwrite").format("noop").save()
      obs.get("count(1)").asInstanceOf[Long]
    }
    var t0 = System.nanoTime()
    val n = noopRun()
    println(f"[runquery] $name count=$n first_run=${(System.nanoTime() - t0) / 1e9}%.2fs (build+noop)")
    // drop run-1 pins before run 2 (same inter-query cleanup as Bench —
    // two generations of sf100 pin blocks do not co-fit in memory)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    t0 = System.nanoTime()
    noopRun()
    println(f"[runquery] $name second_run=${(System.nanoTime() - t0) / 1e9}%.2fs (rebuild+noop)")
    Thread.sleep(500) // let listener drain
    stages.forEach(s => println(s))
    spark.stop()
  }
}
