package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage decomposition of one query's wall time under the EXACT bench
  * session (same master/shuffle-partitions/split-size/extension config as
  * graft.Bench) — the measurement tool guide §1 asks for when the UI is
  * off: for each stage, its wall span, task count, summed task run/CPU
  * time, shuffle bytes, and the job description it belongs to. Also
  * prints the GAP between the action's start and the first stage
  * submission (pure driver planning/analysis time) and between stages
  * (AQE re-planning + scheduling).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.StageProf <sfDir> <query> [rounds]"
  */
object StageProf {

  private final case class StageRow(
      jobDesc: String, stageId: Int, name: String, tasks: Int,
      submitMs: Long, completeMs: Long, runMs: Long, cpuMs: Long,
      shufReadMb: Double, shufWriteMb: Double, inputMb: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qName = args(1)
    val rounds = if (args.length > 2) args(2).toInt else 2
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

    val qNames = qName.split(",").toSeq
    qNames.foreach(q => require(graft.SparkEntry.queries.contains(q), s"unknown query $q"))

    val stages = new ConcurrentLinkedQueue[StageRow]()
    val jobDescs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        j.stageIds.foreach(sid => jobDescs.put(sid, d))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.add(StageRow(
          jobDescs.getOrDefault(si.stageId, ""), si.stageId,
          si.name.take(70), si.numTasks,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.inputMetrics.bytesRead / 1e6))
      }
    })

    for (r <- 1 to rounds; q <- qNames) {
      val plan = graft.SparkEntry.benchVariants.getOrElse(q, graft.SparkEntry.queries(q))
      stages.clear()
      val t0 = System.currentTimeMillis()
      spark.sparkContext.setJobDescription(s"$q r$r")
      plan(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.sparkContext.setJobDescription(null)
      val wall = (System.currentTimeMillis() - t0) / 1e3
      Thread.sleep(500) // listener drain
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(_.submitMs)
      println(f"%n=== $q round $r wall $wall%.2f s — ${rows.size} stages ===")
      println(f"${"t0off"}%6s ${"span"}%6s ${"gap"}%6s ${"tasks"}%5s ${"runS"}%6s ${"cpuS"}%6s ${"shR"}%6s ${"shW"}%6s ${"inMB"}%6s  name")
      var prevEnd = t0
      rows.foreach { s =>
        val off = (s.submitMs - t0) / 1e3
        val span = (s.completeMs - s.submitMs) / 1e3
        val gap = (s.submitMs - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, s.completeMs)
        println(f"$off%6.2f $span%6.2f $gap%6.2f ${s.tasks}%5d ${s.runMs / 1e3}%6.2f ${s.cpuMs / 1e3}%6.2f ${s.shufReadMb}%6.1f ${s.shufWriteMb}%6.1f ${s.inputMb}%6.1f  ${s.name}")
      }
      val lastEnd = rows.map(_.completeMs).maxOption.getOrElse(t0)
      println(f"tail after last stage: ${(t0 + (wall * 1000).toLong - lastEnd) / 1e3}%.2f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
