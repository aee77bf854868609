package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit over every SparkEntry query: per query, the counts
  * that matter at scale — shuffles, broadcasts, join strategies, scans,
  * and red flags (cartesian products). Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def count(hay: String, needle: String): Int =
      needle.r.findAllMatchIn(hay).length

    println(f"${"query"}%-22s shuf bcast smj bhj cart scans  notes")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.count() // materialize so AQE settles on the final plan
        val str = df.queryExecution.executedPlan.toString
        val shuf = count(str, "Exchange (hash|range|RoundRobin|SinglePartition)")
        val bcast = count(str, "BroadcastExchange")
        val smj = count(str, "SortMergeJoin")
        val bhj = count(str, "BroadcastHashJoin")
        val shj = count(str, "ShuffledHashJoin")
        val cart = count(str, "CartesianProduct|BroadcastNestedLoop")
        val scans = count(str, "Scan parquet")
        val flags = if (cart > 0) " <-- CARTESIAN/NESTED-LOOP" else ""
        println(f"$name%-22s $shuf%4d $bcast%5d ${smj + shj}%3d $bhj%3d $cart%4d $scans%5d $flags")
      } catch {
        case e: Throwable => println(f"$name%-22s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
