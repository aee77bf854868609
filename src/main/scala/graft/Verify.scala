package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    new java.io.File(outDir).mkdirs()
    // Local-iteration subset; the driver leaves it unset → full run. Same
    // contract as Bench (Sessions.subsetFilter: full names or bare qNN
    // prefixes, unknown tokens fail loudly).
    val subset = Sessions.subsetFilter(
      sys.env.get("SPARK_GRAFT_ONLY"), SparkEntry.queries.keys.toSeq.sorted)
      .toSet
    // Output file count: 1 (default — the driver's sf0.01 scale, single
    // tidy file per query). At big local scale factors coalesce(1)
    // single-tasks the FINAL STAGE — for map-only queries that is the
    // whole query — so sf1/sf10 runs set SPARK_GRAFT_OUT_PARTS=0 to keep
    // the natural partitioning (check.py and the driver both glob
    // <name>/*.parquet).
    val outParts = sys.env.get("SPARK_GRAFT_OUT_PARTS").map(_.toInt).getOrElse(1)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => subset.contains(name) }
      .foreach { case (name, fn) =>

      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        (if (outParts <= 0) df else df.coalesce(outParts))
          .write.mode("overwrite").parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Free pinned (localCheckpoint) blocks between queries — same
      // leftover-block pressure story as Bench.runOne (measured at
      // sf100); ContextCleaner alone waits for a driver GC.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
