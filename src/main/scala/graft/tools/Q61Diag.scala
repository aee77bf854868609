package graft.queries // not graft.tools: drives the private[queries] CC seam

import graft.queries.Extensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q61's time go at a given scale factor? Runs the q18 pair
  * build and the connected-components loop separately, printing pair/node
  * counts, the round count, and wall per phase — the sf10 bench showed
  * q61 at 45× its sf1 time (139.8 s vs 3.1 s for 10× data, the only
  * super-linear query of the sf10 sweep) and this separates "the pair
  * graph grew 94×" from "the loop got slow".
  *
  * Usage: `runMain graft.queries.Q61Diag <sfDir>` (the FILE lives under
  * tools/ but the object is declared in graft.queries — see the package
  * note above; the tools-qualified name does not resolve).
  */
object Q61Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tmr[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q61diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val pairs = tmr("q18 pairs build+pin") {
      import graft.engine.Materialize.PinOps
      Extensions.q18LshPairs(spark, dir).pinned
    }
    val nPairs = tmr("pair count")(pairs.count())
    val nNodes = tmr("node count") {
      pairs.select(col("a_id").as("id"))
        .unionByName(pairs.select(col("b_id").as("id"))).distinct().count()
    }
    println(s"[q61diag] pairs=$nPairs nodes=$nNodes")
    val (out, rounds) = tmr("connectedComponents total") {
      val r = Extensions.connectedComponentsWithRounds(pairs)
      r._1.count()
      r
    }
    val big = out.agg(max(col("cluster_size"))).head().getLong(0)
    println(s"[q61diag] rounds=$rounds maxCluster=$big")

    // Instrumented copy of the CC loop (same shape as
    // Extensions.connectedComponentsWithRounds) with per-phase wall —
    // where inside a round does the time go?
    {
      import graft.engine.Materialize.PinOps
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .unionByName(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        .pinned
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("rep", col("id")).pinned
      var changed = 1L
      var round = 0
      while (changed > 0 && round < 50) {
        val t0 = System.nanoTime()
        val prop = edges.join(labels, col("src") === col("id"))
          .select(col("dst").as("id"), col("rep"),
            lit(null).cast("bigint").as("prev"))
        val next = labels.withColumn("prev", col("rep")).unionByName(prop)
          .groupBy(col("id")).agg(min(col("rep")).as("rep"), max(col("prev")).as("prev"))
          .pinnedResetStats
        val t1 = System.nanoTime()
        // Q61_JUMPS=2 was measured at sf10: a SECOND jump per round does
        // NOT reduce the 22-round count — convergence is bound by the
        // min-label needing to PROPAGATE through the edges, not by rep
        // chains needing compression. Kept configurable for re-testing.
        def jump(df: org.apache.spark.sql.DataFrame) = df
          .join(df.select(col("id").as("rep"), col("rep").as("rep2")), Seq("rep"), "left")
          .select(col("id"), coalesce(col("rep2"), col("rep")).as("rep"), col("prev"))
        // ≥ 1 enforced: the first jump is structural (the loop below adds
        // jumps 2..n), so Q61_JUMPS=0 would silently still jump once — a
        // no-jump propagate-only baseline needs the jump() call removed,
        // not a knob value.
        val jumps = math.max(1, sys.env.getOrElse("Q61_JUMPS", "1").toInt)
        val preJump = jump(next)
        var jumped = preJump.pinnedResetStats
        for (_ <- 2 to jumps) jumped = jump(jumped).pinnedResetStats
        val t2 = System.nanoTime()
        if ((t2 - t1) / 1e9 > 3.0)
          println(s"[q61diag] slow jump plan round ${round + 1}:\n" +
            preJump.queryExecution.executedPlan.toString.take(4000))
        changed = jumped.filter(col("rep") =!= col("prev")).count()
        val t3 = System.nanoTime()
        labels = jumped.drop("prev")
        round += 1
        // sizeInBytes is a BigInt; joins without column stats estimate the
        // product of their children's sizes, and localCheckpoint PRESERVES
        // origin stats — if the bit length doubles per round, planning cost
        // is the BigInteger arithmetic, not the data.
        val bits = labels.queryExecution.optimizedPlan.stats.sizeInBytes
          .bigInteger.bitLength()
        println(f"[q61diag] round $round%2d: prop+agg ${(t1 - t0) / 1e9}%5.2f  jump ${(t2 - t1) / 1e9}%5.2f  count ${(t3 - t2) / 1e9}%5.2f  changed=$changed statsBits=$bits")
      }
    }
    spark.stop()
  }
}
