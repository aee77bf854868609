package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.Sessions
import graft.io.Tables
import graft.queries.Parity

/** Measured demonstration of the bucketed star join on the flagship q11
  * (round-16 verdict #3): `Tables.saveBucketed` pre-shuffles lineitem +
  * orders on orderkey (and customer on custkey), then the SAME q11 code
  * (`Parity.q11StarJoinFrom`) runs over raw parquet vs the bucketed
  * tables. Reports, as one JSON line: the one-time bucketing write cost,
  * per-shape exchange/sort counts from the executed plan, and min-of-N
  * noop-action walls — the "pay the shuffle once" trade quantified, not
  * just asserted (BucketedJoinSpec proves the plan shape at test scale;
  * this prices it at sweep scale).
  *
  * Usage: BucketedStar <sfDir> <warehouseDir> [rounds=2]
  * The warehouse holds one bucketed copy of lineitem/orders/customer
  * (~input size on disk) — point it at a scratch dir and delete after.
  */
object BucketedStar {

  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The EXECUTED plan's string, captured through a
    * QueryExecutionListener: the noop save runs a cloned QueryExecution,
    * so `df.queryExecution.executedPlan` would stay isFinalPlan=false
    * under AQE and miss runtime re-plans (SMJ→BHJ, coalesced reads).
    * The listener bus is async — poll briefly after the action returns.
    */
  private val captured =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  private def registerCapture(spark: SparkSession): Unit =
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        captured.set(qe.executedPlan.toString)
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    })

  private def awaitCapturedPlan(fallback: DataFrame): String = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var p = captured.get()
    while (p == null && System.nanoTime() < deadline) {
      Thread.sleep(50); p = captured.get()
    }
    if (p == null) fallback.queryExecution.executedPlan.toString else p
  }

  private def planCounts(planStr: String): (Int, Int) = {
    // A finalized AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
    // "== Initial Plan ==" sections — count only the final one.
    val plan = {
      val i = planStr.indexOf("== Final Plan ==")
      if (i < 0) planStr
      else {
        val j = planStr.indexOf("== Initial Plan ==", i)
        if (j < 0) planStr.substring(i) else planStr.substring(i, j)
      }
    }
    ("(?i)exchange".r.findAllIn(plan).size,
      // "Sort [keys...]" operator lines; never matches SortMergeJoin or
      // SortAggregate (neither is followed by " [")
      "Sort \\[".r.findAllIn(plan).size)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wh = args(1)
    val rounds = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", cpus).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Sessions.initialParts(sfDir, cpus.toInt))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.warehouse.dir", wh)
      // trust bucket sort metadata (saveBucketed guarantees one sorted
      // file per bucket) — elides the SMJ sorts beside the exchanges
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def raw(name: String): DataFrame = Tables.load(spark, sfDir, name)
    def plain(): DataFrame = Parity.q11StarJoin(spark, sfDir)
    def bucketed(): DataFrame = Parity.q11StarJoinFrom(
      spark.table("bs_lineitem"), spark.table("bs_orders"),
      spark.table("bs_customer"), raw("nation"), raw("region"))

    // one-time cost: the shuffle q11 would otherwise pay per run
    val (_, tWrite) = timed {
      Tables.saveBucketed(raw("lineitem"), "bs_lineitem", Seq("l_orderkey"), buckets)
      Tables.saveBucketed(raw("orders"), "bs_orders", Seq("o_orderkey"), buckets)
      Tables.saveBucketed(raw("customer"), "bs_customer", Seq("c_custkey"), buckets)
    }

    // GENUINELY interleave shapes round-by-round so page-cache/JIT drift
    // hits both equally (the first cut ran all plain rounds then all
    // bucketed rounds — the second shape absorbed the box's drift alone)
    registerCapture(spark)
    val shapes = Seq("plain" -> (plain _), "bucketed" -> (bucketed _))
    val walls = scala.collection.mutable.LinkedHashMap(
      shapes.map { case (l, _) => l -> Vector.empty[Double] }: _*)
    val lastPlan = scala.collection.mutable.LinkedHashMap[String, String]()
    for (_ <- 1 to rounds; (label, mk) <- shapes) {
      val df = mk()
      captured.set(null)
      walls(label) :+= timed(noop(df))._2
      lastPlan(label) = awaitCapturedPlan(df) // AQE-final executed plan
    }
    val fields = shapes.map { case (label, _) =>
      val (ex, so) = planCounts(lastPlan(label))
      val ws = walls(label)
      s""""$label":{"walls_sec":[${ws.map(w => f"$w%.2f").mkString(",")}],""" +
        s""""min_sec":${f"${ws.min}%.2f"},"exchanges":$ex,"sorts":$so}"""
    }
    println(s"""{"metric":"q11_bucketed_star","sf_dir":"$sfDir","buckets":$buckets,""" +
      s""""rounds":$rounds,"bucket_write_sec":${f"$tWrite%.1f"},${fields.mkString(",")}}""")

    Seq("bs_lineitem", "bs_orders", "bs_customer")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
