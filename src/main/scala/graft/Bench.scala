package graft
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Cumulative task-metric counters — registered once, snapshotted around
  * each query so per-query deltas attribute wall time to read vs shuffle
  * vs spill vs compute (the sf100 I/O-regime experiment: a >10× decade
  * step whose inputBytes dominates is disk-read-bound; one whose
  * spill/shuffle deltas dominate is a harness or plan problem). Queries
  * run serially in Bench, so deltas are per-query exact up to stragglers
  * of a cancelled predecessor.
  */
private final class TaskStatsListener extends SparkListener {
  val inputBytes, shuffleReadBytes, shuffleWriteBytes,
    memorySpilled, diskSpilled, cpuTimeNs, runTimeMs, gcTimeMs = new AtomicLong
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      inputBytes.addAndGet(m.inputMetrics.bytesRead)
      shuffleReadBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      memorySpilled.addAndGet(m.memoryBytesSpilled)
      diskSpilled.addAndGet(m.diskBytesSpilled)
      cpuTimeNs.addAndGet(m.executorCpuTime)
      runTimeMs.addAndGet(m.executorRunTime)
      gcTimeMs.addAndGet(m.jvmGCTime)
    }
  }
  /** /proc/self/io — OS truth for the I/O-regime question. local-mode
    * Spark is ONE process, so these are exact per-JVM:
    * `proc_disk_read_bytes` counts ACTUAL block-device reads (page-cache
    * misses — Spark's own inputMetrics under-reports local-fs scans and
    * counts cache hits the same as cold reads), `proc_rchar` the logical
    * read volume, `proc_disk_write_bytes` shuffle/spill/cache-to-disk
    * writes reaching the device.
    */
  private def procIo: Map[String, Long] =
    scala.util.Try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/self/io"))
        .asScala.map(_.split(":\\s*")).collect {
          case Array("rchar", v) => "proc_rchar" -> v.trim.toLong
          case Array("read_bytes", v) => "proc_disk_read_bytes" -> v.trim.toLong
          case Array("write_bytes", v) => "proc_disk_write_bytes" -> v.trim.toLong
        }.toMap
    }.getOrElse(Map.empty[String, Long])

  def snapshot: Map[String, Long] = Map(
    "input_bytes" -> inputBytes.get, "shuffle_read_bytes" -> shuffleReadBytes.get,
    "shuffle_write_bytes" -> shuffleWriteBytes.get,
    "memory_spilled_bytes" -> memorySpilled.get, "disk_spilled_bytes" -> diskSpilled.get,
    "cpu_time_ms" -> cpuTimeNs.get / 1000000L, "run_time_ms" -> runTimeMs.get,
    "gc_time_ms" -> gcTimeMs.get) ++ procIo
}

/** Benchmark main: every `SparkEntry.queries` entry at
  * `SPARK_GRAFT_SF_DIR`, one compact JSON line on stdout (the driver
  * captures only the LAST 2000 chars), full precision + errors in
  * `bench_full.json`.
  *
  * Failure containment — a benchmark must never lose the round's signal
  * to one bad query (round 6 did: one 981 s query × 3 rounds timed out
  * the driver, and the session death made nine later queries "measure"
  * 5 ms of exception-throwing):
  *   - WATCHDOG: each query runs under a per-query timeout
  *     (`SPARK_GRAFT_BENCH_TIMEOUT` s, default 60) on a worker thread
  *     with its own Spark job group; on expiry the group is cancelled
  *     (tasks interrupted) and the query is recorded as an error, not a
  *     timing.
  *   - ERRORS ARE DATA: a failed/timed-out query carries an `"err"`
  *     string in bench_full.json and a count in the stdout line; it is
  *     EXCLUDED from the total and never reported as a timing.
  *   - NO RETRY OF FAILURES: a query that failed or timed out is skipped
  *     in later rounds (round 6 burned 3 × 981 s re-measuring the same
  *     pathology).
  *   - PARTIAL FLUSH: bench_full.json is rewritten after every round, so
  *     an external kill still leaves parseable data for the completed
  *     prefix.
  */
object Bench {

  /** The measured action. Default is the NOOP SINK — full result
    * computation, rows iterated, nothing written — because `count()`
    * MIS-MEASURES any query whose final operators are prunable under a
    * zero-column aggregate (round-15 finding): Catalyst eliminates a
    * final LEFT join with unique build keys when no column of it is
    * referenced (q96's whole novelty subtree — its 4.85 GB digest
    * exchange never ran under count()), and column-prunes final computed
    * projections down to a zero-column parquet rowcount scan (q23/q24/
    * q25/q26/q52 "benched" 0.5 s at sf100 — the language-ID/PII/regex
    * work never executed; Verify always ran the full plans, so
    * correctness was never affected). `SPARK_GRAFT_BENCH_ACTION=count`
    * reproduces the pre-r15 action for cross-round A/B.
    */
  private val action = sys.env.getOrElse("SPARK_GRAFT_BENCH_ACTION", "noop")
  private def benchAction(df: org.apache.spark.sql.DataFrame): Unit = action match {
    case "noop" => df.write.mode("overwrite").format("noop").save()
    case "count" => df.count(): Unit
    case other => sys.error(s"SPARK_GRAFT_BENCH_ACTION must be noop|count, got '$other'")
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' | '\r' => " "
      case c if c < ' ' => ""
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_TIMEOUT", "60").toLong
    // Global wall budget: even the worst case (every query timing out,
    // ~70s apiece) must not outrun the driver's window. A healthy run is
    // ~2 min; queries past the deadline are recorded as skipped, never
    // silently absent.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1200").toLong
    val deadline = System.nanoTime() + budgetSec * 1000000000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // scale-derived: input-proportional initial width, AQE coalesces
      // back down for small shuffles (see graft.Sessions)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Sessions.initialParts(sfDir, cpus.toInt))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Local-mode split sizing: sf0.1's biggest table arrives as ~3
      // default-size splits, capping scan stages at 3-way parallelism on a
      // 32-core session. 16 MB splits restore full-width scans — the
      // local analogue of "size your splits to your cluster" (SCALING.md);
      // a real cluster keeps the 128-256 MB default.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Untimed session warmup (codegen framework, Hadoop FS, parquet reader,
    // broadcast machinery) so the first measured query isn't charged for
    // JVM initialization.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()

    // Subset filter for targeted sweeps — the contract (full names or
    // bare qNN prefixes; unknown tokens fail loudly) is Sessions
    // .subsetFilter, shared verbatim with Verify.
    val names = Sessions.subsetFilter(
      sys.env.get("SPARK_GRAFT_ONLY"), SparkEntry.queries.keys.toSeq.sorted)
    // Bench times the PRODUCTION plan where one exists (the sketch
    // queries whose `queries` entry is an oracle-verification envelope —
    // see SparkEntry.benchVariants); the swapped names ride in the JSON
    // as `"variants"` so the numbers are self-describing.
    val ordered = names.map(k =>
      k -> SparkEntry.benchVariants.getOrElse(k, SparkEntry.queries(k)))
    val variantNames = names.filter(SparkEntry.benchVariants.contains)

    // Opt-in per-query task-metric deltas (SPARK_GRAFT_STATS_JSON=<path>):
    // every attempt — timeouts included — appends one row of cumulative-
    // counter deltas, flushed alongside bench_full.json each round.
    val statsPath = sys.env.get("SPARK_GRAFT_STATS_JSON")
    val statsListener = statsPath.map { _ =>
      val l = new TaskStatsListener
      spark.sparkContext.addSparkListener(l)
      l
    }
    val statsRows = scala.collection.mutable.ArrayBuffer.empty[String]
    def flushStats(): Unit = statsPath.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        statsRows.mkString("[\n", ",\n", "\n]\n"))
    }
    def newPool() = Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "bench-query"); t.setDaemon(true); t
    }
    var pool = newPool()
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // True once a stuck worker survived its cancel and the pool was
    // replaced: that daemon thread may still be burning cores under every
    // LATER timing, so the whole run's numbers are suspect — recorded as
    // data so a consumer can discount the run instead of misreading it.
    var wedged = false

    // A query that failed AFTER producing a valid sample keeps its timing
    // and is skipped in later rounds, but is NOT an error row — a query
    // must never appear as both a timing and an error (the totals would
    // double-speak). `noRetry` carries the skip decision for both cases.
    val noRetry = scala.collection.mutable.Set.empty[String]

    def runOne(name: String,
               fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val group = s"bench-$name"
      val t0 = System.nanoTime()
      // Completion latch, NOT Future.get, detects a wedged worker:
      // fut.cancel(true) flips the future to CANCELLED immediately, so a
      // post-cancel fut.get would throw CancellationException even while
      // the worker thread is still stuck in the callable. The latch only
      // opens when the callable's finally actually runs.
      val done = new java.util.concurrent.CountDownLatch(1)
      val fut = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
          try benchAction(fn(spark, sfDir))
          finally {
            spark.sparkContext.clearJobGroup()
            done.countDown()
          }
        }
      })
      def fail(msg: String): Unit = {
        noRetry += name
        if (!samples.contains(name)) errors(name) = msg
      }
      val statsBefore = statsListener.map(_.snapshot)
      def recordStats(outcome: String): Unit =
        for (l <- statsListener; b <- statsBefore) {
          // Wall stops HERE — only the counter snapshot waits for the
          // listener drain below; charging the drain sleep to wall_sec
          // overstated sub-second queries by ~0.5 s (r13 ADVICE).
          val wall = (System.nanoTime() - t0) / 1e9
          // Listener events drain asynchronously (and the bus has no
          // public waitUntilEmpty) — give it a moment so the finished
          // query's last task events are counted under it, not under the
          // next one. 500 ms against 10–100 s sf100 walls is noise.
          Thread.sleep(500)
          val d = l.snapshot.map { case (k, v) => k -> (v - b.getOrElse(k, 0L)) }
          statsRows += (s"""{"query":${jsonStr(name)},"outcome":${jsonStr(outcome)},""" +
            s""""wall_sec":${math.round(wall * 1000) / 1000.0},""" +
            d.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}")
        }
      try {
        fut.get(timeoutSec, TimeUnit.SECONDS)
        val sec = (System.nanoTime() - t0) / 1e9
        samples(name) = sec :: samples.getOrElse(name, Nil)
        recordStats("ok")
      } catch {
        case _: TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          fut.cancel(true)
          fail(s"timeout>${timeoutSec}s")
          recordStats("timeout")
          // If the cancel doesn't actually free the worker (task pinned in
          // non-interruptible code), the single-thread pool would wedge and
          // every LATER query would time out in line — replace the pool so
          // one stuck query costs one (daemon) thread, not the round.
          if (!done.await(10, TimeUnit.SECONDS)) {
            pool.shutdownNow()
            pool = newPool()
            wedged = true
          }
        case e: java.util.concurrent.ExecutionException =>
          val cause = Option(e.getCause).getOrElse(e)
          fail(s"${cause.getClass.getSimpleName}: ${String.valueOf(cause.getMessage).take(160)}")
          recordStats("error")
      } finally {
        // Deterministic inter-query cleanup: pinned frames
        // (localCheckpoint blocks) otherwise linger until the
        // ContextCleaner's weak-ref pass happens to run after a driver
        // GC — at sf100 the accumulated blocks of EARLIER queries pushed
        // LATER queries' caches to disk and doubled their wall
        // (measured: q70 second-sample 50 s → 233 s under leftover-block
        // pressure). In a `finally` so a TIMED-OUT query — typically the
        // heaviest, leaving the most blocks — also releases its pins
        // (after cancelJobGroup). Non-blocking: the executor frees
        // blocks async while the next query starts.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }

    // Run conditions IN the JSON (round-15 verdict: the r14→r15 action
    // change made raw BENCH files non-comparable and nothing in the files
    // said so) — action, round count, heap, and any production-variant
    // swaps are part of every metric line, so a future reader diffing two
    // BENCH JSONs sees the ruler, not just the numbers.
    def describe(rounds: Int): String = {
      val heapGb = Runtime.getRuntime.maxMemory / (1 << 30)
      val vs = variantNames.map(jsonStr).mkString("[", ",", "]")
      s""""action":${jsonStr(action)},"rounds":$rounds,"heap_gb":$heapGb,"variants":$vs"""
    }

    def flush(rounds: Int): Unit = {
      val mins = ordered.flatMap { case (k, _) => samples.get(k).map(k -> _.min) }
      val total = mins.map(_._2).sum
      val full = mins.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
      val errs = errors.map { case (k, v) => s"\"$k\":${jsonStr(v)}" }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_full.json"),
        s"""{"metric":"total","value":$total,"unit":"sec",${describe(rounds)},"queries":$full,"errors":$errs,"ok":${mins.size},"failed":${errors.size},"wedged":$wedged,"sf":"$sfDir"}""")
    }

    // Three timed runs per query in INTERLEAVED rounds (q1..qN, q1..qN,
    // q1..qN), report the per-query MIN: single samples on a shared
    // machine are dominated by ambient load (observed ±25 % total swing
    // on identical code), and back-to-back samples of one query land
    // under the same load spike — interleaving decorrelates the samples
    // so at least one round of each query usually lands on quiet cores.
    // The min measures the code, not the neighbors.
    // Interleaved-round count: 3 by default (see comment above); big-sf
    // sweeps with a fixed wall window can drop to 2 (or 1) explicitly —
    // recorded in BASELINE.md next to the numbers they produce.
    // Clamped to >= 1 ('0' would silently produce a run with zero samples
    // per query); an unparseable value fails FAST with a clear message
    // instead of a NumberFormatException after session startup.
    val rounds = sys.env.get("SPARK_GRAFT_BENCH_ROUNDS") match {
      case None => 3
      case Some(v) => scala.util.Try(v.trim.toInt).toOption match {
        case Some(n) => math.max(1, n)
        case None => sys.error(
          s"SPARK_GRAFT_BENCH_ROUNDS must be an integer, got '$v'")
      }
    }
    for (_ <- 1 to rounds) {
      ordered.foreach { case (name, fn) =>
        if (!noRetry.contains(name)) {
          if (System.nanoTime() < deadline) runOne(name, fn)
          else if (!samples.contains(name) && !errors.contains(name))
            errors(name) = s"skipped: bench budget ${budgetSec}s exhausted"
        }
      }
      flush(rounds)
      flushStats()
    }

    // Compact stdout line: qNN short keys + millisecond precision
    // (~13 chars/query → ~1.2 KB at 88 queries) fits the driver's
    // 2000-char tail window where the full-name full-precision line did
    // not (BENCH_r01..r05 all parsed:null).
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val mins = ordered.flatMap { case (k, _) => samples.get(k).map(k -> _.min) }
    val qs = mins.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = mins.map(_._2).sum
    // `ok` rides along so a consumer comparing totals across rounds can
    // detect coverage drift (a NEW failure shrinks the total — without
    // the ok count that reads as a speedup).
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",${describe(rounds)},"queries":$qs,"ok":${mins.size},"failed":${errors.size},"wedged":$wedged,"sf":"$sfDir"}"""
    // The driver parses the process's stdout tail; sbt's in-process run
    // wraps System.out with its `[info]`-prefixing logger, which through
    // round 10 echoed a SECOND `[info] {...}` copy of the metric line
    // after the clean one, so the tail's last line was never bare JSON
    // (BENCH_r08..r10 all parsed:null). Emit the line exactly ONCE, on
    // raw FileDescriptor.out — that bypasses any JVM-level System.out
    // redirection, so the last line on the real stream is clean JSON and
    // no logger ever sees it to re-echo.
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(line)
    // Belt-and-braces for the driver's parse: the same single-line metric
    // as a plain file, written with NIO (no logger, no stream wrapper in
    // the path). Defaults to the process CWD (the repo root under both
    // `sbt runMain` and the driver's launch); overridable for tests via
    // the system property or for odd checkouts via the env var.
    val summaryDir = sys.props.get("graft.bench.summaryDir")
      .orElse(sys.env.get("SPARK_GRAFT_REPO_DIR"))
      .getOrElse(".")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(summaryDir, "bench_summary.json"), line + "\n")
    spark.stop()
  }
}
