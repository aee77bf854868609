package graft.engine

import org.apache.spark.sql.DataFrame

/** The repo's single eager-materialization primitive — every "this CTE
  * feeds two sides of a self-join / a sampled exchange must be pinned"
  * site goes through here (Ranking, SemDeDup, SCD2 deltas, Silver clean,
  * connected components, the IVF base frames).
  *
  * Default is `localCheckpoint(eager)`: blocks are on the executors, fast,
  * right for local/bench runs — but NOT fault-tolerant (a lost executor
  * kills the job instead of recomputing). On a real cluster set
  *
  *   spark.graft.checkpoint.reliable=<hdfs-or-object-store-dir>
  *
  * and the same call sites route to reliable `checkpoint()` against that
  * directory: lineage truncation and recomputation both survive executor
  * loss, at the cost of a durable write. The checkpoint dir is installed
  * once per SparkContext (Spark puts each checkpoint in its own UUID
  * subdirectory, so concurrent jobs do not collide).
  */
object Materialize {

  val ReliableDirConf = "spark.graft.checkpoint.reliable"

  /** Chain syntax: `df.transform(...).pinned`. */
  implicit final class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = Materialize.pin(df)
    def pinnedResetStats: DataFrame = Materialize.pinResetStats(df)
  }

  /** (conf dir we installed, the qualified dir Spark REPORTED after the
    * install), per context. getCheckpointDir can't be compared against
    * the conf value directly (Spark fully qualifies it and appends a
    * UUID subdir), so the observed value is recorded at install time:
    * matching it on later pins avoids a re-install (a mkdirs RPC and an
    * orphan UUID dir per call — 50+ per connected-components run), while
    * a MISMATCH means outside code called sc.setCheckpointDir since —
    * re-install then, or every later "reliable" checkpoint would
    * silently land wherever the outsider pointed (e.g. a local dir,
    * forfeiting the executor-loss survival this mode exists for).
    * Weak keys: dead contexts drop out.
    */
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, (String, Option[String])]())

  def pin(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(ReliableDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = s.sparkContext
        val rec = installed.get(sc)
        if (rec == null || rec._1 != dir || rec._2 != sc.getCheckpointDir) {
          sc.setCheckpointDir(dir)
          installed.put(sc, (dir, sc.getCheckpointDir))
        }
        // persist first: checkpoint()'s write job re-computes the full
        // lineage otherwise — every pinned plan would execute twice. If
        // the CALLER already persisted this frame, reuse their cache and
        // leave it alone (persist would warn-noop and unpersist would
        // silently evict an entry the caller still relies on).
        val callerCached =
          df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
        if (!callerCached) df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint(eager = true)
        finally if (!callerCached) df.unpersist()
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** [[pin]] + a STATS FIREWALL — for frames re-pinned inside an
    * iterative loop, not for one-shot pins.
    *
    * checkpoint/localCheckpoint truncate the plan but PRESERVE the origin
    * plan's `Statistics`. A loop whose round joins the previous round's
    * pin with itself (connected components' pointer jump) then compounds
    * the size-only join estimate — the product of the children's
    * `sizeInBytes` — so the BigInt's bit length DOUBLES every round:
    * measured at sf10, round 22's "join" of two 226 k-row in-memory
    * frames spent 70 s in driver-side `BigInteger.multiply` on
    * ~100-megabit stats while the executors were idle (Q61Diag prints
    * the bit length per round).
    *
    * Rebuilding the frame over the checkpointed blocks through the public
    * Row seam drops the inherited stats to `defaultSizeInBytes` — constant
    * bit length, and no planning-quality loss because AQE picks the
    * physical join from RUNTIME shuffle sizes (the loop's joins all sit
    * below exchanges). Cost: one Row encode/decode per downstream read of
    * the pinned frame — fine for small iterated label frames, wrong for
    * bulk one-shot pins (those keep [[pin]]'s zero-copy path and their
    * real stats).
    */
  def pinResetStats(df: DataFrame): DataFrame = {
    val cp = pin(df)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }
}
