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
  }

  /** Which dir THIS helper installed, per context — getCheckpointDir
    * can't be compared against the conf value (Spark fully qualifies it
    * and appends a UUID subdir), so without our own record every pin
    * would re-install: a mkdirs RPC and an orphan UUID dir per call —
    * 50+ per connected-components run. Weak keys: dead contexts drop out.
    */
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, String]())

  def pin(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(ReliableDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = s.sparkContext
        if (installed.get(sc) != dir) { sc.setCheckpointDir(dir); installed.put(sc, dir) }
        // persist first: checkpoint()'s write job re-computes the full
        // lineage otherwise — every pinned plan would execute twice
        val persisted = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try persisted.checkpoint(eager = true)
        finally persisted.unpersist()
      case None => df.localCheckpoint(eager = true)
    }
  }
}
