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

  def pin(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(ReliableDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = s.sparkContext
        if (!sc.getCheckpointDir.exists(_.startsWith(dir))) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
