package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.KmeansCodebook

/** Persisted trained k-means codebooks — the index-BUILD half of the IVF
  * story ([[graft.engine.KmeansCodebook]], q34/q53/q64/q90). The query
  * surface trains in-plan so every query is self-contained against its
  * oracle, but a production 10⁹-vector pipeline does what FAISS does:
  * TRAIN ONCE over (a sample of) the corpus, persist the codebook, and
  * let every later job — assignment of new arrivals, searches, SemDeDup
  * passes, other sessions, other days — load the same cells for the cost
  * of a K·dim-row read. Same cross-job contract as [[FilterStore]] (build
  * once, reuse everywhere), same staged atomic publish, so a reader never
  * sees a torn codebook and re-training replaces.
  *
  * Layout: one parquet row per cell (cb_id, cb_vec) plus identical
  * provenance columns a reader needs to trust the index (k requested,
  * Lloyd iterations, vectors trained on, dim, free-text built_from) —
  * K·dim doubles total, KB-to-MB at any realistic K.
  */
object CodebookStore {

  final case class Meta(k: Int, iters: Int, nVectors: Long, dim: Int, builtFrom: String)

  /** Train over `emb` (vec_id, vec: array<double>) and persist. Returns
    * the one-row codebook frame (also written) so the building job can
    * keep using it without a re-read.
    */
  def save(spark: SparkSession, path: String, emb: DataFrame, k: Int, iters: Int,
      builtFrom: String = ""): DataFrame = {
    val cb = KmeansCodebook.train(emb, k, iters)
    val nVec = emb.count()
    val rows = cb.select(explode(col("cbs")).as("c"))
      .select(col("c.cb_id").as("cb_id"), col("c.cb_vec").as("cb_vec"),
        lit(k).as("k"), lit(iters).as("iters"), lit(nVec).as("n_vectors"),
        size(col("c.cb_vec")).as("dim"), lit(builtFrom).as("built_from"))
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val staging = new Path(target.getParent, s".${target.getName}.staging")
    val parked = new Path(target.getParent, s".${target.getName}.replaced")
    AtomicPublish.recover(fs, target, parked)
    fs.delete(staging, true)
    rows.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    if (!fs.exists(new Path(staging, "_SUCCESS")))
      throw new java.io.IOException(s"CodebookStore: $staging has no _SUCCESS marker")
    AtomicPublish.replace(fs, staging, target, parked, "CodebookStore")
    cb
  }

  /** Load a persisted codebook back into the one-row broadcastable form
    * [[KmeansCodebook.bestByName]] consumes, plus its provenance. The
    * refold sorts by cb_id, so assignment tie-breaks are identical to the
    * building job's.
    */
  def load(spark: SparkSession, path: String): (DataFrame, Meta) = {
    val rows = spark.read.parquet(path)
    val m = rows.select(col("k"), col("iters"), col("n_vectors"), col("dim"),
      col("built_from")).head()
    val cb = rows
      .agg(sort_array(collect_list(struct(col("cb_id"), col("cb_vec")))).as("cbs"))
    (cb, Meta(m.getInt(0), m.getInt(1), m.getLong(2), m.getInt(3), m.getString(4)))
  }

  /** Assign a (…, `vecCol`: array<double>) frame against a loaded
    * codebook: adds `cell` (int) and `cell_score` (double) — the
    * map-only crossJoin(broadcast(one-row)) + argmax fold shape of q34,
    * against PERSISTED cells instead of in-plan training.
    */
  def assign(df: DataFrame, cb: DataFrame, vecCol: String = "vec"): DataFrame =
    df.crossJoin(broadcast(cb))
      .withColumn("__b", KmeansCodebook.bestByName(df.sparkSession, vecCol, "cbs"))
      .withColumn("cell", col("__b.id"))
      .withColumn("cell_score", col("__b.d"))
      .drop("__b", "cbs")
}
