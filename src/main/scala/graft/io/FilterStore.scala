package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.BinaryType
import graft.expressions.{BloomContains, BloomContainsBroadcast, BloomFilterAgg}

/** Persisted Bloom-filter images — the CROSS-JOB half of the join-pruning
  * story (`bloom_agg`/`bloom_contains`, q79). Spark's own runtime filter
  * lives and dies inside one query; a curation pipeline wants the
  * opposite: build the key filter ONCE per load of the authoritative side
  * (all customer ids, yesterday's seen document digests), persist the
  * sub-MB image, and let every later job — other queries, other sessions,
  * other days — prune its scans with it for the cost of a read.
  *
  * Layout: a one-row parquet under `path` holding the image plus the
  * provenance a reader needs to trust it (key expression description, key
  * count, expected/fpp design point). Writes go through the same
  * stage → `_SUCCESS` → atomic-rename publish as [[Rollup]], so a reader
  * never sees a torn image; re-saving replaces.
  *
  * Reference behavior note: the reference pipeline re-derives every
  * filter inline per run (`Notebooks/Silver Layer.py` re-reads the full
  * dimension each load); persisting the summary is the 100 TB upgrade.
  */
object FilterStore {

  final case class Meta(nKeys: Long, expected: Long, fpp: Option[Double], builtFrom: String)

  /** Build an image over `keys`' single column and persist it. Returns
    * the image (also written) so the building job can keep using it.
    */
  def save(spark: SparkSession, path: String, keys: DataFrame,
      expected: Long, fpp: Option[Double] = None, builtFrom: String = ""): Array[Byte] = {
    val keyCol = keys.columns.head
    // expression-API construction (not SQL-text interpolation): immune to
    // key column names that would need backtick quoting, and fpp rides a
    // typed Literal rather than Double.toString round-tripping
    val agg = org.apache.spark.sql.GraftSqlBridge.column(
      BloomFilterAgg(
        Literal(expected),
        org.apache.spark.sql.GraftSqlBridge.expression(col(keyCol)),
        fpp.map(Literal(_))).toAggregateExpression())
    val row = keys.agg(agg.as("image"), count(col(keyCol)).as("n_keys")).head()
    val image = row.getAs[Array[Byte]]("image")
    val nKeys = row.getAs[Long]("n_keys")
    import spark.implicits._
    // publish_id names this exact publish: filesystem mtime has 1-second
    // granularity on many filesystems, so two saves inside one tick would
    // otherwise share a snapshot identity and a handle-keyed probe after
    // the re-save could serve the STALE broadcast image (round-10 advice).
    val publishId = java.util.UUID.randomUUID().toString
    val frame = Seq(
      (image, nKeys, expected, fpp.map(Double.box).orNull.asInstanceOf[java.lang.Double], builtFrom, publishId))
      .toDF("image", "n_keys", "expected", "fpp", "built_from", "publish_id")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(
      target.getParent, s".${target.getName}.staging")
    val parked = new org.apache.hadoop.fs.Path(
      target.getParent, s".${target.getName}.replaced")
    // shared [[AtomicPublish]] swap: restore any crash survivor first,
    // stage, verify, then park → publish → restore-on-abort — the last
    // good image is never deleted before its replacement is durable
    AtomicPublish.recover(fs, target, parked)
    fs.delete(staging, true)
    frame.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    if (!fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS")))
      throw new java.io.IOException(s"FilterStore: $staging has no _SUCCESS marker")
    AtomicPublish.replace(fs, staging, target, parked, "FilterStore")
    image
  }

  /** Load a persisted image + provenance. One sub-MB row to the driver —
    * the C1-acceptable scalar collect, same as q79's inline build.
    */
  def load(spark: SparkSession, path: String): (Array[Byte], Meta) = {
    val h = loadHandle(spark, path)
    (h.image, h.meta)
  }

  /** A loaded filter snapshot with its storage identity. `snapshotId`
    * (the per-save `publish_id` UUID written inside the parquet) names
    * the exact published image, so the handle-keyed `probeBroadcast` can
    * memo-hit WITHOUT re-hashing the image content on every plan build —
    * repeat probes are O(1). Re-`save` → new publish_id → a fresh
    * `loadHandle` gets a fresh key even when both saves land inside one
    * filesystem-mtime tick; a stale handle keeps naming the snapshot it
    * actually read, which is the correct semantics. Images written before
    * publish_id existed fall back to path + publish mtime.
    */
  final case class LoadedFilter(path: String, snapshotId: String,
      image: Array[Byte], meta: Meta)

  /** [[load]] returning a [[LoadedFilter]] handle for O(1) repeat probes. */
  def loadHandle(spark: SparkSession, path: String): LoadedFilter = {
    val frame = spark.read.parquet(path)
    val row = frame.head
    val fpp = Option(row.getAs[java.lang.Double]("fpp")).map(_.doubleValue())
    val snapshotId =
      if (frame.columns.contains("publish_id")) s"pub:${row.getAs[String]("publish_id")}"
      else { // legacy image without publish_id: best-effort mtime identity
        val target = new org.apache.hadoop.fs.Path(path)
        val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
        s"path:$path@${fs.getFileStatus(target).getModificationTime}"
      }
    LoadedFilter(path, snapshotId, row.getAs[Array[Byte]]("image"),
      Meta(row.getAs[Long]("n_keys"), row.getAs[Long]("expected"), fpp,
        row.getAs[String]("built_from")))
  }

  /** Membership probe over a loaded (or freshly built) image, as a plan
    * CONSTANT: the image rides a foldable binary literal, so
    * [[BloomContains]] deserializes once per task and the per-row cost is
    * a hash probe — never the per-row image copy of a column-valued
    * filter (see BloomContains doc).
    */
  def probe(image: Array[Byte], key: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BloomContains(Literal(image, BinaryType),
        org.apache.spark.sql.GraftSqlBridge.expression(key)))

  /** Image-size threshold above which [[probe]] switches from plan
    * literal to broadcast variable. A literal is simplest and fine at
    * MBs (the task binary broadcasts once per stage anyway); past this
    * size the image starts to dominate driver plan memory and every
    * stage's task-binary re-broadcast, so it belongs in a torrent
    * broadcast referenced by handle ([[BloomContainsBroadcast]]).
    * 16 MB ≈ a 10⁷-key image at 1 % fpp — well before the pain point,
    * well above every testdata filter.
    */
  val BroadcastThresholdBytes: Int = 16 << 20

  /** [[probe]] that picks the plan form by image size: literal below
    * [[BroadcastThresholdBytes]], broadcast variable at and above it —
    * both one-deserialization-per-executor, hash-probe-per-row
    * (BloomFilterSpec pins the dispatch and the broadcast contract).
    */
  def probe(spark: SparkSession, image: Array[Byte], key: Column): Column =
    if (image.length < BroadcastThresholdBytes) probe(image, key)
    else probeBroadcast(spark, image, key)

  /** Broadcasts already shipped by [[probeBroadcast]], keyed by
    * (application id, content MD5, length). A long-lived session
    * rebuilds plans over the same filter image many times; without the
    * memo every rebuild shipped a FRESH broadcast whose blocks outlive
    * the plan (the r8 leak finding). Keyed on full-content MD5 — not a
    * sampled fingerprint, which collides on sparse near-all-zero filter
    * images — plus length; the O(image) hash costs the same order as the
    * broadcast serialization it replaces. Bounded LRU: evicted entries
    * are `unpersist(blocking=false)`-ed, which frees executor blocks but
    * (unlike destroy) leaves the broadcast re-fetchable by any plan
    * still holding it.
    */
  private val MaxCachedBroadcasts = 8
  private val bcastByImage =
    new java.util.LinkedHashMap[(String, String, Int),
        org.apache.spark.broadcast.Broadcast[Array[Byte]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Int),
            org.apache.spark.broadcast.Broadcast[Array[Byte]]]): Boolean = {
        val evict = size() > MaxCachedBroadcasts
        // unpersist of a broadcast whose owning context already stopped
        // throws (SparkContext shut down) rather than no-op-ing; those
        // entries are garbage either way, so swallow and drop.
        if (evict) scala.util.Try(e.getValue.unpersist(false))
        evict
      }
    }

  /** Memo lookup shared by both probeBroadcast forms: purge entries from
    * stopped applications on a miss (their broadcasts are unreachable and
    * must NOT be unpersist-ed through a dead context), then insert.
    */
  private def cachedBroadcast(spark: SparkSession, contentKey: String,
      len: Int, image: => Array[Byte]) = {
    val appId = spark.sparkContext.applicationId
    val id = (appId, contentKey, len)
    bcastByImage.synchronized {
      val hit = bcastByImage.get(id)
      if (hit != null) hit
      else {
        bcastByImage.keySet.removeIf(_._1 != appId)
        val fresh = spark.sparkContext.broadcast(image)
        bcastByImage.put(id, fresh)
        fresh
      }
    }
  }

  /** Broadcast-variable probe form, regardless of size (the ≥ threshold
    * arm of [[probe]]; exposed for tests and for callers that reuse one
    * image across MANY queries — ONE broadcast amortizes across all of
    * them, where each literal plan would re-ship it). Broadcasts are
    * memoized per image content ([[bcastByImage]]), so repeated calls
    * over the same image reuse one broadcast instead of leaking a block
    * per call. This form must hash the full image per call to key the
    * memo; callers that went through [[loadHandle]] should use the
    * handle-keyed overload, whose repeat probes skip the hash entirely.
    */
  def probeBroadcast(spark: SparkSession, image: Array[Byte], key: Column): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(image).map(b => f"$b%02x").mkString
    val b = cachedBroadcast(spark, hex, image.length, image)
    org.apache.spark.sql.GraftSqlBridge.column(
      BloomContainsBroadcast(b,
        org.apache.spark.sql.GraftSqlBridge.expression(key)))
  }

  /** Handle-keyed broadcast probe: the memo key is the filter's storage
    * snapshot identity ([[LoadedFilter.snapshotId]]), so a repeat probe
    * is a map lookup — no O(image) content hash per plan build (the r9
    * FilterStore nit). Safe because a snapshotId names one published
    * image: re-saves change the publish mtime and therefore the key.
    */
  def probeBroadcast(spark: SparkSession, f: LoadedFilter, key: Column): Column = {
    val b = cachedBroadcast(spark, f.snapshotId, f.image.length, f.image)
    org.apache.spark.sql.GraftSqlBridge.column(
      BloomContainsBroadcast(b,
        org.apache.spark.sql.GraftSqlBridge.expression(key)))
  }
}
