package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference dedups every silver entity with `dropDuplicates(subset)`
  * (Silver Layer.py:175,309-311,422-424,523-525,614-616) — which keeps an
  * *arbitrary* row per key. That is fine for its exact-duplicate rows but is
  * non-deterministic in general, so this module also provides the
  * deterministic variants a 100 TB pipeline actually wants:
  *
  *  - `exact`       — dropDuplicates on a key subset (reference parity);
  *                    compiles to a hash Aggregate with map-side partials,
  *                    one shuffle on the key.
  *  - `latestBy`    — keep the row with max(order) per key via row_number;
  *                    one shuffle; deterministic given a total tiebreak.
  *  - `exactByHash` — content-hash dedup for documents: group rows by
  *                    md5(content) so only 16-byte digests shuffle, not the
  *                    documents themselves.
  */
object Dedup {

  /** Reference-parity subset dedup (SL:175 etc.). */
  def exact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic latest-row-per-key: the row with the greatest `order`
    * columns wins. `order` must be a total order (add a unique id as the
    * last sort key). Single shuffle on `keys`; at scale prefer this over
    * dropDuplicates when rows carry a version/timestamp.
    */
  def latestBy(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Aggregation-based latest-row-per-key: max_by over a lexicographic
    * order struct. Same result as [[latestBy]] given a total order, but
    * runs as a hash aggregate with map-side partials — no per-key SORT, so
    * at scale it shuffles one candidate row per (key, partition) instead
    * of every row. Prefer this when only the winning row is needed;
    * latestBy when row_number/rank context matters.
    */
  def latestByAgg(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    val ordStruct = struct(order: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col).toIndexedSeq: _*), ordStruct).as("__row"))
      .select(df.columns.map(c =>
        if (keys.contains(c)) col(c) else col(s"__row.$c").as(c)).toIndexedSeq: _*)
  }

  /** Key-unique dedup with no natural ordering column: keep, per key, the
    * row that is lexicographically greatest over all payload columns.
    * Arbitrary but DETERMINISTIC (ties can only be bitwise-identical rows),
    * so re-runs and retries produce the same survivor — the precondition
    * [[Scd2.merge]] needs from its source. One hash-aggregate shuffle.
    */
  def keyUnique(df: DataFrame, keys: Seq[String]): DataFrame =
    latestByAgg(df, keys, df.columns.filterNot(keys.contains).map(col).toSeq)

  /** Exact content dedup: one representative (min of `idCol`) per distinct
    * value of md5(contentCol), plus the duplicate count. Only the digest and
    * id shuffle — the content column is pruned before the exchange.
    */
  def exactByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(md5(col(contentCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
}
