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

  /** Exact content dedup: one representative (min of `idCol`) per distinct
    * value of md5(contentCol), plus the duplicate count. Only the digest and
    * id shuffle — the content column is pruned before the exchange.
    */
  def exactByHash(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(md5(col(contentCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
}
