package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and per-batch imperative decode runs via
  * `Dataset.mapPartitions` (the JVM twin of PySpark's `mapInPandas`: one
  * iterator per partition, so decoder state — codecs, buffers, models — is
  * initialized once per partition, not per row).
  *
  * The actual image/audio decode is STUBBED (`decodeStub`): no media
  * libraries ship in this container. The stub is a deterministic pure
  * function of the bytes so tests and SQL oracles can reproduce it exactly;
  * swapping in a real codec changes only `decodeStub`'s body — schema,
  * partitioning, and batch shape stay as-is.
  */
object Multimodal {

  /** An opaque media payload: id + raw bytes (+ source tag). */
  case class MediaBlob(doc_id: Long, bytes: Array[Byte])

  /** Typed metadata produced by the decode stage. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, channels: Int)

  /** STUB decode: polynomial rolling hash of the payload
    * (h = (h*31 + byte) mod 1e9+7) seeds fake dimensions. Replace with a
    * real codec (javax.imageio / ffmpeg bindings) when available — the
    * signature `Array[Byte] => (Int, Int, Int)` is the extension point.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    (((h % 1024) + 1).toInt, (((h / 1024) % 768) + 1).toInt, 3)
  }

  /** Decode a partitioned stream of blobs into typed metadata. Pure
    * map-side: no shuffle, scales linearly with input splits.
    */
  def extractMeta(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      // per-partition decoder init would go here (once, not per row)
      iter.map { b =>
        val (w, h, c) = decodeStub(b.bytes)
        MediaMeta(b.doc_id, b.bytes.length, w, h, c)
      }
    }
  }

  /** End-to-end stub pipeline over the documents table: text bytes stand in
    * for media payloads (UTF-8 encode = the "file read").
    */
  def documentBlobMeta(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    val blobs = df
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
      .as[MediaBlob]
    extractMeta(blobs).toDF()
  }
}
