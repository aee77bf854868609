package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the train-once contract of [[Extensions.trainedCb]]: the first
  * call over a given embeddings table trains and caches; later calls
  * reuse the cached cells WITHOUT touching the input frame (the by-name
  * `emb` parameter is never evaluated on a hit — asserted with a
  * poisoned thunk); rewriting the table invalidates the key (the
  * fingerprint covers file names/lengths/mtimes) and retrains.
  */
class CodebookMemoSpec extends SparkSpec {
  import spark.implicits._

  private def writeEmb(dir: String, salt: Int): Unit =
    spark.range(40)
      .select(col("id").as("vec_id"),
        array((0 until 4).map(d =>
          ((col("id") * (7 + salt) + d) % 11 - 5).cast("float")): _*).as("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  private def emb(dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))

  private def cells(cb: DataFrame): Seq[String] =
    cb.select(explode(col("cbs")).as("c"))
      .select(col("c.cb_id"), to_json(col("c.cb_vec")))
      .collect().map(_.toString).toSeq.sorted

  test("second call is a cache hit: input never re-evaluated; rewrite retrains") {
    val dir = Files.createTempDirectory("cbmemo").toString
    writeEmb(dir, salt = 0)
    val before = Extensions.cbCache.size()
    val cb1 = cells(Extensions.trainedCb(spark, dir, emb(dir)))
    assert(Extensions.cbCache.size() == before + 1, "first call must cache one entry")
    // poisoned thunk: evaluating `emb` on a hit would throw
    val cb2 = cells(Extensions.trainedCb(spark, dir,
      sys.error("cache hit must not evaluate the input frame")))
    assert(cb2 == cb1, "cached codebook must be identical to the trained one")
    assert(Extensions.cbCache.size() == before + 1, "hit must not add a key")
    // rewrite with different content -> new fingerprint -> retrain
    writeEmb(dir, salt = 3)
    val cb3 = cells(Extensions.trainedCb(spark, dir, emb(dir)))
    assert(Extensions.cbCache.size() == before + 2, "rewrite must miss the cache")
    assert(cb3 != cb1, "different content must train a different codebook")
  }
}
