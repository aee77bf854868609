package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub is deterministic and in declared ranges") {
    val b = "some fake png bytes".getBytes("UTF-8")
    val (w1, h1, c1) = Multimodal.decodeStub(b)
    val (w2, h2, c2) = Multimodal.decodeStub(b)
    assert((w1, h1, c1) == (w2, h2, c2))
    assert(w1 >= 1 && w1 <= 1024 && h1 >= 1 && h1 <= 768 && c1 == 3)
  }

  test("extractMeta maps blobs to typed metadata via mapPartitions") {
    val blobs = Seq(
      Multimodal.MediaBlob(1L, Array[Byte](1, 2, 3)),
      Multimodal.MediaBlob(2L, "hello".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractMeta(blobs).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(out(0).n_bytes == 3 && out(1).n_bytes == 5)
    val (w, h, c) = Multimodal.decodeStub("hello".getBytes("UTF-8"))
    assert((out(1).width, out(1).height, out(1).channels) == (w, h, c))
  }

  test("documentBlobMeta: byte length = UTF-8 length of text") {
    val df = Seq((1L, "abc"), (2L, "héllo")).toDF("doc_id", "text")
    val out = Multimodal.documentBlobMeta(spark, df)
      .select("doc_id", "n_bytes").as[(Long, Int)].collect().toMap
    assert(out(1L) == 3)
    assert(out(2L) == 6) // é is 2 bytes in UTF-8
  }
}
