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

  /** Encode a BufferedImage of the given type to format bytes via the
    * JDK's own writer — a real PNG/JPEG payload with known dimensions.
    */
  private def imageBytes(w: Int, h: Int, imgType: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    // non-trivial pixels so JPEG has something to compress
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, x * 31 + y * 7)))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"JDK has no $format writer")
    out.toByteArray
  }

  test("decodeReal reads true dimensions from real PNG/JPEG bytes") {
    import java.awt.image.BufferedImage._
    val png = imageBytes(17, 9, TYPE_INT_RGB, "png")
    assert(Multimodal.decodeReal(png) == ((17, 9, 3)))
    val pngAlpha = imageBytes(5, 8, TYPE_INT_ARGB, "png")
    assert(Multimodal.decodeReal(pngAlpha) == ((5, 8, 4)))
    val gray = imageBytes(33, 2, TYPE_BYTE_GRAY, "png")
    assert(Multimodal.decodeReal(gray) == ((33, 2, 1)))
    val jpg = imageBytes(21, 14, TYPE_INT_RGB, "jpg")
    assert(Multimodal.decodeReal(jpg) == ((21, 14, 3)))
  }

  test("decodeReal falls back to the stub on unrecognized bytes") {
    val junk = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.decodeImage(junk).isEmpty)
    assert(Multimodal.decodeReal(junk) == Multimodal.decodeStub(junk))
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    // a PNG magic number with a truncated/corrupt body must not throw
    val truncated = imageBytes(17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB, "png").take(12)
    assert(Multimodal.decodeReal(truncated) == Multimodal.decodeStub(truncated))
  }

  test("extractMetaReal decodes a mixed real/synthetic blob stream") {
    val png = imageBytes(40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB, "png")
    val fake = "synthetic payload".getBytes("UTF-8")
    val blobs = Seq(
      Multimodal.MediaBlob(1L, png),
      Multimodal.MediaBlob(2L, fake)).toDS().repartition(2)
    val out = Multimodal.extractMetaReal(blobs).collect().sortBy(_.doc_id)
    assert((out(0).width, out(0).height, out(0).channels) == ((40, 30, 3)))
    assert(out(0).n_bytes == png.length)
    val (fw, fh, fc) = Multimodal.decodeStub(fake)
    assert((out(1).width, out(1).height, out(1).channels) == ((fw, fh, fc)))
  }

  test("extractEmbeddings: deterministic unit vectors that feed the IVF family") {
    val blobs = (0L until 12L).map(i =>
      Multimodal.MediaBlob(i, s"payload-$i-${"x" * i.toInt}".getBytes("UTF-8"))).toDS()
    val emb = Multimodal.extractEmbeddings(blobs, dim = 8).collect().sortBy(_.doc_id)
    assert(emb.length == 12)
    emb.foreach { e =>
      assert(e.embedding.length == 8)
      val norm = math.sqrt(e.embedding.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"unit-normalized: $norm")
    }
    // distinct payloads -> distinct directions
    assert(emb.map(_.embedding.toSeq).distinct.length == 12)
    // deterministic across runs
    val again = Multimodal.extractEmbeddings(blobs, 8).collect().sortBy(_.doc_id)
    assert(emb.map(_.embedding.toSeq).toSeq == again.map(_.embedding.toSeq).toSeq)
    // composes end-to-end: blob -> embedding -> trained cells -> assignment
    val frame = Multimodal.extractEmbeddings(blobs, 8).toDF()
      .select(col("doc_id").as("vec_id"), col("embedding").as("vec"))
    val cells = graft.streaming.StreamAssign.cellsOf(
      graft.engine.KmeansCodebook.train(frame, k = 3, iters = 1))
    assert(cells.nonEmpty)
    val assigned = graft.streaming.StreamAssign.assign(frame, cells)
    assert(assigned.select("cell").distinct().count() >= 1)
    assert(assigned.filter(col("cell").isNull).count() == 0)
  }

  test("sampleFrames fans one blob out to N fingerprinted windows") {
    val payload = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.sampleFrames(
      Seq(Multimodal.MediaBlob(7L, payload)).toDS(), frameCount = 4).collect().sortBy(_.frame_no)
    assert(frames.length == 4)
    assert(frames.map(_.byte_offset).toSeq == Seq(0, 25, 50, 75))
    assert(frames.map(_.frame_hash).distinct.length == 4) // distinct windows → distinct hashes
    // deterministic across runs
    val again = Multimodal.sampleFrames(
      Seq(Multimodal.MediaBlob(7L, payload)).toDS(), 4).collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_hash).toSeq == again.map(_.frame_hash).toSeq)
  }

  test("resizeDims preserves aspect ratio and never upscales") {
    assert(Multimodal.resizeDims(1024, 768, 512) == (512, 384))
    assert(Multimodal.resizeDims(300, 200, 512) == (300, 200))
    assert(Multimodal.resizeDims(2000, 10, 100) == (100, 1))
  }

  test("documentBlobMeta: byte length = UTF-8 length of text") {
    val df = Seq((1L, "abc"), (2L, "héllo")).toDF("doc_id", "text")
    val out = Multimodal.documentBlobMeta(spark, df)
      .select("doc_id", "n_bytes").as[(Long, Int)].collect().toMap
    assert(out(1L) == 3)
    assert(out(2L) == 6) // é is 2 bytes in UTF-8
  }
}
