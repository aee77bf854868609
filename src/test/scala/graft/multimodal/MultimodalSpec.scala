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
    // default seam = REAL path since round 12: mix decodable pngs (real
    // luma-grid features) with junk payloads (stub fallback) and assert
    // the combined stream stays deterministic, unit-norm, and composable
    val blobs = (0L until 12L).map { i =>
      if (i % 2 == 0)
        Multimodal.MediaBlob(i, imageBytes(10 + i.toInt, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB, "png"))
      else
        Multimodal.MediaBlob(i, s"payload-$i-${"x" * i.toInt}".getBytes("UTF-8"))
    }.toDS()
    val emb = Multimodal.extractEmbeddings(blobs, dim = 16).collect().sortBy(_.doc_id)
    assert(emb.length == 12)
    emb.foreach { e =>
      assert(e.embedding.length == 16)
      val norm = math.sqrt(e.embedding.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"unit-normalized: $norm")
    }
    // real-pixel rows took the decode path, junk rows the stub fallback
    assert(emb(0).embedding.toSeq ==
      Multimodal.embedReal(blobs.collect().minBy(_.doc_id).bytes, 16).toSeq)
    assert(emb(1).embedding.toSeq ==
      Multimodal.embedStub(s"payload-1-x".getBytes("UTF-8"), 16).toSeq)
    // distinct payloads -> distinct directions
    assert(emb.map(_.embedding.toSeq).distinct.length == 12)
    // deterministic across runs
    val again = Multimodal.extractEmbeddings(blobs, 16).collect().sortBy(_.doc_id)
    assert(emb.map(_.embedding.toSeq).toSeq == again.map(_.embedding.toSeq).toSeq)
    // composes end-to-end: blob -> embedding -> trained cells -> assignment
    val frame = Multimodal.extractEmbeddings(blobs, 16).toDF()
      .select(col("doc_id").as("vec_id"), col("embedding").as("vec"))
    val cells = graft.streaming.StreamAssign.cellsOf(
      graft.engine.KmeansCodebook.train(frame, k = 3, iters = 1))
    assert(cells.nonEmpty)
    val assigned = graft.streaming.StreamAssign.assign(frame, cells)
    assert(assigned.select("cell").distinct().count() >= 1)
    assert(assigned.filter(col("cell").isNull).count() == 0)
  }

  test("lumaGridFeatures: real pixels, known grid geometry, unit norm") {
    // 4x4 image, one grid cell per pixel (grid=4): features are the
    // unit-normalized per-pixel lumas — verifiable by hand
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(x => (0 until 4).foreach { y =>
      val v = (y * 4 + x) * 15 // r=g=b=v: luma = 3v
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = Multimodal.lumaGridFeatures(out.toByteArray, grid = 4).get
    val lumas = (0 until 16).map(i => 3.0 * i * 15)
    val norm = math.sqrt(lumas.map(v => v * v).sum)
    (0 until 16).foreach { i =>
      assert(math.abs(f(i) - lumas(i) / norm) < 1e-12, s"dim $i: ${f(i)}")
    }
    // a wider image pools columns into cells: 8 wide / grid 4 -> 2 px/cell
    val wide = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(x => (0 until 4).foreach(y => wide.setRGB(x, y, x)))
    val wout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(wide, "png", wout)
    val (w, h, sums, counts) = Multimodal.lumaGridSums(wout.toByteArray, 4).get
    assert((w, h) == ((8, 4)))
    assert(counts.forall(_ == 2), "8x4 at grid 4: every cell holds 2 pixels")
    // cell (gy=0, gx=0) pools x=0,1 (lumas 0+1), cell gx=1 pools x=2,3 ...
    assert(sums.take(4).toSeq == Seq(1L, 5L, 9L, 13L))
  }

  test("embedReal: real-pixel features for images, stub fallback otherwise; feeds IVF") {
    val png = imageBytes(20, 12, java.awt.image.BufferedImage.TYPE_INT_RGB, "png")
    val fromPixels = Multimodal.embedReal(png, dim = 16)
    assert(math.abs(math.sqrt(fromPixels.map(x => x * x).sum) - 1.0) < 1e-9)
    assert(fromPixels.toSeq == Multimodal.lumaGridFeatures(png, 4).get.toSeq,
      "decodable bytes take the real-pixel path, not the hash stub")
    val junk = "not an image".getBytes("UTF-8")
    assert(Multimodal.embedReal(junk, 16).toSeq == Multimodal.embedStub(junk, 16).toSeq,
      "unrecognized bytes fall back to the stub")
    intercept[IllegalArgumentException](Multimodal.embedReal(png, 15))

    // end-to-end: real blobs -> real features -> trained cells -> assignment
    val blobs = (0L until 12L).map { i =>
      Multimodal.MediaBlob(i, imageBytes(16 + i.toInt, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB, "png"))
    }.toDS()
    val emb = Multimodal.extractEmbeddingsReal(blobs, dim = 16).collect().sortBy(_.doc_id)
    assert(emb.length == 12 && emb.forall(_.embedding.length == 16))
    val frame = Multimodal.extractEmbeddingsReal(blobs, 16).toDF()
      .select(col("doc_id").as("vec_id"), col("embedding").as("vec"))
    val cells = graft.streaming.StreamAssign.cellsOf(
      graft.engine.KmeansCodebook.train(frame, k = 3, iters = 1))
    val assigned = graft.streaming.StreamAssign.assign(frame, cells)
    assert(assigned.filter(col("cell").isNull).count() == 0)
  }

  test("lumaAnchorAssign: cell is the argmax dot/|anchor| over the closed-form codebook") {
    val blobs = Multimodal.syntheticPngBlobs(spark, Seq(0L, 7L, 23L).toDF("doc_id"))
    val got = Multimodal.lumaAnchorAssign(blobs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("cell"),
          r.getAs[Long]("top_dot"), r.getAs[Long]("total_luma"))).toMap
    assert(got.keySet == Set(0L, 7L, 23L))
    got.foreach { case (id, (w, h, cell, topDot, total)) =>
      assert((w, h) == ((Multimodal.pngWidth(id), Multimodal.pngHeight(id))))
      // replay the reference computation from the closed-form pixels
      val g = Multimodal.LumaGrid
      val sums = new Array[Long](g * g)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val rgb = Multimodal.pngPixel(id, x, y) & 0xffffff
          val luma = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          sums((y * g / h) * g + x * g / w) += luma
        }
      }
      assert(total == sums.sum)
      val scored = (0 until Multimodal.AnchorK).map { k =>
        val dot = (0 until g * g).map(d => sums(d) * Multimodal.anchor(k, d)).sum
        val nsq = (0 until g * g).map(d => Multimodal.anchor(k, d).toLong *
          Multimodal.anchor(k, d)).sum
        (k, dot, dot.toDouble / math.sqrt(nsq.toDouble))
      }
      val best = scored.maxBy(s => (s._3, -s._1))
      assert(cell == best._1 && topDot == best._2,
        s"doc $id: got ($cell, $topDot), want (${best._1}, ${best._2})")
    }
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
