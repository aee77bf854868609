package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata, and per-batch imperative decode runs via
  * `Dataset.mapPartitions` (the JVM twin of PySpark's `mapInPandas`: one
  * iterator per partition, so decoder state — codecs, buffers, models — is
  * initialized once per partition, not per row).
  *
  * Image decode is REAL where the stock JDK can do it: [[decodeReal]]
  * reads width/height/channels from PNG/JPEG/GIF/BMP headers via
  * `javax.imageio` (header-only — no pixel decode), falling back to the
  * deterministic [[decodeStub]] for unrecognized bytes. The oracle-checked
  * queries (q27/q54) pin the stub so DuckDB can reproduce the values
  * exactly; audio/video feature extraction stays stubbed (no codec in the
  * JDK) behind the same `Array[Byte] => …` extension-point signatures.
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

  /** REAL image decode via `javax.imageio` (ships in the stock JDK — no
    * new dependency): header-only read of width/height/bands for any
    * registered format (PNG, JPEG, GIF, BMP…). `reader.getWidth/getHeight`
    * parse only the header chunk/SOF marker — no pixel decode — so cost
    * per blob is O(header), not O(pixels): the right shape for a metadata
    * pass over 100 TB of media. Returns None when no installed codec
    * recognizes the bytes (caller falls back to [[decodeStub]]).
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    import javax.imageio.ImageIO
    // In-memory stream only — never let ImageIO spill its read cache to
    // executor-local temp files for a header probe.
    val in = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in, true, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val types = r.getImageTypes(0)
          val c = if (types.hasNext) types.next().getNumBands else 3
          if (w > 0 && h > 0) Some((w, h, c)) else None
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally in.close()
  }

  /** Real-codec decode with the stub as the no-codec fallback: bytes a
    * JDK `ImageReader` recognizes get their true (width, height,
    * channels); anything else (synthetic payloads, formats with no
    * installed codec) falls back to [[decodeStub]]'s deterministic fake.
    */
  def decodeReal(bytes: Array[Byte]): (Int, Int, Int) =
    decodeImage(bytes).getOrElse(decodeStub(bytes))

  /** Decode a partitioned stream of blobs into typed metadata. Pure
    * map-side: no shuffle, scales linearly with input splits.
    * `decode` defaults to the deterministic stub — the oracle-checked
    * queries (q27/q54) pin it so DuckDB can reproduce the values; pass
    * [[decodeReal]] for the JDK-codec path ([[extractMetaReal]]).
    */
  def extractMeta(
      blobs: Dataset[MediaBlob],
      decode: Array[Byte] => (Int, Int, Int) = decodeStub): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      // per-partition decoder init would go here (once, not per row)
      iter.map { b =>
        val (w, h, c) = decode(b.bytes)
        MediaMeta(b.doc_id, b.bytes.length, w, h, c)
      }
    }
  }

  /** [[extractMeta]] over the real JDK codec path: true dimensions for
    * recognized image bytes, stub fallback otherwise.
    */
  def extractMetaReal(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] =
    extractMeta(blobs, decodeReal)

  /** A media embedding: parent id + unit-normalized vector — the
    * feature-extract stage's output, shaped to drop straight into the
    * embedding operators (cosine KNN, IVF assign, SemDeDup,
    * [[graft.streaming.StreamAssign]]).
    */
  case class MediaEmbedding(doc_id: Long, embedding: Array[Double])

  /** STUB feature extractor: `dim` independent rolling hashes of the
    * payload, shifted to [-0.5, 0.5) and unit-normalized —
    * deterministic, full-variance, cosine-ready fake features. Each
    * dimension uses its own seed AND multiplier: a shared multiplier
    * would make the dims affine shifts of one rolling hash (difference
    * vectors near-constant across payloads — degenerate cosine
    * geometry). Replace with a real encoder (ONNX runtime, JNI
    * bindings) when available; the signature
    * `(Array[Byte], Int) => Array[Double]` is the extension point and
    * everything downstream — schema, mapPartitions batch shape,
    * normalization contract — stays as-is.
    */
  def embedStub(bytes: Array[Byte], dim: Int): Array[Double] = {
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      var h = (d * 1315423911L) & 0x7fffffffL // per-dimension seed
      val mult = 31L + 2L * d                 // per-dimension multiplier (odd)
      var i = 0
      while (i < bytes.length) {
        h = (h * mult + (bytes(i) & 0xff)) % 1000000007L
        i += 1
      }
      v(d) = h.toDouble / 1000000007.0 - 0.5
      d += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += v(j) * v(j); j += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    var k = 0
    while (k < dim) { v(k) *= inv; k += 1 }
    v
  }

  /** Feature-extract a partitioned stream of blobs — the DEFAULT media
    * embedding seam, and since round 12 it routes to the REAL pixel
    * path: decodable images get luma-grid features from their actual
    * decoded pixels ([[extractEmbeddingsReal]]), and only bytes no
    * installed codec recognizes fall back to the deterministic hash
    * stub ([[embedStub]]). `dim` must be a square (the spatial grid is
    * √dim × √dim), transitively via [[embedReal]].
    */
  def extractEmbeddings(blobs: Dataset[MediaBlob], dim: Int): Dataset[MediaEmbedding] =
    extractEmbeddingsReal(blobs, dim)

  /** REAL feature core (q94): decode the full image via `javax.imageio`
    * and accumulate per-cell luma sums over a fixed `grid`×`grid`
    * spatial grid — the classical downsampled-luma descriptor. Returns
    * (width, height, cellLumaSums, cellPixelCounts) with
    * luma = r + g + b per pixel and cell (gy, gx) = (y·grid/h, x·grid/w)
    * — ALL integer arithmetic, so an oracle can replay it exactly when
    * the pixel values are closed-form. None when no installed codec
    * recognizes the bytes.
    */
  def lumaGridSums(bytes: Array[Byte], grid: Int): Option[(Int, Int, Array[Long], Array[Long])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](grid * grid)
        val counts = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          val gy = y * grid / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y) & 0xffffff
            val luma = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            val gd = gy * grid + x * grid / w
            sums(gd) += luma
            counts(gd) += 1
            x += 1
          }
          y += 1
        }
        Some((w, h, sums, counts))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL classical features from real pixels: per-cell mean luma over
    * the fixed grid, unit-normalized — cosine-ready, deterministic, and
    * computed from the ACTUAL decoded image (the round-10 verdict's
    * embedStub replacement). None when the bytes aren't a decodable
    * image.
    */
  def lumaGridFeatures(bytes: Array[Byte], grid: Int): Option[Array[Double]] =
    lumaGridSums(bytes, grid).map { case (_, _, sums, counts) =>
      val v = new Array[Double](grid * grid)
      var i = 0
      while (i < v.length) {
        v(i) = if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i)
        i += 1
      }
      var n = 0.0
      var j = 0
      while (j < v.length) { n += v(j) * v(j); j += 1 }
      val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
      var k = 0
      while (k < v.length) { v(k) *= inv; k += 1 }
      v
    }

  /** Real-pixel features with the hash stub as the no-codec fallback —
    * the production default for media columns. `dim` must be a square
    * (the grid is √dim × √dim).
    */
  def embedReal(bytes: Array[Byte], dim: Int): Array[Double] = {
    val g = math.sqrt(dim.toDouble).toInt
    require(g * g == dim, s"embedReal needs a square dim (grid^2), got $dim")
    lumaGridFeatures(bytes, g).getOrElse(embedStub(bytes, dim))
  }

  /** [[extractEmbeddings]] over real decoded pixels: luma-grid features
    * for decodable images, stub fallback otherwise. Same map-only
    * mapPartitions shape; output feeds the embedding family (cosine
    * KNN, IVF assign, SemDeDup) unchanged.
    */
  def extractEmbeddingsReal(blobs: Dataset[MediaBlob], dim: Int): Dataset[MediaEmbedding] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)
      iter.map(b => MediaEmbedding(b.doc_id, embedReal(b.bytes, dim)))
    }
  }

  /** One sampled "frame": parent id, frame index, byte offset, and a
    * rolling-hash fingerprint of the frame's byte window.
    */
  case class FrameSample(doc_id: Long, frame_no: Int, byte_offset: Int, frame_hash: Long)

  /** STUB frame sampler: treats the payload as `frameCount` fixed-stride
    * windows and fingerprints each (a real implementation would seek to
    * container keyframes — only this function's body changes). One input
    * row fans out to `frameCount` rows via flatMap-style mapPartitions:
    * the batch shape a GPU/codec stage needs (iterator in, iterator out,
    * per-partition init).
    */
  def sampleFrames(blobs: Dataset[MediaBlob], frameCount: Int): Dataset[FrameSample] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { iter =>
      iter.flatMap { b =>
        val stride = math.max(1, b.bytes.length / frameCount)
        (0 until math.min(frameCount, b.bytes.length)).iterator.map { f =>
          val off = f * stride
          val end = math.min(b.bytes.length, off + stride)
          var h = 0L
          var i = off
          while (i < end) { h = (h * 31 + (b.bytes(i) & 0xff)) % 1000000007L; i += 1 }
          FrameSample(b.doc_id, f, off, h)
        }
      }
    }
  }

  /** STUB resize: recompute target dimensions preserving aspect ratio
    * against a max edge — pure metadata math (the pixel work would slot
    * into the same mapPartitions stage as decodeStub).
    */
  def resizeDims(width: Int, height: Int, maxEdge: Int): (Int, Int) = {
    val scale = maxEdge.toDouble / math.max(width, height)
    if (scale >= 1.0) (width, height)
    else (math.max(1, (width * scale).toInt), math.max(1, (height * scale).toInt))
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

  /** REAL-codec pipeline (q93): render a deterministic RGB PNG per doc —
    * dimensions a closed-form function of the id, so the DuckDB oracle
    * recomputes them without any codec — then run [[extractMetaReal]]
    * over the encoded bytes. Encode and decode both happen inside the
    * executors' mapPartitions stages (the bytes never visit the driver),
    * so the harness exercises the true `javax.imageio` path under the
    * same distributed shape as a 100 TB media scan.
    */
  def pngWidth(id: Long): Int = (16 + id % 32).toInt
  def pngHeight(id: Long): Int = (16 + (id * 7) % 32).toInt

  /** Deterministic closed-form pixel: the RGB of (x, y) in doc `id`'s
    * synthetic image — shared by the renderer and (arithmetically) by
    * the q93/q94 oracles.
    */
  def pngPixel(id: Long, x: Int, y: Int): Int =
    ((id * 2654435761L + x * 131 + y * 31) & 0xffffff).toInt

  /** Render the deterministic RGB PNG per doc_id, inside the executors
    * (mapPartitions — the bytes never visit the driver). PNG is
    * lossless, so decoding these blobs recovers [[pngPixel]] exactly:
    * the oracle for any pixel-derived value is closed-form arithmetic.
    */
  def syntheticPngBlobs(s: SparkSession, df: DataFrame): Dataset[MediaBlob] = {
    import s.implicits._
    df.select(col("doc_id")).as[Long].mapPartitions { ids =>
      // keep ImageIO's scratch space in memory: a header-sized encode
      // must not page through executor-local temp files
      javax.imageio.ImageIO.setUseCache(false)
      ids.map { id =>
        val (w, h) = (pngWidth(id), pngHeight(id))
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, pngPixel(id, x, y))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaBlob(id, bos.toByteArray)
      }
    }
  }

  def syntheticPngMeta(s: SparkSession, df: DataFrame): DataFrame =
    extractMetaReal(syntheticPngBlobs(s, df)).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"))

  /** q94's anchor codebook: [[AnchorK]] fixed integer anchor vectors over
    * the [[LumaGrid]]² feature dims. Anchors are closed-form small ints
    * so BOTH engines derive the identical codebook (the q94 oracle SQL
    * interpolates [[anchor]]'s values) — the assignment is the IVF shape
    * (argmax of dot/‖anchor‖ over a broadcastable codebook) with
    * integer-exact dots; a TRAINED codebook would force the oracle to
    * replay k-means, which q34/q53 already cover for the embeddings
    * table.
    */
  val AnchorK = 8
  val LumaGrid = 4
  def anchor(k: Int, d: Int): Int = 1 + (3 * d + 7 * k + k * d) % 9

  /** One row per decoded blob: true dims, assigned anchor cell, the
    * winning anchor's integer dot, and the total luma — every column
    * either an exact integer or absent, so the oracle compare is
    * float-free.
    */
  case class LumaAssign(doc_id: Long, width: Int, height: Int,
      cell: Int, top_dot: Long, total_luma: Long)

  /** The q94 chain: REAL pixel decode → luma-grid sums → argmax-score
    * anchor assignment (score = dot/√‖a‖², one division of exact
    * integers — bit-identical on Spark and DuckDB; ties break to the
    * smaller k on both). Blobs no codec recognizes are DROPPED, so a
    * stub silently taking over shows up as a row-count mismatch.
    */
  def lumaAnchorAssign(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    val grid = LumaGrid
    val anchors = AnchorK
    blobs.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false)
      iter.flatMap { b =>
        lumaGridSums(b.bytes, grid).map { case (w, h, sums, _) =>
          var total = 0L
          var i = 0
          while (i < sums.length) { total += sums(i); i += 1 }
          var bestK = 0
          var bestDot = 0L
          var bestScore = Double.NegativeInfinity
          var k = 0
          while (k < anchors) {
            var dot = 0L
            var nsq = 0L
            var d = 0
            while (d < sums.length) {
              val a = anchor(k, d)
              dot += sums(d) * a
              nsq += a.toLong * a
              d += 1
            }
            val score = dot.toDouble / math.sqrt(nsq.toDouble)
            if (score > bestScore) { bestScore = score; bestK = k; bestDot = dot }
            k += 1
          }
          LumaAssign(b.doc_id, w, h, bestK, bestDot, total)
        }
      }
    }.toDF()
  }
}
