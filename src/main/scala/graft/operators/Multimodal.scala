package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side shape is real and tested — binary columns, metadata
  * structs, per-partition batched processing via `mapPartitions` on a
  * typed Dataset (the Scala analogue of `mapInPandas` batching).
  *
  * The image codec is REAL for image payloads: [[decodeImage]] /
  * [[resizeImageBytes]] go through JDK-only `javax.imageio` (PNG/JPEG/
  * GIF/BMP — no external libs), exercised end-to-end by the
  * m4_media_decode oracle query. Non-image payloads (audio/video — no
  * JDK codec exists) fall back to the deterministic stubs below, which
  * keep the batching/schema plumbing exercised on any bytes.
  */
object Multimodal {

  /** Decoded image summary: dimensions, mean luminance (0-255), and an
    * 8-bin normalized luminance histogram usable as a feature vector.
    */
  case class DecodedImage(width: Int, height: Int, meanLuma: Double,
                          histogram: Array[Float])

  /** Magic-byte sniff for the formats `javax.imageio` ships readers
    * for: PNG, JPEG, GIF, BMP. Cheaper and more predictable than
    * letting ImageIO probe every payload (audio/video/text skip the
    * codec entirely).
    */
  private[graft] def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && {
      val b0 = bytes(0) & 0xFF; val b1 = bytes(1) & 0xFF
      val b2 = bytes(2) & 0xFF; val b3 = bytes(3) & 0xFF
      (b0 == 0x89 && b1 == 'P' && b2 == 'N' && b3 == 'G') || // PNG
      (b0 == 0xFF && b1 == 0xD8 && b2 == 0xFF) ||            // JPEG
      (b0 == 'G' && b1 == 'I' && b2 == 'F' && b3 == '8') ||  // GIF
      (b0 == 'B' && b1 == 'M')                               // BMP
    }

  // ImageIO's default disk cache writes a temp file per decode — a
  // per-row fsync in a tight executor loop. In-memory streams only.
  javax.imageio.ImageIO.setUseCache(false)

  /** Real JDK decode: `javax.imageio` for image payloads, `None` for
    * anything else (caller falls back to the deterministic stub).
    * Thread-safe — ImageIO.read constructs a fresh reader per call, so
    * concurrent executor threads don't contend.
    */
  def decodeImage(bytes: Array[Byte]): Option[DecodedImage] = {
    if (!looksLikeImage(bytes)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val hist = new Array[Long](8)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF)
            + (rgb & 0xFF)) / 3.0
          sum += luma
          hist(math.min((luma / 32.0).toInt, 7)) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      Some(DecodedImage(w, h, sum / n, hist.map(v => (v / n).toFloat)))
    }
  }

  /** Real JDK resize: bilinear `Graphics2D` scale re-encoded as PNG.
    * `None` for non-image payloads (caller falls back to the stub).
    */
  def resizeImageBytes(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    if (!looksLikeImage(bytes)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val out = new java.awt.image.BufferedImage(tw, th,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(img, 0, 0, tw, th, null)
      g2.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** Deterministic solid-gray PNG through the real encoder — the
    * m4_media_decode fixture generator: a constant image is lossless
    * under PNG and invariant under resize, so an arithmetic oracle can
    * predict the decoded dims/luminance exactly.
    */
  def encodeSolidPng(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = gray & 0xFF
    val gfx = img.createGraphics()
    gfx.setColor(new java.awt.Color(g, g, g))
    gfx.fillRect(0, 0, w, h)
    gfx.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic vertical-stripe PNG (8×8, column x gray =
    * ((seed + x) % 8) × 30) through the real encoder — the
    * m5_image_dedup fixture: stripes survive PNG losslessly and give
    * every `seed % 8` class a distinct, predictable perceptual hash.
    */
  def encodeStripePng(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < 8) {
      val g = (((seed + x) % 8 + 8) % 8).toInt * 30
      var y = 0
      while (y < 8) { img.setRGB(x, y, (g << 16) | (g << 8) | g); y += 1 }
      x += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 64-bit average-hash (aHash) of an image through the real codec:
    * decode, area-average onto an 8×8 grid with exact arithmetic we
    * control (no library resampler — Java2D's bilinear sampling is not
    * arithmetic an oracle can replay), set bit y·8+x iff the block's
    * mean luma ≥ the global mean. The standard cheap perceptual
    * fingerprint for image-level near-dup detection; `None` for
    * non-image payloads.
    */
  def aHash64(bytes: Array[Byte]): Option[Long] = {
    if (!looksLikeImage(bytes)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    val block = new Array[Double](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = math.min(y * 8 / h, 7)
      var x = 0
      while (x < w) {
        val bx = math.min(x * 8 / w, 7)
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF)
          + (rgb & 0xFF)) / 3.0
        block(by * 8 + bx) += luma
        cnt(by * 8 + bx) += 1
        x += 1
      }
      y += 1
    }
    // images narrower/shorter than the grid leave some blocks with no
    // source pixels — fill them by nearest-pixel replication (the
    // upscale half of area mapping), so a solid 4×4 hashes identically
    // to a solid 8×8 instead of phantom zero blocks diluting the mean
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val i = by * 8 + bx
        if (cnt(i) > 0) block(i) /= cnt(i)
        else {
          val sx = math.min(bx * w / 8, w - 1)
          val sy = math.min(by * h / 8, h - 1)
          val rgb = img.getRGB(sx, sy)
          block(i) = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF)
            + (rgb & 0xFF)) / 3.0
        }
        bx += 1
      }
      by += 1
    }
    var i = 0
    var total = 0.0
    while (i < 64) { total += block(i); i += 1 }
    val mean = total / 64.0
    var hashV = 0L
    i = 0
    while (i < 64) {
      if (block(i) >= mean) hashV |= 1L << i
      i += 1
    }
    Some(hashV)
  }

  /** Header-only PNG metadata: width, height, bit depth, color type
    * straight from the IHDR chunk — the 100 TB metadata-scan pattern
    * (dims/format audits over a binary column must NOT decode pixels;
    * 33 bytes of header reads vs megabytes of inflate per image).
    * Returns `None` for non-PNG payloads.
    */
  def pngHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes.length < 33) return None
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xFF) != sig(i)) return None; i += 1 }
    // first chunk must be IHDR per spec: length(4) type(4) data(13)
    def be32(o: Int): Int =
      ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
        ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    if (be32(8) != 13) return None
    if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
        bytes(15) == 'R')) return None
    Some((be32(16), be32(20), bytes(24) & 0xFF, bytes(25) & 0xFF))
  }

  /** Decoded PCM audio summary: rate/length from the header, peak and
    * absolute-sum energy from the samples (integer-exact features).
    */
  case class DecodedWav(sampleRate: Int, nSamples: Int, peak: Int,
                        sumAbs: Long)

  /** Minimal RIFF/WAVE writer: 16-bit mono PCM, the canonical
    * training-audio interchange shape. WAV is a fully-specified byte
    * container, so unlike image decode this needs no codec library at
    * all — pure little-endian arithmetic.
    */
  def encodePcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Real RIFF/WAVE parse: validates the RIFF/WAVE magic, walks the
    * chunk list to `fmt ` and `data` (tolerating extra chunks like
    * LIST/INFO), and requires 16-bit mono PCM. Returns `None` for
    * non-WAV payloads — the caller's stub-fallback boundary, same as
    * [[decodeImage]].
    */
  def decodeWav(bytes: Array[Byte]): Option[DecodedWav] =
    decodeWavSamples(bytes).map { case (sampleRate, samples) =>
      var peak = 0; var sumAbs = 0L; var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toInt)
        if (a > peak) peak = a
        sumAbs += a; i += 1
      }
      DecodedWav(sampleRate, samples.length, peak, sumAbs)
    }

  /** Full decode: `(sampleRate, samples)` — the input to feature
    * extraction (framed energies, resampling); [[decodeWav]] is the
    * summary view over the same parse.
    */
  def decodeWavSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") return None
    bb.getInt // riff size (unreliable in the wild; chunk walk governs)
    if (fourcc() != "WAVE") return None
    var sampleRate = -1; var ok = false
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && (samples == null || !ok)) {
      val id = fourcc(); val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      val next = bb.position() + len + (len & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = bb.getShort; val ch = bb.getShort
          sampleRate = bb.getInt; bb.getInt; bb.getShort
          val bits = bb.getShort
          ok = fmt == 1 && ch == 1 && bits == 16
          if (!ok) return None
        case "data" =>
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
        case _ => // skip LIST/INFO/etc.
      }
      bb.position(math.min(next, bb.limit()))
    }
    if (!ok || samples == null || sampleRate <= 0) None
    else Some((sampleRate, samples))
  }

  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String,
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                           feature: Array[Float])

  /** Wrap a documents table into a media table: binary payload + typed
    * metadata struct. In production the binary comes from the raw scan;
    * here it is the utf-8 text bytes (deterministic).
    */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"),
      (pmod(col(idCol), lit(640)) + 64).cast("int").as("width"),
      (pmod(col(idCol), lit(480)) + 48).cast("int").as("height"))

  /** Fallback feature for NON-image payloads (audio/video have no JDK
    * codec; a production build would bind ffmpeg here): a deterministic
    * 8-dim byte-statistics histogram, same shape as the real image
    * histogram so the two paths union cleanly.
    */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val buckets = new Array[Long](8)
    var i = 0
    while (i < bytes.length) { buckets((bytes(i) & 0xFF) % 8) += 1; i += 1 }
    val n = math.max(bytes.length, 1).toFloat
    buckets.map(_ / n)
  }

  /** Feature extraction: batched per partition, no driver involvement.
    * Partition count (not row count) bounds peak memory — repartition
    * upstream so each task holds one batch of decodable payloads.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val feature = decodeImage(bytes).map(_.histogram)
            .getOrElse(decodeStub(bytes))
          MediaFeatures(id, bytes.length.toLong, polyChecksum(bytes), feature)
        }
      }
  }

  /** Payload checksum as a polynomial fold over the bytes — the same
    * portable construction as TextAnalysis.fingerprint (any engine can
    * recompute it, which is what makes m2 oracle-checkable; CRC32 was
    * not expressible in the oracle's SQL).
    */
  def polyChecksum(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xFF)) % 1000000007L
      i += 1
    }
    acc
  }

  case class ResizedMedia(doc_id: Long, media: Array[Byte], mime: String,
                          width: Int, height: Int)

  /** Image resize stage: per-partition batched like extractFeatures.
    * Image payloads go through the real `javax.imageio` bilinear scaler
    * ([[resizeImageBytes]], output re-encoded as PNG); non-image
    * payloads fall back to the deterministic byte-subsample stub, which
    * preserves the pipeline contract — output metadata reflects the
    * target dimensions, the payload column stays binary, batching stays
    * per-partition.
    */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("doc_id", "media", "mime", "width", "height")
      .as[(Long, Array[Byte], String, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, bytes, mime, w, h) =>
          resizeImageBytes(bytes, targetW, targetH) match {
            case Some(png) =>
              ResizedMedia(id, png, "image/png", targetW, targetH)
            case None =>
              ResizedMedia(id, resampleStub(bytes, w, h, targetW, targetH),
                mime, targetW, targetH)
          }
        }
      }
  }

  /** Fallback resampler for non-image payloads: deterministic byte
    * subsample proportional to the pixel-count ratio.
    */
  private def resampleStub(bytes: Array[Byte], w: Int, h: Int,
                           tw: Int, th: Int): Array[Byte] = {
    if (bytes.isEmpty || w <= 0 || h <= 0) return bytes
    val ratio = math.min(1.0, (tw.toDouble * th) / (w.toDouble * h))
    val outLen = math.max(1, math.round(bytes.length * ratio).toInt)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = bytes((i.toLong * bytes.length / outLen).toInt)
      i += 1
    }
    out
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk of
    * `frameBytes` bytes becomes a frame row (explode — distributed, no
    * per-row Python/driver hop).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   stride: Int = 4): DataFrame = {
    val nFrames = floor(octet_length(col("media")) / frameBytes).cast("int")
    media.select(col("doc_id"), col("media"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        col("media").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
  }
}
