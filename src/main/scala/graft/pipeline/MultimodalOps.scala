package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, decoded/feature-extracted in partition-sized
  * batches.
  *
  * Image formats decode FOR REAL through `javax.imageio` (pure JVM —
  * PNG/JPEG/GIF/BMP): width/height/mean come from actual pixels. Audio
  * decodes FOR REAL for RIFF/WAVE PCM (direct chunk-walk parser, 8/16-bit,
  * any channel count): sample rate / channels / frame count / mean
  * amplitude come from actual samples. Video (no codecs in the JVM) falls
  * back to `decodeStub`, a deterministic fake that keeps the pipeline
  * testable end-to-end; bytes that fail decode also fall back, so a
  * corrupt blob degrades instead of killing the batch.
  *
  * At cluster scale this is the pattern for GPU/native decoders: one
  * decoder init per partition, rows streamed through it in order, output
  * schema fixed up front.
  */
object MultimodalOps {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  val featureType: StructType = StructType(Seq(
    StructField("checksum", StringType),
    StructField("mean_byte", DoubleType),
    StructField("n_frames", IntegerType)))

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB for formats the JVM cannot decode (audio/video): deterministic
    * values derived from the bytes so tests exercise the full data path. */
  private[pipeline] def decodeStub(bytes: Array[Byte]): Row = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    Row(md5Hex(bytes), if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      1 + (bytes.length % 16))
  }

  /** Real image decode: (width, height, features) from actual pixels —
    * mean over the three RGB channels of every pixel. None when the bytes
    * aren't a decodable image. */
  private[pipeline] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Row)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, Row(md5Hex(bytes), sum.toDouble / (w.toLong * h * 3), 1)))
      }
    } catch { case _: Exception => None }

  /** Real audio decode: RIFF/WAVE PCM (8/16-bit, any channel count) parsed
    * directly — fmt/data chunk walk, so a WAV with extra chunks (LIST,
    * fact) still decodes. Returns (sampleRate, channels, framesPerChannel,
    * features); mean_byte is the mean absolute amplitude scaled to the
    * 0-255 byte range so the feature slot is comparable across modalities.
    * None when the bytes aren't PCM WAV (caller falls back to the stub). */
  /** WAV RIFF chunk walk shared by the decoders: (rate, channels, bits,
    * dataOff, dataLen) for PCM 8/16-bit; None on anything else. */
  private def wavLayout(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (bytes.length < 44) return None
    def tag(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = 0; var rate = 0; var bits = 0; var audioFormat = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val id = tag(pos); val size = bb.getInt(pos + 4)
      // subtraction form: 'pos + 8 + size' overflows Int on hostile sizes
      if (size < 0 || size > bytes.length - pos - 8) return None
      id match {
        case "fmt " if size >= 16 =>
          audioFormat = bb.getShort(pos + 8) & 0xffff
          channels = bb.getShort(pos + 10) & 0xffff
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22) & 0xffff
        case "data" => dataOff = pos + 8; dataLen = size
        case _ => // skip LIST/fact/...
      }
      pos += 8 + size + (size & 1)
    }
    if (audioFormat != 1 || channels <= 0 || rate <= 0 ||
      (bits != 8 && bits != 16) || dataOff < 0) None
    else Some((rate, channels, bits, dataOff, dataLen))
  }

  /** Interleaved PCM samples in their signed representation (8-bit data
    * is offset-binary and shifts to [-128, 127]). Total: null or
    * malformed bytes yield None — callers promise "undecodable
    * contributes zero rows", so nothing here may throw. */
  private[pipeline] def wavSamples(bytes: Array[Byte]): Option[Array[Int]] =
    if (bytes == null) None
    else try wavLayout(bytes).map { case (_, _, bits, dataOff, dataLen) =>
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = dataLen / (bits / 8)
      Array.tabulate(n)(i =>
        if (bits == 16) bb.getShort(dataOff + i * 2).toInt
        else (bytes(dataOff + i) & 0xff) - 128)
    } catch { case _: Exception => None }

  private[pipeline] def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Int, Row)] =
    try {
      val (rate, channels, bits, dataOff, dataLen) =
        wavLayout(bytes).getOrElse(return None)
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val bytesPer = bits / 8
      val total = dataLen / bytesPer
      val frames = total / channels
      var sumAbs = 0L
      var i = 0
      while (i < total) {
        val v = if (bits == 16) bb.getShort(dataOff + i * 2).toInt
          else (bytes(dataOff + i) & 0xff) - 128
        sumAbs += math.abs(v)
        i += 1
      }
      val fullScale = if (bits == 16) 32768.0 else 128.0
      val mean = if (total == 0) 0.0
        else sumAbs.toDouble / total / fullScale * 255.0
      Some((rate, channels, frames, Row(md5Hex(bytes), mean, frames)))
    } catch { case _: Exception => None }

  private val imageFormats = Set("png", "jpg", "jpeg", "gif", "bmp", "image", "img")
  private val audioFormats = Set("wav", "wave", "audio")

  /** Attach media metadata + run the partition-batched decode over a binary
    * column. Decoder state is initialized once per partition — the
    * `mapPartitions` boundary is the real contract. */
  def decodeBatch(df: DataFrame, binCol: String, format: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("media_meta", mediaMetaType),
      StructField("features", featureType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val tryImage = imageFormats.contains(format.toLowerCase)
    val tryWav = audioFormats.contains(format.toLowerCase)
    val rdd = df.rdd.mapPartitions { it =>
      // per-partition decoder init: no disk-backed ImageIO scratch files
      if (tryImage) javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val (meta, features) =
          (if (tryImage) decodeImage(bytes) else None) match {
            case Some((w, h, f)) => (Row(format, bytes.length, w, h, null, null), f)
            case None => (if (tryWav) decodeWav(bytes) else None) match {
              case Some((rate, ch, _, f)) =>
                (Row(format, bytes.length, null, null, rate, ch), f)
              case None =>
                (Row(format, bytes.length,
                  256 + math.abs(java.util.Arrays.hashCode(bytes)) % 1024,
                  256 + math.abs(java.util.Arrays.hashCode(bytes) / 7) % 1024,
                  null, null),
                  decodeStub(bytes))
            }
          }
        Row.fromSeq(row.toSeq ++ Seq(meta, features))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Per-frame audio features over PCM WAV — the energy/silence profile
    * a speech-curation pipeline computes ahead of VAD/segmentation:
    * non-overlapping frames of `frameLen` interleaved samples (the
    * trailing partial frame counts), each reporting the exact-integer
    * abs-amplitude sum, the peak |amplitude|, and frame-local sign
    * crossings (#{i > frame start : (x[i-1] < 0) != (x[i] < 0)}).
    * One output row per (input row, frame) — map-only, no shuffle,
    * integer-exact across engines. Undecodable bytes contribute zero
    * rows. */
  def audioFrameStats(df: DataFrame, idCol: String, binCol: String,
      frameLen: Int): DataFrame = {
    require(frameLen > 0, s"audioFrameStats: frameLen $frameLen <= 0")
    val schema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("abs_sum", LongType, nullable = false),
      StructField("peak", LongType, nullable = false),
      StructField("crossings", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { row =>
        wavSamples(row.getAs[Array[Byte]](binIdx)) match {
          case None => Iterator.empty
          case Some(v) =>
            val nf = (v.length + frameLen - 1) / frameLen
            (0 until nf).iterator.map { f =>
              val s = f * frameLen
              val e = math.min(v.length, s + frameLen)
              var sum = 0L; var peak = 0L; var cr = 0L
              var i = s
              while (i < e) {
                val a = math.abs(v(i).toLong)
                sum += a
                if (a > peak) peak = a
                if (i > s && ((v(i - 1) < 0) != (v(i) < 0))) cr += 1
                i += 1
              }
              Row(row.get(idIdx), f, e - s, sum, peak, cr)
            }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Per-tile image statistics — the image-modality feature-extraction
    * pass of a vision-data curation pipeline (brightness/contrast tiles
    * ahead of filtering or patching): the decoded image splits into
    * non-overlapping `tile` x `tile` blocks (partial edge tiles count),
    * each reporting its pixel count and the exact-integer sum / min /
    * max of the channel-sum luma (R+G+B, 0..765 per pixel). One output
    * row per (input row, tile) — map-only, no shuffle, integer-exact
    * across engines. Undecodable or null bytes contribute zero rows. */
  def imageTileStats(df: DataFrame, idCol: String, binCol: String,
      tile: Int): DataFrame = {
    require(tile > 0, s"imageTileStats: tile $tile <= 0")
    val schema = StructType(Seq(
      df.schema(idCol),
      StructField("tile_x", IntegerType, nullable = false),
      StructField("tile_y", IntegerType, nullable = false),
      StructField("n_px", IntegerType, nullable = false),
      StructField("lum_sum", LongType, nullable = false),
      StructField("lum_min", LongType, nullable = false),
      StructField("lum_max", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val img =
          if (bytes == null) null
          else try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth; val h = img.getHeight
          val ntx = (w + tile - 1) / tile
          val nty = (h + tile - 1) / tile
          (0 until nty).iterator.flatMap { ty =>
            (0 until ntx).iterator.map { tx =>
              val x1 = math.min(w, (tx + 1) * tile)
              val y1 = math.min(h, (ty + 1) * tile)
              var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
              var n = 0
              var y = ty * tile
              while (y < y1) {
                var x = tx * tile
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  val lum = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                    (rgb & 0xFF)).toLong
                  sum += lum
                  if (lum < mn) mn = lum
                  if (lum > mx) mx = lum
                  n += 1
                  x += 1
                }
                y += 1
              }
              Row(row.get(idIdx), tx, ty, n, sum, mn, mx)
            }
          }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Exact integer box-downsample by `factor`: output pixel = floor of
    * the block mean per RGB channel, trailing rows/columns that do not
    * fill a block drop. Integer math end-to-end so the result is
    * bit-reproducible across engines and platforms (no float scaler). */
  private[pipeline] def boxDownsample(img: java.awt.image.BufferedImage,
      factor: Int): java.awt.image.BufferedImage = {
    val rw = img.getWidth / factor
    val rh = img.getHeight / factor
    val out = new java.awt.image.BufferedImage(rw, rh,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val n = factor * factor
    var ry = 0
    while (ry < rh) {
      var rx = 0
      while (rx < rw) {
        var sr = 0; var sg = 0; var sb = 0
        var dy = 0
        while (dy < factor) {
          var dx = 0
          while (dx < factor) {
            val rgb = img.getRGB(rx * factor + dx, ry * factor + dy)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            dx += 1
          }
          dy += 1
        }
        out.setRGB(rx, ry, ((sr / n) << 16) | ((sg / n) << 8) | (sb / n))
        rx += 1
      }
      ry += 1
    }
    out
  }

  /** Image RESIZE over a binary column: real decode (`javax.imageio`),
    * exact integer box-downsample, PNG re-encode. Appends resized_w/
    * resized_h, resized_sum — the deterministic pixel checksum
    * `Σ (R*31 + C) · (r + g + b)` over the resized grid — and the
    * resized PNG bytes. Undecodable rows get null outputs (degrade, not
    * die). One decoder init per partition, as decodeBatch. */
  def resizeBatch(df: DataFrame, binCol: String, factor: Int): DataFrame = {
    require(factor > 0, "resizeBatch: factor must be positive")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("resized_w", IntegerType),
      StructField("resized_h", IntegerType),
      StructField("resized_sum", LongType),
      StructField("resized_png", BinaryType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val extra: Seq[Any] =
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null || img.getWidth < factor || img.getHeight < factor)
              Seq(null, null, null, null)
            else {
              val out = boxDownsample(img, factor)
              var sum = 0L
              var y = 0
              while (y < out.getHeight) {
                var x = 0
                while (x < out.getWidth) {
                  val rgb = out.getRGB(x, y)
                  sum += (y.toLong * 31 + x) *
                    (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Seq(out.getWidth, out.getHeight, sum, bos.toByteArray)
            }
          } catch { case _: Exception => Seq(null, null, null, null) }
        Row.fromSeq(row.toSeq ++ extra)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Parsed YUV4MPEG2 stream: (width, height, bytes-per-frame, Y-plane
    * length, frame payload offsets). Y4M is the uncompressed video
    * interchange container (no codec needed — the one video format a
    * pure JVM can decode for real); C420 (default), C422, C444 and Cmono
    * chroma layouts supported. */
  private[graft] def parseY4m(bytes: Array[Byte])
    : Option[(Int, Int, Int, Int, Array[Int])] =
    try {
      val headEnd = bytes.indexOf('\n'.toByte)
      if (headEnd < 9) return None
      val head = new String(bytes, 0, headEnd, "US-ASCII")
      if (!head.startsWith("YUV4MPEG2")) return None
      var w = 0; var h = 0; var chroma = "420"
      head.split(' ').drop(1).foreach { p =>
        if (p.startsWith("W")) w = p.substring(1).toInt
        else if (p.startsWith("H")) h = p.substring(1).toInt
        else if (p.startsWith("C")) chroma = p.substring(1)
      }
      if (w <= 0 || h <= 0) return None
      val y = w * h
      val frameLen = chroma match {
        case c if c.startsWith("420") => y + 2 * ((w / 2) * (h / 2))
        case c if c.startsWith("422") => y + 2 * ((w / 2) * h)
        case c if c.startsWith("444") => 3 * y
        case c if c.startsWith("mono") => y
        case _ => return None
      }
      val offs = Array.newBuilder[Int]
      var pos = headEnd + 1
      while (pos < bytes.length) {
        val lineEnd = bytes.indexOf('\n'.toByte, pos)
        if (lineEnd < 0) return None
        val marker = new String(bytes, pos, math.min(5, lineEnd - pos), "US-ASCII")
        if (marker != "FRAME") return None
        if (lineEnd + 1 + frameLen > bytes.length) return None
        offs += lineEnd + 1
        pos = lineEnd + 1 + frameLen
      }
      Some((w, h, frameLen, y, offs.result()))
    } catch { case _: Exception => None }

  /** Video FRAME-SAMPLE over a binary column: decode the Y4M container
    * for real, keep every `everyN`-th frame, and emit one output row per
    * sampled frame with its exact Y-plane (luma) integer sum — the
    * deterministic per-frame feature. Non-Y4M rows emit nothing. At
    * cluster scale each task streams its rows through one parser — the
    * same per-partition contract as decodeBatch; a codec'd container
    * would swap parseY4m for the native decoder behind this boundary. */
  def sampleFrames(df: DataFrame, binCol: String, everyN: Int): DataFrame = {
    require(everyN > 0, "sampleFrames: everyN must be positive")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("luma_sum", LongType),
      StructField("n_pix", IntegerType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        parseY4m(bytes) match {
          case None => Iterator.empty
          case Some((_, _, _, yLen, offs)) =>
            Iterator.range(0, offs.length, everyN).map { fi =>
              val off = offs(fi)
              var sum = 0L
              var i = 0
              while (i < yLen) { sum += bytes(off + i) & 0xff; i += 1 }
              // Seq[Any]: a bare Seq(Int, Long, Int) harmonizes to
              // Seq[Long] (weak conformance) and boxes the ints as Longs,
              // which the IntegerType encoder then rejects
              Row.fromSeq(row.toSeq ++ Seq[Any](fi, sum, yLen))
            }
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Deterministic gradient PNG (fixture generator): grayscale pixel
    * value `(r*7 + c*3 + seed) % 251` in all three channels — closed
    * form, so a SQL oracle can recompute resize results without a
    * decoder. */
  def synthGradientPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val v = ((r.toLong * 7 + c * 3 + seed) % 251).toInt
        img.setRGB(c, r, (v << 16) | (v << 8) | v)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic C420 Y4M fixture: Y pixel `(r*5 + c*11 + f*13 + seed)
    * % 240`, chroma planes constant 128. Closed form for SQL oracles. */
  def synthY4m(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    val yLen = w * h
    val cLen = (w / 2) * (h / 2)
    val head = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(head)
    val fm = "FRAME\n".getBytes("US-ASCII")
    var f = 0
    while (f < frames) {
      bos.write(fm)
      var i = 0
      while (i < yLen) {
        bos.write((((i / w).toLong * 5 + (i % w) * 11 + f * 13 + seed) % 240).toInt)
        i += 1
      }
      i = 0
      while (i < 2 * cLen) { bos.write(128); i += 1 }
      f += 1
    }
    bos.toByteArray
  }

  /** Canonical 44-byte-header 16-bit PCM mono WAV from the given samples
    * (fixture generator — real RIFF structure on the write side too). */
  def synthWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Deterministic solid-gray PNG bytes (fixture generator for gates and
    * tests — real codec on the write side too, so decode exercises actual
    * PNG structure). */
  def synthPng(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
