package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, decoded/feature-extracted in partition-sized
  * batches.
  *
  * Image formats decode FOR REAL through `javax.imageio` (pure JVM —
  * PNG/JPEG/GIF/BMP): width/height/mean come from actual pixels. Audio/
  * video (no codecs in the JVM) fall back to `decodeStub`, a deterministic
  * fake that keeps the pipeline testable end-to-end; bytes that fail image
  * decode also fall back, so a corrupt blob degrades instead of killing
  * the batch.
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
    StructField("height", IntegerType)))

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

  private val imageFormats = Set("png", "jpg", "jpeg", "gif", "bmp", "image", "img")

  /** Attach media metadata + run the partition-batched decode over a binary
    * column. Decoder state is initialized once per partition — the
    * `mapPartitions` boundary is the real contract. */
  def decodeBatch(df: DataFrame, binCol: String, format: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("media_meta", mediaMetaType),
      StructField("features", featureType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val tryImage = imageFormats.contains(format.toLowerCase)
    val rdd = df.rdd.mapPartitions { it =>
      // per-partition decoder init: no disk-backed ImageIO scratch files
      if (tryImage) javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val decoded = if (tryImage) decodeImage(bytes) else None
        val (meta, features) = decoded match {
          case Some((w, h, f)) => (Row(format, bytes.length, w, h), f)
          case None =>
            (Row(format, bytes.length,
              256 + math.abs(java.util.Arrays.hashCode(bytes)) % 1024,
              256 + math.abs(java.util.Arrays.hashCode(bytes) / 7) % 1024),
              decodeStub(bytes))
        }
        Row.fromSeq(row.toSeq ++ Seq(meta, features))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
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
