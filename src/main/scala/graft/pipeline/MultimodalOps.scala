package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, decoded/feature-extracted in partition-sized
  * batches. The Spark-side shape — schema, partitioning, batch iteration —
  * is real; the actual media decode is STUBBED (no image/audio libs in this
  * container) behind `decodeStub`, which produces a deterministic fake so
  * the pipeline is testable end-to-end.
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

  /** STUB: a real implementation would hand the batch to an image/audio
    * codec (e.g. via JNI); this fake derives deterministic values from the
    * bytes so tests exercise the full data path. */
  private[pipeline] def decodeStub(bytes: Array[Byte]): Row = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    Row(hex, if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length,
      1 + (bytes.length % 16))
  }

  /** Attach media metadata + run the partition-batched decode over a binary
    * column. Decoder state (here: none) is initialized once per partition —
    * the `mapPartitions` boundary is the real contract. */
  def decodeBatch(df: DataFrame, binCol: String, format: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("media_meta", mediaMetaType),
      StructField("features", featureType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val meta = Row(format, bytes.length,
          256 + math.abs(java.util.Arrays.hashCode(bytes)) % 1024,
          256 + math.abs(java.util.Arrays.hashCode(bytes) / 7) % 1024)
        Row.fromSeq(row.toSeq ++ Seq(meta, decodeStub(bytes)))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
