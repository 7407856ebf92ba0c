package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** In-db raster model (reference schema: rust/sedona-schema/src/raster.rs:
  * 36-96, simplified: every band is f64 little-endian, in-db only — outdb
  * refs and multi-datatype bands are v2).
  *
  * transform follows the GDAL geotransform convention
  * [ulx, scale_x, skew_x, uly, skew_y, scale_y]:
  *   world_x = ulx + col*scale_x + row*skew_x
  *   world_y = uly + col*skew_y + row*scale_y
  */
object RasterModel {

  // dims/shape carry per-band N-D structure (reference raster.rs:36-96
  // band fields dim_names/source_shape): C-order, spatial "y","x" always
  // the LAST two entries; null means plain 2D ["y","x"]/[height,width].
  val bandType: StructType = StructType(Seq(
    StructField("nodata", DoubleType),
    StructField("data", BinaryType),
    StructField("dims", ArrayType(StringType, containsNull = false)),
    StructField("shape", ArrayType(LongType, containsNull = false)),
    // declared source pixel type (reference raster.rs:210-223 names,
    // e.g. "UNSIGNED_8BITS"); null = natively f64 ("REAL_64BITS").
    // Working pixels are always f64 — this tags what the source stored.
    StructField("ptype", StringType)))

  val dataType: StructType = StructType(Seq(
    StructField("crs", StringType),
    StructField("transform", ArrayType(DoubleType, containsNull = false)),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bands", ArrayType(bandType, containsNull = false)),
    // outdb reference (reference: OutDb raster refs + RS_EnsureLoaded,
    // rust/sedona-query-planner/src/ensure_loaded.rs): non-null path +
    // empty bands = pixels not materialized yet
    StructField("path", StringType)))

  /** One band: f64-LE pixel bytes plus optional N-D structure. */
  case class Band(nodata: Double, data: Array[Byte],
      dims: IndexedSeq[String] = null, shape: IndexedSeq[Long] = null,
      ptype: String = null) {
    /** Declared pixel type name; natively-f64 bands are REAL_64BITS. */
    def pixelTypeName: String = if (ptype == null) "REAL_64BITS" else ptype
    /** Full dim-name list, spatial last ("y","x" default for 2D bands). */
    def dimsOf(h: Int, w: Int): IndexedSeq[String] =
      if (dims == null) Vector("y", "x") else dims
    def shapeOf(h: Int, w: Int): IndexedSeq[Long] =
      if (shape == null) Vector(h.toLong, w.toLong) else shape
  }

  case class Raster(crs: String, gt: Array[Double], width: Int, height: Int,
      bands: IndexedSeq[Band], path: String = null) {
    def isOutDb: Boolean = path != null && bands.isEmpty
    def worldX(col: Double, row: Double): Double = gt(0) + col * gt(1) + row * gt(2)
    def worldY(col: Double, row: Double): Double = gt(3) + col * gt(4) + row * gt(5)
    /** inverse affine -> fractional (col, row); errors on a singular
      * geotransform (reference geo_transform invert error text) */
    def rasterCoord(x: Double, y: Double): (Double, Double) = {
      val det = gt(1) * gt(5) - gt(2) * gt(4)
      require(det != 0.0, "Cannot compute coordinate: determinant is zero.")
      val dx = x - gt(0); val dy = y - gt(3)
      ((gt(5) * dx - gt(2) * dy) / det, (gt(1) * dy - gt(4) * dx) / det)
    }
    def value(band1: Int, col: Int, row: Int): java.lang.Double = {
      if (band1 < 1 || band1 > bands.length) return null
      if (col < 0 || col >= width || row < 0 || row >= height) return null
      if (bands(band1 - 1).dims != null && bands(band1 - 1).dims.length != 2) return null
      val Band(nodata, data, _, _, _) = bands(band1 - 1)
      val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val v = bb.getDouble((row * width + col) * 8)
      if (v == nodata) null else java.lang.Double.valueOf(v)
    }
  }

  def fromRow(r: InternalRow): Raster = {
    val bandsArr = r.getArray(4)
    Raster(
      r.getUTF8String(0).toString,
      r.getArray(1).toDoubleArray(),
      r.getInt(2), r.getInt(3),
      (0 until bandsArr.numElements()).map { i =>
        val b = bandsArr.getStruct(i, 5)
        Band(b.getDouble(0), b.getBinary(1),
          if (b.isNullAt(2)) null
          else b.getArray(2).toObjectArray(StringType).map(_.toString).toIndexedSeq,
          if (b.isNullAt(3)) null else b.getArray(3).toLongArray().toIndexedSeq,
          if (b.isNullAt(4)) null else b.getUTF8String(4).toString)
      },
      if (r.numFields > 5 && !r.isNullAt(5)) r.getUTF8String(5).toString else null)
  }

  def toRow(crs: String, gt: Array[Double], width: Int, height: Int,
      bands: Seq[Band], path: String = null): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(crs),
      new GenericArrayData(gt),
      width, height,
      new GenericArrayData(bands.map { case Band(nodata, data, dims, shape, ptype) =>
        new GenericInternalRow(Array[Any](nodata, data,
          if (dims == null) null
          else new GenericArrayData(dims.map(UTF8String.fromString).toArray[Any]),
          if (shape == null) null else new GenericArrayData(shape.toArray),
          if (ptype == null) null else UTF8String.fromString(ptype)))
      }.toArray[Any]),
      if (path == null) null else UTF8String.fromString(path)))

  def packDoubles(vs: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vs.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putDouble)
    bb.array()
  }
}
