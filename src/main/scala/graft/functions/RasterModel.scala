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

  val bandType: StructType = StructType(Seq(
    StructField("nodata", DoubleType),
    StructField("data", BinaryType)))

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

  case class Raster(crs: String, gt: Array[Double], width: Int, height: Int,
      bands: IndexedSeq[(Double, Array[Byte])], path: String = null) {
    def isOutDb: Boolean = path != null && bands.isEmpty
    def worldX(col: Double, row: Double): Double = gt(0) + col * gt(1) + row * gt(2)
    def worldY(col: Double, row: Double): Double = gt(3) + col * gt(4) + row * gt(5)
    /** inverse affine -> fractional (col, row) */
    def rasterCoord(x: Double, y: Double): (Double, Double) = {
      val det = gt(1) * gt(5) - gt(2) * gt(4)
      val dx = x - gt(0); val dy = y - gt(3)
      ((gt(5) * dx - gt(2) * dy) / det, (gt(1) * dy - gt(4) * dx) / det)
    }
    def value(band1: Int, col: Int, row: Int): java.lang.Double = {
      if (band1 < 1 || band1 > bands.length) return null
      if (col < 0 || col >= width || row < 0 || row >= height) return null
      val (nodata, data) = bands(band1 - 1)
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
        val b = bandsArr.getStruct(i, 2)
        (b.getDouble(0), b.getBinary(1))
      },
      if (r.numFields > 5 && !r.isNullAt(5)) r.getUTF8String(5).toString else null)
  }

  def toRow(crs: String, gt: Array[Double], width: Int, height: Int,
      bands: Seq[(Double, Array[Byte])], path: String = null): InternalRow =
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(crs),
      new GenericArrayData(gt),
      width, height,
      new GenericArrayData(bands.map { case (nodata, data) =>
        new GenericInternalRow(Array[Any](nodata, data))
      }.toArray[Any]),
      if (path == null) null else UTF8String.fromString(path)))

  def packDoubles(vs: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vs.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putDouble)
    bb.array()
  }
}
