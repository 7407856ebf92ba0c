package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LasIO

/** LAS 1.4 / LAZ decoder validation against the reference's paired
  * fixtures (rust/sedona-pointcloud/tests/data): the .laz files must
  * decode to exactly the rows of their uncompressed .las twins. Skips
  * when the read-only reference checkout is absent. */
class LasSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/rust/sedona-pointcloud/tests/data"
  private def fixturesPresent = new java.io.File(s"$fixtures/large.laz").isFile

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("las-spec")
    .getOrCreate()

  test("large.laz decodes bit-exact to large.las (100k points, 2 chunks)") {
    assume(fixturesPresent)
    val las = LasIO.read(spark, s"$fixtures/large.las")
    val laz = LasIO.read(spark, s"$fixtures/large.laz")
    assert(las.count() == 100000L && laz.count() == 100000L)
    assert(las.schema == laz.schema)
    // exact content equality, order-insensitive
    assert(laz.exceptAll(las).isEmpty && las.exceptAll(laz).isEmpty)
    // absolute ground truth from the fixture generator: two constant
    // blocks of 50k points at (0.5,0.5,0.5) and (1,1,1)
    val groups = laz.groupBy("x", "y", "z").count().collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
    assert(groups == Set((0.5, 0.5, 0.5, 50000L), (1.0, 1.0, 1.0, 50000L)))
    // the chunk table makes chunks the split unit: 100k pts / 50k chunk = 2 tasks
    assert(laz.rdd.getNumPartitions == 2)
  }

  test("chunk table decodes to dense, in-bounds chunk extents") {
    assume(fixturesPresent)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/large.laz"))
    val pointOff = java.nio.ByteBuffer.wrap(bytes, 96, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val table = graft.sources.Laszip.chunkTable(bytes, pointOff).get
    assert(table.length == 2)
    assert(table(0)._1 == pointOff + 8L)
    assert(table(1)._1 == table(0)._1 + table(0)._2)
    val cto = java.nio.ByteBuffer.wrap(bytes, pointOff, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert(table(1)._1 + table(1)._2 == cto) // chunks end where the table begins
  }

  test("extra.laz decodes bit-exact to extra.las (typed extra bytes)") {
    assume(fixturesPresent)
    val las = LasIO.read(spark, s"$fixtures/extra.las")
    val laz = LasIO.read(spark, s"$fixtures/extra.laz")
    assert(las.schema == laz.schema)
    assert(laz.exceptAll(las).isEmpty && las.exceptAll(laz).isEmpty)
    val row = laz.collect().head
    val s = laz.schema
    assert(row.getDouble(s.fieldIndex("x")) == 0.5)
    assert(row.getDouble(s.fieldIndex("y")) == 0.5)
    assert(row.getDouble(s.fieldIndex("z")) == 0.5)
    // 10 dtypes × {plain, scaled, nodata} descriptors
    assert(s.fields.count(_.name.endsWith("_plain")) == 10)
    assert(row.getLong(s.fieldIndex("uint32_plain")) == 21L)
    assert(row.getLong(s.fieldIndex("int8_plain")) == 21L)
    // scaled dims store raw grid steps: (21 - offset 10) / scale 0.1 → 110
    assert(row.getLong(s.fieldIndex("uint16_scaled")) == 110L)
    assert(math.abs(row.getDouble(s.fieldIndex("float64_scaled")) - 110.0) < 1e-9)
    // no_data descriptors hold the sentinel 42 → surfaced as null
    assert(row.isNullAt(s.fieldIndex("int64_nodata")))
    assert(row.isNullAt(s.fieldIndex("float32_nodata")))
  }
}
