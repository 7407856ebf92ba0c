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

  test("legacy LAZ (pointwise compressor 2): chunks are the split unit and " +
      "split decode equals sequential") {
    import org.apache.spark.sql.functions._
    // 120_001 points -> 3 pointwise chunks (50k each) in ONE file
    val df = spark.range(120001).select(
      (col("id") % 1000).cast("double").as("x"),
      (col("id") % 777).cast("double").as("y"),
      (col("id") % 13).cast("double").as("z"),
      (col("id") % 65000).as("intensity"),
      (col("id") % 32).as("classification"),
      (col("id").cast("double") * 0.001).as("gps_time")).coalesce(1)
    val dir = "/tmp/graft_legacy_chunks"
    LasIO.write(df, s"$dir/laz", scale = 0.001, compress = true)
    LasIO.write(df, s"$dir/las", scale = 0.001, compress = false)
    val laz = LasIO.read(spark, s"$dir/laz")
    val las = LasIO.read(spark, s"$dir/las")
    // one file, three chunk splits
    assert(laz.rdd.getNumPartitions == 3, s"got ${laz.rdd.getNumPartitions} splits")
    assert(laz.count() == 120001L && las.count() == 120001L)
    // split decode == sequential (uncompressed) decode, order-insensitive
    assert(laz.exceptAll(las).isEmpty && las.exceptAll(laz).isEmpty)
    // spot anchors across chunk boundaries (ids 49999/50000, 99999/100000)
    val got = laz.filter(col("x") === 999.0 && col("intensity") === 49999 % 65000)
      .count()
    assert(got >= 1)
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

  test("LASzip encoder roundtrips fuzzed records through every field path") {
    import graft.sources.Laszip
    val rnd = new java.util.Random(42)
    def mkRec(nExtra: Int, i: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(30 + nExtra)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // coordinates: mixture of small deltas, plateaus, and huge jumps
      val jump = if (rnd.nextInt(50) == 0) rnd.nextInt() else 0
      bb.putInt(i * 10 + rnd.nextInt(20) + jump)
      bb.putInt(i * 7 - rnd.nextInt(15))
      bb.putInt(if (rnd.nextInt(4) == 0) rnd.nextInt(1 << 20) else 500)
      bb.putShort((if (rnd.nextInt(3) == 0) rnd.nextInt(65536) else 100).toShort)
      val nr = rnd.nextInt(16)
      val r = rnd.nextInt(16)
      bb.put(((r & 0x0f) | (nr << 4)).toByte)
      val scanner = if (rnd.nextInt(6) == 0) rnd.nextInt(4) else 0
      bb.put(((rnd.nextInt(16)) | (scanner << 4) | (rnd.nextInt(2) << 6) |
        (rnd.nextInt(2) << 7)).toByte)
      bb.put(rnd.nextInt(256).toByte) // classification
      bb.put(rnd.nextInt(256).toByte) // user data
      bb.putShort((if (rnd.nextInt(5) == 0) rnd.nextInt(60000) - 30000 else 0).toShort)
      bb.putShort((if (rnd.nextInt(7) == 0) rnd.nextInt(65536) else 7).toShort)
      // gps: plateaus, steady increments, occasional full-64 jumps
      val gps = rnd.nextInt(4) match {
        case 0 => 0.0
        case 1 => i * 0.0001
        case 2 => 1e9 + rnd.nextDouble()
        case _ => i.toDouble
      }
      bb.putDouble(gps)
      (0 until nExtra).foreach(j => bb.put(
        (if (rnd.nextInt(3) == 0) rnd.nextInt(256) else j).toByte))
      bb.array()
    }
    for (nExtra <- Seq(0, 3); n <- Seq(1, 2, 700)) {
      val recs = (0 until n).map(i => mkRec(nExtra, i))
      val vlr = Laszip.LazVlr(3, 256, Seq(Laszip.Item(10, 30, 3)) ++
        (if (nExtra > 0) Seq(Laszip.Item(14, nExtra, 3)) else Nil))
      val enc = Laszip.encode(recs.iterator, 30 + nExtra, nExtra, 256)
      val dec = Laszip.decode(enc, 0, n, vlr, 30 + nExtra).toSeq
      assert(dec.length == n, s"nExtra=$nExtra n=$n length")
      recs.indices.foreach { i =>
        assert(java.util.Arrays.equals(dec(i), recs(i)),
          s"nExtra=$nExtra n=$n mismatch at record $i:\n" +
            s"  want ${recs(i).map(b => f"$b%02x").mkString}\n" +
            s"  got  ${dec(i).map(b => f"$b%02x").mkString}")
      }
      // chunk table round-trips too
      val table = Laszip.chunkTable(enc, 0).get
      assert(table.length == (n + 255) / 256)
    }
    // directed case: a 16-bit corrector of exactly -32768 (intensity
    // 0 -> 32768) exercises exponent k == corrBits, the widest bucket
    val pair = Seq(0, 32768, 0, 65535).zipWithIndex.map { case (inten, i) =>
      val bb = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(i).putInt(0).putInt(0)
      bb.putShort(inten.toShort)
      bb.put(0x11.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.putShort(0.toShort).putShort(0.toShort)
      bb.putDouble(0.0)
      bb.array()
    }
    val vlr1 = Laszip.LazVlr(3, 50000, Seq(Laszip.Item(10, 30, 3)))
    val enc1 = Laszip.encode(pair.iterator, 30, 0, 50000)
    val dec1 = Laszip.decode(enc1, 0, pair.length, vlr1, 30).toSeq
    pair.indices.foreach(i => assert(java.util.Arrays.equals(dec1(i), pair(i)),
      s"k==corrBits case mismatch at $i"))
  }

  test("multi-return pulse train with mid-stream pattern changes roundtrips bit-exact") {
    import graft.sources.Laszip
    // realistic LiDAR shape: pulses of 1..5 returns, return number walks
    // 1..n within each pulse, pattern (n,r) changes every record and the
    // pulse width itself changes mid-stream — exercises every X/Y median
    // context (returnMap) and Z context (returnLevel) plus the
    // changed-values return-number cases (+1 / -1 / other) repeatedly.
    val recs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var i = 0
    for (pulse <- 0 until 300) {
      val n = 1 + (pulse * 7 % 5) // 1..5, varies per pulse
      for (r <- 1 to n) {
        val bb = java.nio.ByteBuffer.allocate(30)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(pulse * 25 + r * 3)           // x drifts per pulse
        bb.putInt(1000 - pulse * 11 + r)        // y drifts opposite
        bb.putInt(5000 - r * 120)               // z: later returns lower
        bb.putShort((200 + r * 17).toShort)     // intensity per return
        bb.put(((r & 0x0f) | (n << 4)).toByte)  // return byte: (n, r)
        bb.put((if (r == 1) 0x40 else 0).toByte) // scan-direction on first
        bb.put((if (r == n) 2 else 1).toByte)   // class: ground on last
        bb.put(0.toByte)
        bb.putShort((pulse % 100 - 50).toShort) // scan angle sweeps
        bb.putShort(9.toShort)
        bb.putDouble(pulse * 0.0005)            // one gps time per pulse
        recs += bb.array()
        i += 1
      }
    }
    val vlr = Laszip.LazVlr(3, 256, Seq(Laszip.Item(10, 30, 3)))
    val enc = Laszip.encode(recs.iterator, 30, 0, 256)
    val dec = Laszip.decode(enc, 0, recs.length, vlr, 30).toSeq
    assert(dec.length == recs.length)
    recs.indices.foreach { j =>
      assert(java.util.Arrays.equals(dec(j), recs(j)),
        s"pulse-train mismatch at record $j")
    }
  }

  test("legacy pointwise LAZ (formats 0-3) roundtrips bit-exact") {
    import graft.sources.Laszip
    val rnd = new java.util.Random(11)
    // legacy record: POINT10 (+gps f64) (+rgb 3xu16) (+extra)
    def mk(i: Int, gps: Boolean, rgb: Boolean, nExtra: Int): Array[Byte] = {
      val len = 20 + (if (gps) 8 else 0) + (if (rgb) 6 else 0) + nExtra
      val bb = java.nio.ByteBuffer.allocate(len).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val jump = if (rnd.nextInt(40) == 0) rnd.nextInt() else 0
      bb.putInt(i * 12 + rnd.nextInt(25) + jump)
      bb.putInt(5000 - i * 9 + rnd.nextInt(10))
      bb.putInt(if (rnd.nextInt(5) == 0) rnd.nextInt(1 << 18) else 300)
      bb.putShort((if (rnd.nextInt(3) == 0) rnd.nextInt(65536) else 42).toShort)
      val r = 1 + rnd.nextInt(7); val n = math.max(r, 1 + rnd.nextInt(7))
      bb.put((r | (n << 3) | (rnd.nextInt(2) << 6) | (rnd.nextInt(2) << 7)).toByte)
      bb.put(rnd.nextInt(256).toByte)       // classification
      bb.put((rnd.nextInt(181) - 90).toByte) // scan angle rank
      bb.put(rnd.nextInt(256).toByte)       // user data
      bb.putShort((if (rnd.nextInt(6) == 0) rnd.nextInt(65536) else 9).toShort)
      if (gps) bb.putDouble(rnd.nextInt(4) match {
        case 0 => 0.0
        case 1 => i * 0.0001
        case 2 => 5e8 + rnd.nextDouble()
        case _ => i.toDouble
      })
      if (rgb) {
        // correlated channels with occasional jumps — the rgb12 paths
        val base = rnd.nextInt(65536)
        bb.putShort(base.toShort)
        bb.putShort((if (rnd.nextInt(3) == 0) base else rnd.nextInt(65536)).toShort)
        bb.putShort((if (rnd.nextInt(3) == 0) base else rnd.nextInt(65536)).toShort)
      }
      (0 until nExtra).foreach(j => bb.put(
        (if (rnd.nextInt(4) == 0) rnd.nextInt(256) else j * 3).toByte))
      bb.array()
    }
    for ((gps, rgb, nExtra) <- Seq((false, false, 0), (true, false, 0),
      (false, true, 0), (true, true, 4)); count <- Seq(1, 2, 600)) {
      val recLen = 20 + (if (gps) 8 else 0) + (if (rgb) 6 else 0) + nExtra
      val recs = (0 until count).map(i => mk(i, gps, rgb, nExtra))
      val items = Seq(Laszip.Item(6, 20, 2)) ++
        (if (gps) Seq(Laszip.Item(7, 8, 2)) else Nil) ++
        (if (rgb) Seq(Laszip.Item(8, 6, 2)) else Nil) ++
        (if (nExtra > 0) Seq(Laszip.Item(0, nExtra, 2)) else Nil)
      val vlr = Laszip.LazVlr(2, 256, items)
      val encoded = Laszip.encodePointwise(recs.iterator, recLen, gps, rgb,
        nExtra, 256)
      val dec = Laszip.decodePointwise(encoded, 0, count, vlr, recLen).toSeq
      assert(dec.length == count, s"gps=$gps rgb=$rgb n=$count length")
      recs.indices.foreach { i =>
        assert(java.util.Arrays.equals(dec(i), recs(i)),
          s"gps=$gps rgb=$rgb extra=$nExtra n=$count mismatch at $i:\n" +
            s"  want ${recs(i).map(b => f"$b%02x").mkString}\n" +
            s"  got  ${dec(i).map(b => f"$b%02x").mkString}")
      }
    }
  }

  test("DataFrame LAZ write → read roundtrip (format 6, quarter-step grid)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 5000).toDF("id")
      .select(
        (col("id") % 97).cast("double") * 0.25 as "x",
        (col("id") % 61).cast("double") * 0.5 as "y",
        (col("id") % 31).cast("double") * 0.25 as "z",
        (col("id") % 100) as "intensity",
        (col("id") % 32) as "classification",
        col("id").cast("double") * 1.5 as "gps_time")
    LasIO.writeFmt6(df.repartition(3), "/tmp/graft_laz_rt", scale = 0.25, compress = true)
    val back = LasIO.read(spark, "/tmp/graft_laz_rt")
      .select("x", "y", "z", "intensity", "classification", "gps_time")
    assert(back.count() == 5000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // uncompressed twin must read identically
    LasIO.writeFmt6(df.repartition(2), "/tmp/graft_las14_rt", scale = 0.25, compress = false)
    val plain = LasIO.read(spark, "/tmp/graft_las14_rt")
      .select("x", "y", "z", "intensity", "classification", "gps_time")
    assert(plain.exceptAll(df).isEmpty && df.exceptAll(plain).isEmpty)
  }

  test("RGB14/NIR v3 layers roundtrip fuzzed records (formats 7/8)") {
    import graft.sources.Laszip
    val rnd = new java.util.Random(1234)
    def mkRec(rgbBytes: Int, i: Int, mode: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(30 + rgbBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(i * 5 + rnd.nextInt(9))
      bb.putInt(i * 3)
      bb.putInt(100)
      bb.putShort(50.toShort)
      bb.put(0x11.toByte)
      // occasional scanner-channel switch exercises context seeding of
      // the per-context Rgb12/Nir14 states
      val scanner = if (rnd.nextInt(8) == 0) rnd.nextInt(4) else 0
      bb.put((scanner << 4).toByte)
      bb.put(0.toByte).put(0.toByte)
      bb.putShort(0.toShort).putShort(0.toShort)
      bb.putDouble(i * 0.001)
      // rgb modes: 0 constant (layer dropped), 1 gray (r==g==b, sym bit6
      // clear), 2 full-random (all six byte paths)
      val (r, g, b) = mode match {
        case 0 => (1000, 2000, 3000)
        case 1 => val v = rnd.nextInt(65536); (v, v, v)
        case _ => (rnd.nextInt(65536), rnd.nextInt(65536), rnd.nextInt(65536))
      }
      bb.putShort(r.toShort).putShort(g.toShort).putShort(b.toShort)
      if (rgbBytes == 8)
        bb.putShort((if (mode == 0) 4000 else rnd.nextInt(65536)).toShort)
      bb.array()
    }
    for (rgbBytes <- Seq(6, 8); mode <- Seq(0, 1, 2); n <- Seq(1, 2, 600)) {
      val recLen = 30 + rgbBytes
      val recs = (0 until n).map(i => mkRec(rgbBytes, i, mode))
      val item = if (rgbBytes == 8) Laszip.Item(12, 8, 3) else Laszip.Item(11, 6, 3)
      val vlr = Laszip.LazVlr(3, 256, Seq(Laszip.Item(10, 30, 3), item))
      val enc = Laszip.encode(recs.iterator, recLen, 0, 256, rgbBytes = rgbBytes)
      val dec = Laszip.decode(enc, 0, n, vlr, recLen).toSeq
      assert(dec.length == n)
      recs.indices.foreach { i =>
        assert(java.util.Arrays.equals(dec(i), recs(i)),
          s"rgbBytes=$rgbBytes mode=$mode n=$n mismatch at record $i:\n" +
            s"  want ${recs(i).map(b => f"$b%02x").mkString}\n" +
            s"  got  ${dec(i).map(b => f"$b%02x").mkString}")
      }
    }
  }

  test("DataFrame LAZ write → read roundtrip (formats 7/8 with RGB/NIR)") {
    import org.apache.spark.sql.functions._
    for (fmt <- Seq(7, 8)) {
      val picks = Seq(
        (col("id") % 89).cast("double") * 0.25 as "x",
        (col("id") % 53).cast("double") * 0.5 as "y",
        (col("id") % 29).cast("double") * 0.25 as "z",
        (col("id") % 100) as "intensity",
        col("id").cast("double") * 0.5 as "gps_time",
        (col("id") * 7 % 65536) as "red",
        (col("id") * 11 % 65536) as "green",
        (col("id") * 13 % 65536) as "blue") ++
        (if (fmt == 8) Seq((col("id") * 17 % 65536) as "nir") else Nil)
      val df = spark.range(0, 3000).toDF("id").select(picks: _*)
      val cols = df.columns.toSeq
      val path = s"/tmp/graft_laz_rgb_$fmt"
      LasIO.writeFmt6(df.repartition(2), path, scale = 0.25, compress = true)
      val back = LasIO.read(spark, path).select(cols.map(col): _*)
      assert(back.count() == 3000)
      assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    }
  }

  test("formats 7/8 read RGB(+NIR) columns from hand-built LAS 1.4 files") {
    import java.nio.{ByteBuffer, ByteOrder}
    def build(fmt: Int, n: Int): Array[Byte] = {
      val recLen = if (fmt == 8) 38 else 36
      val bb = ByteBuffer.allocate(375 + recLen * n).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LASF".getBytes("US-ASCII"))
      bb.position(24); bb.put(1.toByte).put(4.toByte)
      bb.position(94)
      bb.putShort(375.toShort)
      bb.putInt(375) // point data offset
      bb.putInt(0) // no VLRs
      bb.put(fmt.toByte)
      bb.putShort(recLen.toShort)
      bb.putInt(0) // legacy count 0 (1.4 style)
      bb.position(131)
      bb.putDouble(0.5).putDouble(0.5).putDouble(0.5) // scales
      bb.putDouble(0).putDouble(0).putDouble(0) // offsets
      bb.position(247)
      bb.putLong(n.toLong)
      bb.position(375)
      (0 until n).foreach { i =>
        bb.putInt(i).putInt(2 * i).putInt(3 * i)
        bb.putShort((i % 7).toShort)
        bb.put(0x11.toByte).put(0.toByte)
        bb.put((i % 5).toByte).put(0.toByte)
        bb.putShort(0.toShort).putShort(0.toShort)
        bb.putDouble(i * 0.5)
        bb.putShort((i * 10).toShort).putShort((i * 20).toShort).putShort((i * 30).toShort)
        if (fmt == 8) bb.putShort((i * 40).toShort)
      }
      bb.array()
    }
    for (fmt <- Seq(7, 8)) {
      val f = s"/tmp/graft_fmt$fmt.las"
      java.nio.file.Files.write(java.nio.file.Paths.get(f), build(fmt, 100))
      val df = LasIO.read(spark, f)
      assert(df.columns.contains("red") && df.columns.contains("blue"))
      assert(df.columns.contains("nir") == (fmt == 8))
      assert(df.count() == 100)
      val r = df.orderBy("x").collect()(3)
      val s = df.schema
      assert(r.getDouble(s.fieldIndex("x")) == 1.5) // raw 3 * scale 0.5
      assert(r.getLong(s.fieldIndex("red")) == 30L)
      assert(r.getLong(s.fieldIndex("green")) == 60L)
      assert(r.getLong(s.fieldIndex("blue")) == 90L)
      if (fmt == 8) assert(r.getLong(s.fieldIndex("nir")) == 120L)
      assert(r.getDouble(s.fieldIndex("gps_time")) == 1.5)
    }
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
