package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.RasterModel
import graft.functions.RasterModel.{Band, Raster}
import graft.sources.{NetCdf, RasterLoaders}

/** NetCDF classic source: CDF-2 writer/reader roundtrips, hand-built
  * CDF-1 fixtures (record dimension, CF coordinate variables, non-double
  * types), windowed out-db reads with fetch accounting. */
class NetCdfSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
  }

  override def afterAll(): Unit = spark.stop()

  private def makeRaster(w: Int, h: Int, nb: Int, nodata: Double = Double.NaN): Raster = {
    val bands = (1 to nb).map { b =>
      val vals = Array.tabulate(w * h)(i => b * 100000.0 + (i / w) * 1000.0 + (i % w))
      Band(nodata, RasterModel.packDoubles(vals))
    }
    Raster("EPSG:32610", Array(500000.0, 10.0, 0.0, 4650000.0, 0.0, -10.0), w, h, bands)
  }

  private def pixels(r: Raster, b: Int): IndexedSeq[Double] =
    for (row <- 0 until r.height; c <- 0 until r.width)
      yield r.value(b, c, row) match { case null => Double.NaN; case v => v.doubleValue }

  private def fetchOf(bytes: Array[Byte]): (Long, Int) => Array[Byte] =
    (off, n) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)

  test("CDF-2 writer roundtrips: 2D multiband, nodata, transform/crs attributes") {
    val r = makeRaster(37, 23, 3, nodata = -9999.0)
    val bytes = NetCdf.write(r)
    assert(bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F' && bytes(3) == 2)
    val back = NetCdf.read(bytes)
    assert(back.width == 37 && back.height == 23 && back.bands.length == 3)
    assert(back.gt.toSeq == r.gt.toSeq && back.crs == "EPSG:32610")
    for (b <- 1 to 3) {
      assert(back.bands(b - 1).nodata == -9999.0)
      assert(pixels(back, b) == pixels(r, b), s"band $b")
    }
  }

  test("CDF-5 writer roundtrips; 64-bit NON_NEG header fields; windowed reads") {
    val r = makeRaster(37, 23, 3, nodata = -9999.0)
    val bytes = NetCdf.write(r, version = 5)
    assert(bytes(0) == 'C' && bytes(1) == 'D' && bytes(2) == 'F' && bytes(3) == 5)
    val back = NetCdf.read(bytes)
    assert(back.width == 37 && back.height == 23 && back.bands.length == 3)
    assert(back.gt.toSeq == r.gt.toSeq && back.crs == "EPSG:32610")
    for (b <- 1 to 3) {
      assert(back.bands(b - 1).nodata == -9999.0)
      assert(pixels(back, b) == pixels(r, b), s"band $b")
    }
    // windowed read path on the 64-bit header
    val win = NetCdf.readWindow(fetchOf(bytes), bytes.length.toLong, 5, 3, 12, 8)
    for (b <- 1 to 3; row <- 0 until 8; c <- 0 until 12)
      assert(win.value(b, c, row) == back.value(b, 5 + c, 3 + row),
        s"cdf-5 window band $b ($c, $row)")
  }

  test("CDF-5 unsigned/64-bit types decode (hand-built NC_UINT fixture)") {
    // minimal CDF-5 file: dims y=2 x=3, one NC_UINT variable with a value
    // above Int.MaxValue to prove the unsigned read
    val vals = Array(1L, 2L, 3L, 4L, 5L, 0xFFFFFFF0L)
    val bb = ByteBuffer.allocate(512).order(ByteOrder.BIG_ENDIAN)
    bb.put("CDF".getBytes("US-ASCII")).put(5.toByte)
    bb.putLong(0L) // numrecs
    bb.putInt(0x0A); bb.putLong(2L) // dim list
    bb.putLong(1L).put("y".getBytes).put(Array.fill(3)(0.toByte)).putLong(2L)
    bb.putLong(1L).put("x".getBytes).put(Array.fill(3)(0.toByte)).putLong(3L)
    bb.putInt(0); bb.putLong(0L) // no global atts
    bb.putInt(0x0B); bb.putLong(1L) // var list
    bb.putLong(1L).put("b".getBytes).put(Array.fill(3)(0.toByte)) // name
    bb.putLong(2L).putLong(0L).putLong(1L) // ndims, dimids
    bb.putInt(0); bb.putLong(0L) // no var atts
    bb.putInt(9) // NC_UINT
    bb.putLong(24L) // vsize
    val headerSize = bb.position() + 8 // + begin field
    bb.putLong(headerSize.toLong) // begin
    vals.foreach(v => bb.putInt(v.toInt))
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    val back = NetCdf.read(bytes)
    assert(back.width == 3 && back.height == 2)
    assert(back.bands.head.ptype == "UNSIGNED_32BITS")
    assert(pixels(back, 1) == vals.map(_.toDouble).toIndexedSeq,
      "NC_UINT values incl. one above Int.MaxValue")
  }

  test("N-D band (time,y,x) roundtrips and slices") {
    val T = 3; val H = 4; val W = 5
    val vals = Array.tabulate(T * H * W)(i => i * 2.0)
    val band = Band(Double.NaN, RasterModel.packDoubles(vals),
      dims = Vector("time", "y", "x"), shape = Vector(T.toLong, H.toLong, W.toLong))
    val r = Raster("EPSG:4326", Array(10.0, 0.5, 0.0, 50.0, 0.0, -0.5), W, H, Vector(band))
    val back = NetCdf.read(NetCdf.write(r))
    assert(back.bands.head.dims == Vector("time", "y", "x"))
    assert(back.bands.head.shape == Vector(T.toLong, H.toLong, W.toLong))
    val in = ByteBuffer.wrap(back.bands.head.data).order(ByteOrder.LITTLE_ENDIAN)
    for (i <- 0 until T * H * W) assert(in.getDouble(i * 8) == i * 2.0)
  }

  /** Hand-built CDF-1 file: record dim `time` (2 records), dims y=3 x=4,
    * a record variable `temp`(time,y,x) of NC_SHORT with _FillValue, and
    * CF coordinate variables x/y (NC_FLOAT) — exercises v1 32-bit begins,
    * record interleaving, non-double decode, and CF georeferencing. */
  private def cdf1Fixture(): Array[Byte] = {
    val H = 3; val W = 4; val T = 2
    val bb = ByteBuffer.allocate(4096).order(ByteOrder.BIG_ENDIAN)
    def name(s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      bb.putInt(b.length); bb.put(b)
      var p = b.length; while ((p & 3) != 0) { bb.put(0.toByte); p += 1 }
    }
    bb.put("CDF".getBytes("US-ASCII")).put(1.toByte)
    bb.putInt(T) // numrecs
    bb.putInt(0x0A); bb.putInt(3)
    name("time"); bb.putInt(0) // record dim
    name("y"); bb.putInt(H)
    name("x"); bb.putInt(W)
    bb.putInt(0); bb.putInt(0) // no global atts
    bb.putInt(0x0B); bb.putInt(3)
    // var x: NC_FLOAT[x], coord values 100,110,120,130 (centers, dx=10)
    // var y: NC_FLOAT[y], coord values 55,45,35 (centers, dy=-10)
    // var temp: NC_SHORT[time,y,x], _FillValue=-1
    // layout after header: x data (16B), y data (12B), records
    // header size: compute by patching begins after serialization — here
    // sizes are small and deterministic, so precompute:
    //   fixed part so far + 3 var entries
    // var entry size (v1): name + 4 + 4*nd + atts + 4 + 4 + 4
    // xVar: name("x")=8, nd=1 -> 8+4+4+(8 no atts)+12 = 36
    // Instead of hand-arithmetic, serialize entries with placeholder
    // begins, then patch (positions recorded).
    var beginSlots = List.empty[Int]
    def varEntry(nm: String, dimids: Seq[Int], atts: () => Unit, typ: Int,
        vsize: Int): Unit = {
      name(nm)
      bb.putInt(dimids.length); dimids.foreach(bb.putInt)
      atts()
      bb.putInt(typ); bb.putInt(vsize)
      beginSlots = beginSlots :+ bb.position()
      bb.putInt(0) // begin placeholder
    }
    def noAtts(): Unit = { bb.putInt(0); bb.putInt(0) }
    varEntry("x", Seq(2), noAtts _, 5, W * 4)
    varEntry("y", Seq(1), noAtts _, 5, H * 4)
    varEntry("temp", Seq(0, 1, 2), { () =>
      bb.putInt(0x0C); bb.putInt(1)
      name("_FillValue"); bb.putInt(3); bb.putInt(1)
      bb.putShort((-1).toShort); bb.putShort(0) // value + pad to 4
    }, 3, ((H * W * 2 + 3) & ~3))
    val headerEnd = bb.position()
    // data: x, y fixed; then records
    val xBegin = headerEnd
    for (i <- 0 until W) bb.putFloat(100.0f + 10.0f * i)
    val yBegin = bb.position()
    for (i <- 0 until H) bb.putFloat(55.0f - 10.0f * i)
    val tempBegin = bb.position()
    for (t <- 0 until T; i <- 0 until H * W) bb.putShort((t * 100 + i).toShort)
    // patch begins
    val begins = Seq(xBegin, yBegin, tempBegin)
    beginSlots.zip(begins).foreach { case (slot, off) => bb.putInt(slot, off) }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  test("CDF-1 fixture: record variable, NC_SHORT decode, CF coordinate georef") {
    val bytes = cdf1Fixture()
    val r = NetCdf.read(bytes)
    assert(r.width == 4 && r.height == 3 && r.bands.length == 1)
    // CF georef: x centers start at 100 step 10 -> ulx 95; y 55 step -10 -> uly 60
    assert(r.gt.toSeq == Seq(95.0, 10.0, 0.0, 60.0, 0.0, -10.0))
    val b = r.bands.head
    assert(b.dims == Vector("time", "y", "x"))
    assert(b.shape == Vector(2L, 3L, 4L))
    assert(b.nodata == -1.0)
    assert(b.ptype == "SIGNED_16BITS")
    val in = ByteBuffer.wrap(b.data).order(ByteOrder.LITTLE_ENDIAN)
    for (t <- 0 until 2; i <- 0 until 12)
      assert(in.getDouble((t * 12 + i) * 8) == t * 100.0 + i)
    // meta is header-bounded and agrees
    val meta = NetCdf.readMeta(fetchOf(bytes), bytes.length.toLong)
    assert(meta.width == 4 && meta.height == 3 && meta.bands.isEmpty)
    assert(meta.gt.toSeq == r.gt.toSeq)
    // windowed read of the record variable: window (1,1) 2x2
    val win = NetCdf.readWindow(fetchOf(bytes), bytes.length.toLong, 1, 1, 2, 2)
    assert(win.width == 2 && win.height == 2)
    val wd = ByteBuffer.wrap(win.bands.head.data).order(ByteOrder.LITTLE_ENDIAN)
    // plane t: rows 1..2, cols 1..2 of t*100 + (row*4+col)
    val expect = for (t <- 0 until 2; row <- 1 to 2; c <- 1 to 2)
      yield t * 100.0 + row * 4 + c
    for (i <- expect.indices) assert(wd.getDouble(i * 8) == expect(i), s"i=$i")
    assert(win.gt(0) == 95.0 + 10.0 && win.gt(3) == 60.0 - 10.0)
  }

  test("readWindow == crop of full decode; out-db rs_value fetches O(window) bytes") {
    val r = makeRaster(256, 128, 2)
    val bytes = NetCdf.write(r)
    for ((x, y, w, h) <- Seq((0, 0, 256, 128), (10, 20, 30, 40), (255, 127, 1, 1),
        (0, 5, 256, 3))) {
      val win = NetCdf.readWindow(fetchOf(bytes), bytes.length.toLong, x, y, w, h)
      for (b <- 1 to 2; row <- 0 until h; c <- 0 until w)
        assert(win.value(b, c, row) == r.value(b, x + c, y + row),
          s"($x,$y ${w}x$h) b$b ($c,$row)")
    }
    // out-db: a point sample through rs_frompath reads a small fraction.
    // netCDF is row-contiguous, so the 256px block window widens to a
    // FULL-WIDTH row band (one coalesced range per plane, neighboring
    // column blocks share the cached band) — the fetched bytes are one
    // 256-row band of the scene, well under the file, and the fetch-call
    // count proves the coalescing (no per-row range loop).
    val big = makeRaster(1024, 1024, 2)
    val bigBytes = NetCdf.write(big)
    val dir = new java.io.File("/tmp/graft_netcdf_spec"); dir.mkdirs()
    val f = new java.io.File(dir, "scene.nc")
    val os = new java.io.FileOutputStream(f); os.write(bigBytes); os.close()
    RasterLoaders.resetCounters()
    val v = spark.sql(
      s"""SELECT rs_value(rs_frompath('${f.getAbsolutePath}'),
         |  st_point(${500000.0 + 70 * 10 + 5}, ${4650000.0 - 80 * 10 - 5},
         |    'EPSG:32610'), 1) v""".stripMargin).collect()(0).getDouble(0)
    assert(v == 100000.0 + 80 * 1000 + 70)
    val fetched = RasterLoaders.fetchBytes.sum()
    assert(RasterLoaders.fullDecodes.sum() == 0, "point sample must not full-decode")
    assert(fetched < bigBytes.length / 3,
      s"windowed netcdf read fetched $fetched of ${bigBytes.length} bytes")
    assert(RasterLoaders.fetchCalls.sum() < 10,
      s"band read must coalesce per-row ranges, made ${RasterLoaders.fetchCalls.sum()} fetches")
  }

  test("seeded fuzz: CDF-2 write/read roundtrips across shapes, N-D, nodata, windows") {
    val rnd = new scala.util.Random(0xC0FFEE)
    for (it <- 0 until 25) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val lead = rnd.nextInt(3) // 0 = 2D, else N-D leading dim of this length+1
      val nb = 1 + rnd.nextInt(3)
      val nodata = if (rnd.nextBoolean()) Double.NaN else rnd.nextInt(1000).toDouble
      val n = (lead + 1) * w * h
      val bands = (0 until nb).map { b =>
        val vals = Array.fill(n)((rnd.nextInt(2000000) - 1000000).toDouble)
        if (lead == 0) Band(nodata, RasterModel.packDoubles(vals))
        else Band(nodata, RasterModel.packDoubles(vals),
          dims = Vector("t", "y", "x"),
          shape = Vector((lead + 1).toLong, h.toLong, w.toLong))
      }
      val gt = Array(rnd.nextInt(1000).toDouble, 1 + rnd.nextInt(10).toDouble, 0.0,
        rnd.nextInt(1000).toDouble, 0.0, -(1 + rnd.nextInt(10)).toDouble)
      val crs = if (rnd.nextBoolean()) s"EPSG:${32600 + rnd.nextInt(60)}" else null
      val r = Raster(crs, gt, w, h, bands)
      val bytes = NetCdf.write(r)
      val back = NetCdf.read(bytes)
      assert(back.width == w && back.height == h && back.bands.length == nb, s"it=$it")
      assert(back.gt.toSeq == gt.toSeq, s"it=$it")
      assert(back.crs == crs, s"it=$it")
      for (b <- 0 until nb) {
        assert(java.util.Arrays.equals(back.bands(b).data, bands(b).data), s"it=$it b=$b")
        assert(back.bands(b).nodata == nodata ||
          (back.bands(b).nodata.isNaN && nodata.isNaN), s"it=$it b=$b")
      }
      // one random window == crop
      val x0 = rnd.nextInt(w); val y0 = rnd.nextInt(h)
      val ww = 1 + rnd.nextInt(w - x0); val wh = 1 + rnd.nextInt(h - y0)
      val win = NetCdf.readWindow(fetchOf(bytes), bytes.length.toLong, x0, y0, ww, wh)
      val full = ByteBuffer.wrap(bands(0).data).order(ByteOrder.LITTLE_ENDIAN)
      val wd = ByteBuffer.wrap(win.bands(0).data).order(ByteOrder.LITTLE_ENDIAN)
      for (p <- 0 to lead; row <- 0 until wh; c <- 0 until ww) {
        val got = wd.getDouble(((p * wh + row) * ww + c) * 8)
        val exp = full.getDouble(((p * h + y0 + row) * w + x0 + c) * 8)
        assert(got == exp, s"it=$it p=$p ($c,$row)")
      }
    }
  }

  test("rs_fromgdalraster sniffs netCDF bytes; rs_asnetcdf roundtrips through it") {
    val r = makeRaster(8, 6, 1)
    val bytes = NetCdf.write(r)
    val df = spark.createDataFrame(Seq(Tuple1(bytes))).toDF("b")
    df.createOrReplaceTempView("ncbytes")
    val row = spark.sql(
      """SELECT rs_width(rs_fromgdalraster(b)) w, rs_height(rs_fromgdalraster(b)) h,
        |  rs_value(rs_fromgdalraster(b), 1, 3, 2) v FROM ncbytes""".stripMargin)
      .collect()(0)
    assert(row.getInt(0) == 8 && row.getInt(1) == 6)
    assert(row.getDouble(2) == 100000.0 + 2 * 1000 + 3)
    // SQL-level writer: rs_asnetcdf(raster) -> CDF bytes -> sniffed back
    val rt = spark.sql(
      """SELECT rs_value(rs_fromgdalraster(rs_asnetcdf(rs_fromgdalraster(b))),
        |  1, 5, 4) v, length(rs_asnetcdf(rs_fromgdalraster(b))) n FROM ncbytes"""
        .stripMargin).collect()(0)
    assert(rt.getDouble(0) == 100000.0 + 4 * 1000 + 5)
    assert(rt.getInt(1) == bytes.length)
  }
}
