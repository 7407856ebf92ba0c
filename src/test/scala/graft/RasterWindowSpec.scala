package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.RasterModel
import graft.functions.RasterModel.{Band, Raster}
import graft.sources.{GeoTiff, RasterLoaders}

/** Windowed out-db raster reads: the scale path for rasters larger than
  * memory. Pins (a) tiled-writer/reader roundtrips, (b) readWindow ==
  * crop-of-full-decode for every window shape, and (c) the fetch
  * accounting that proves a point sample reads a small fraction of the
  * file — the engine-side analog of the reference's lazy out-db band
  * fetch (rust/sedona-schema/src/raster.rs + async RS_EnsureLoaded). */
class RasterWindowSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  /** Deterministic multi-band raster: v(b, row, col) = b*100000 + row*1000 + col. */
  private def makeRaster(w: Int, h: Int, nb: Int, nodata: Double = Double.NaN,
      crs: String = "EPSG:32610"): Raster = {
    val bands = (1 to nb).map { b =>
      val vals = Array.tabulate(w * h)(i => b * 100000.0 + (i / w) * 1000.0 + (i % w))
      Band(nodata, RasterModel.packDoubles(vals))
    }
    // 10m pixels anchored at (500000, 4650000), north-up
    Raster(crs, Array(500000.0, 10.0, 0.0, 4650000.0, 0.0, -10.0), w, h, bands)
  }

  private def pixels(r: Raster, b: Int): IndexedSeq[Double] =
    for (row <- 0 until r.height; c <- 0 until r.width)
      yield r.value(b, c, row) match { case null => Double.NaN; case v => v.doubleValue }

  test("tiled writer roundtrips through the full reader (none/deflate/LZW, edge tiles)") {
    val r = makeRaster(150, 90, 2) // 150x90 with 64x64 tiles -> ragged edges
    for (code <- Seq(1, 8, 5, 32773)) {
      val bytes = GeoTiff.writeTiled(r, 64, 64, code)
      val back = GeoTiff.read(bytes)
      assert(back.width == 150 && back.height == 90 && back.bands.length == 2, s"code $code")
      for (b <- 1 to 2)
        assert(pixels(back, b) == pixels(r, b), s"code $code band $b")
      assert(back.gt.toSeq == r.gt.toSeq && back.crs == r.crs)
    }
  }

  test("BigTIFF write: magic 43, LONG8 chunk tables, full + windowed + COG reads") {
    def fetchOf(bytes: Array[Byte]): (Long, Int) => Array[Byte] =
      (off, n) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    val r = makeRaster(150, 90, 2)
    for (code <- Seq(1, 8, 5, 32773)) {
      val bytes = GeoTiff.writeTiled(r, 64, 64, code, bigTiff = true)
      // header shape: II, 43, offset size 8, first IFD at 16
      assert(bytes(2) == 43 && bytes(3) == 0, s"code $code: not BigTIFF")
      assert(bytes(4) == 8 && bytes(6) == 0)
      val back = GeoTiff.read(bytes)
      assert(back.width == 150 && back.height == 90 && back.bands.length == 2)
      for (b <- 1 to 2)
        assert(pixels(back, b) == pixels(r, b), s"bigtiff code $code band $b")
      assert(back.gt.toSeq == r.gt.toSeq && back.crs == r.crs)
      // windowed read path (the out-db fetch parser speaks BigTIFF too)
      val win = GeoTiff.readWindow(fetchOf(bytes), 30, 20, 70, 50)
      for (b <- 1 to 2; row <- 0 until 50; c <- 0 until 70)
        assert(win.value(b, c, row) == back.value(b, 30 + c, 20 + row),
          s"window mismatch at band $b ($c, $row)")
    }
    // striped BigTIFF (single chunk per band: the inline-LONG8 path)
    val striped = GeoTiff.writeCompressed(r, 8, bigTiff = true)
    val sb = GeoTiff.read(striped)
    for (b <- 1 to 2) assert(pixels(sb, b) == pixels(r, b), s"striped band $b")
    // BigTIFF COG: overview chain through 8-byte next-IFD pointers
    val cog = GeoTiff.writeCog(r, 64, 64, Seq(2, 4), 8, bigTiff = true)
    assert(cog(2) == 43)
    val ovs = GeoTiff.overviews(fetchOf(cog))
    assert(ovs.map(o => (o._2, o._3)) == IndexedSeq((75, 45), (38, 23)),
      s"overview dims: $ovs")
    val lvl1 = GeoTiff.readWindow(fetchOf(cog), 0, 0, 75, 45, ifdAt = ovs.head._1)
    assert(lvl1.width == 75 && lvl1.height == 45)
    val fullCog = GeoTiff.read(cog)
    for (b <- 1 to 2) assert(pixels(fullCog, b) == pixels(r, b))
  }

  test("readWindow == crop of full decode, tiled and striped, all window shapes") {
    val r = makeRaster(150, 90, 2)
    val tiled = GeoTiff.writeTiled(r, 64, 64, 8)
    val striped = GeoTiff.write(r, deflate = true)
    def fetchOf(bytes: Array[Byte]): (Long, Int) => Array[Byte] =
      (off, n) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    val windows = Seq(
      (0, 0, 150, 90),      // full
      (0, 0, 64, 64),       // exactly tile 0
      (64, 64, 86, 26),     // ragged bottom-right corner
      (10, 20, 100, 50),    // interior spanning 4 tiles
      (149, 89, 1, 1),      // last pixel
      (63, 63, 2, 2))       // 2x2 across a 4-tile corner
    for ((bytes, label) <- Seq((tiled, "tiled"), (striped, "striped"));
         (x, y, w, h) <- windows) {
      val win = GeoTiff.readWindow(fetchOf(bytes), x, y, w, h)
      assert(win.width == w && win.height == h, s"$label ($x,$y ${w}x$h)")
      for (b <- 1 to 2; row <- 0 until h; c <- 0 until w) {
        val expect = r.value(b, x + c, y + row)
        assert(win.value(b, c, row) == expect,
          s"$label ($x,$y ${w}x$h) band $b pixel ($c,$row)")
      }
      // world coordinates of window pixels match the full image
      assert(win.worldX(0, 0) == r.worldX(x, y) && win.worldY(0, 0) == r.worldY(x, y),
        s"$label ($x,$y) gt translation")
    }
  }

  test("point sample over an out-db tiled scene fetches a small fraction of the file") {
    val r = makeRaster(1024, 768, 1)
    val bytes = GeoTiff.writeTiled(r, 64, 64, 1) // uncompressed: size known
    val dir = new java.io.File("/tmp/graft_window_spec"); dir.mkdirs()
    val f = new java.io.File(dir, "scene.tif")
    val out = new java.io.FileOutputStream(f)
    out.write(bytes); out.close()
    val path = f.getAbsolutePath

    RasterLoaders.resetCounters()
    // world coords of pixel (700, 500): aligned block is (512..1023, 256..511)
    val x = 500000.0 + 700 * 10.0 + 5.0
    val y = 4650000.0 - 500 * 10.0 - 5.0
    val v = spark.sql(
      s"SELECT rs_value(rs_frompath('$path'), st_point($x, $y, 'EPSG:32610'), 1) v")
      .collect()(0).getDouble(0)
    assert(v == 100000.0 + 500 * 1000.0 + 700)
    val bytesAfterFirst = RasterLoaders.fetchBytes.sum()
    // the 256-aligned block is 512x256 pixels = 1/6 of the scene; header
    // reads add a few KB. The whole file is ~6.3 MB.
    assert(bytesAfterFirst < bytes.length / 4,
      s"windowed read fetched $bytesAfterFirst of ${bytes.length} bytes")
    assert(RasterLoaders.fullDecodes.sum() == 0, "no full decode on the window path")

    // a second point in the SAME block: served from the executor cache,
    // no new data fetch beyond the header stat
    val before = RasterLoaders.fetchBytes.sum()
    val v2 = spark.sql(
      s"SELECT rs_value(rs_frompath('$path'), st_point(${x + 10.0}, $y, 'EPSG:32610'), 1) v")
      .collect()(0).getDouble(0)
    assert(v2 == 100000.0 + 500 * 1000.0 + 701)
    assert(RasterLoaders.fetchBytes.sum() == before,
      "second sample in the same block must hit the cache")

    // out-of-bounds sample: header-only, still no new fetch
    val v3 = spark.sql(
      s"SELECT rs_value(rs_frompath('$path'), st_point(400000.0, $y, 'EPSG:32610'), 1) v")
      .collect()(0)
    assert(v3.isNullAt(0))
    assert(RasterLoaders.fetchBytes.sum() == before, "out-of-bounds fetches nothing")
  }

  test("strip geotiff point probe reads one row band, not the image; tiled stays on blocks") {
    // the default writer emits ONE strip covering the whole image: the
    // row-range sub-fetch + per-file layout probe must keep a point
    // probe at O(band rows), and correctness must match the full decode
    val r = makeRaster(1024, 768, 1)
    val bytes = GeoTiff.write(r) // single uncompressed strip
    val dir = new java.io.File("/tmp/graft_window_spec"); dir.mkdirs()
    val f = new java.io.File(dir, "strip_scene.tif")
    val out = new java.io.FileOutputStream(f)
    out.write(bytes); out.close()
    RasterLoaders.resetCounters()
    val x = 500000.0 + 700 * 10.0 + 5.0
    val y = 4650000.0 - 500 * 10.0 - 5.0
    val v = spark.sql(
      s"SELECT rs_value(rs_frompath('${f.getAbsolutePath}'), st_point($x, $y, 'EPSG:32610'), 1) v")
      .collect()(0).getDouble(0)
    assert(v == 100000.0 + 500 * 1000.0 + 700)
    val fetched = RasterLoaders.fetchBytes.sum()
    // one full-width 256-row band of doubles = 1024*256*8 = 2 MB of a
    // 6.3 MB file; tag/header reads add a few KB
    assert(fetched < bytes.length / 2,
      s"strip probe fetched $fetched of ${bytes.length} bytes")
    assert(fetched >= 1024L * 256 * 8,
      "band read must cover the full-width row band")
    assert(RasterLoaders.fullDecodes.sum() == 0)
    // a probe in a DIFFERENT column block of the same rows: band cached
    val before = RasterLoaders.fetchBytes.sum()
    val x2 = 500000.0 + 100 * 10.0 + 5.0
    val v2 = spark.sql(
      s"SELECT rs_value(rs_frompath('${f.getAbsolutePath}'), st_point($x2, $y, 'EPSG:32610'), 1) v")
      .collect()(0).getDouble(0)
    assert(v2 == 100000.0 + 500 * 1000.0 + 100)
    assert(RasterLoaders.fetchBytes.sum() == before,
      "different column block of the same rows must hit the cached band")
    // a TILED file must not widen: fetched bytes stay near one block
    val tiled = new java.io.File(dir, "tiled_scene2.tif")
    val out2 = new java.io.FileOutputStream(tiled)
    out2.write(GeoTiff.writeTiled(r, 64, 64, 1)); out2.close()
    RasterLoaders.resetCounters()
    spark.sql(
      s"SELECT rs_value(rs_frompath('${tiled.getAbsolutePath}'), st_point($x, $y, 'EPSG:32610'), 1) v")
      .collect()
    assert(RasterLoaders.fetchBytes.sum() < 1024L * 256 * 8,
      "tiled file must stay on the block-window path")
  }

  test("out-db zonal stats match the in-db decode and fetch only the roi's blocks") {
    val r = makeRaster(1024, 768, 1)
    val bytes = GeoTiff.writeTiled(r, 64, 64, 8)
    val dir = new java.io.File("/tmp/graft_window_spec"); dir.mkdirs()
    val f = new java.io.File(dir, "scene_deflate.tif")
    val out = new java.io.FileOutputStream(f)
    out.write(bytes); out.close()
    val path = f.getAbsolutePath
    // roi: a rectangle over pixels [100..139] x [200..229] (half-pixel
    // inset so no boundary passes through a pixel center)
    val x0 = 500000.0 + 100 * 10.0 + 1.0; val x1 = 500000.0 + 140 * 10.0 - 1.0
    val y0 = 4650000.0 - 230 * 10.0 + 1.0; val y1 = 4650000.0 - 200 * 10.0 - 1.0
    val roi = s"st_setsrid(st_makeenvelope($x0, $y0, $x1, $y1), 32610)"
    RasterLoaders.resetCounters()
    val outdb = spark.sql(
      s"SELECT rs_zonalstatsall(rs_frompath('$path'), $roi, 1) s").collect()(0).getStruct(0)
    assert(RasterLoaders.fullDecodes.sum() == 0, "zonal must use the window path")
    val indb = spark.sql(
      s"SELECT rs_zonalstatsall(rs_ensureloaded(rs_frompath('$path')), $roi, 1) s")
      .collect()(0).getStruct(0)
    assert(outdb == indb, s"out-db $outdb vs in-db $indb")
    // sanity: count = 40x30 pixels, mean = band formula at the roi center
    assert(outdb.getLong(0) == 40L * 30L)
  }

  test("zarr out-db: windowed chunk reads, absent chunks are fill, header-only meta") {
    val dir = new java.io.File("/tmp/graft_window_spec/cube.zarr")
    if (dir.isDirectory) dir.listFiles().foreach(_.delete())
    dir.mkdirs()
    def wr(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, bytes)
    // 256x192, 64px chunks, RAW (no compressor); chunk (1,2) absent
    wr(".zarray",
      """{"zarr_format": 2, "shape": [192, 256], "chunks": [64, 64],
        | "dtype": "<f8", "compressor": null, "fill_value": -1.0,
        | "order": "C", "filters": null}""".stripMargin.getBytes("UTF-8"))
    wr(".zattrs",
      """{"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0], "crs": "EPSG:32610"}"""
        .getBytes("UTF-8"))
    for (cy <- 0 until 3; cx <- 0 until 4; if !(cy == 1 && cx == 2)) {
      val bb = java.nio.ByteBuffer.allocate(64 * 64 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until 64; c <- 0 until 64)
        bb.putDouble(((cy * 64 + r) * 1000 + (cx * 64 + c)).toDouble)
      wr(s"$cy.$cx", bb.array())
    }
    val path = dir.getAbsolutePath
    // header-only metadata
    val meta = RasterLoaders.readMeta(path)
    assert(meta.width == 256 && meta.height == 192 && meta.crs == "EPSG:32610")
    // windowed read across a present/absent chunk boundary:
    // cols 120..199 x rows 100..139 spans chunks (1,1),(1,2),(1,3) —
    // (1,2) is absent, so cols 128..191 there read as fill -1
    RasterLoaders.resetCounters()
    val win = RasterLoaders.window(path, 120, 100, 80, 40)
    def at(gc: Int, gr: Int): Double = {
      val (fc, fr) = win.rasterCoord(gc + 0.5, -(gr + 0.5))
      val v = win.value(1, math.floor(fc).toInt, math.floor(fr).toInt)
      if (v == null) Double.NaN else v.doubleValue
    }
    assert(at(120, 100) == 100 * 1000 + 120)
    assert(at(199, 139) == 139 * 1000 + 199)
    assert(at(150, 120).isNaN, "absent chunk pixel must be fill (fill==nodata -> null)")
    // fetch accounting: the aligned window covers chunk rows 0..2, chunk
    // cols 0..3 at 256-alignment... the whole array here is 256 wide so
    // alignment covers it; still strictly less than sum of all chunk
    // bytes when one chunk is absent
    assert(RasterLoaders.fetchBytes.sum() < 12L * 64 * 64 * 8,
      s"fetched ${RasterLoaders.fetchBytes.sum()} bytes")
    // SQL path: point sample in a present chunk via rs_frompath
    val v = spark.sql(
      s"SELECT rs_value(rs_frompath('$path'), st_point(70.5, -80.5, 'EPSG:32610'), 1) v")
      .collect()(0).getDouble(0)
    assert(v == 80 * 1000 + 70)
  }

  test("zarr V3 out-db: zarr.json meta, c/y/x chunks, absent-chunk fill, SQL path") {
    val dir = new java.io.File("/tmp/graft_window_spec/cube_v3.zarr")
    if (dir.isDirectory) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    dir.mkdirs()
    java.nio.file.Files.write(new java.io.File(dir, "zarr.json").toPath,
      """{"zarr_format": 3, "node_type": "array", "shape": [192, 256],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [64, 64]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": -1.0,
        | "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        | "attributes": {"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
        |   "crs": "EPSG:32610"}}""".stripMargin.getBytes("UTF-8"))
    for (cy <- 0 until 3; cx <- 0 until 4; if !(cy == 1 && cx == 2)) {
      val bb = java.nio.ByteBuffer.allocate(64 * 64 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until 64; c <- 0 until 64)
        bb.putDouble(((cy * 64 + r) * 1000 + (cx * 64 + c)).toDouble)
      val f = new java.io.File(dir, s"c/$cy/$cx")
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, bb.array())
    }
    val path = dir.getAbsolutePath
    val meta = RasterLoaders.readMeta(path)
    assert(meta.width == 256 && meta.height == 192 && meta.crs == "EPSG:32610")
    val win = RasterLoaders.window(path, 120, 100, 80, 40)
    def at(gc: Int, gr: Int): Double = {
      val (fc, fr) = win.rasterCoord(gc + 0.5, -(gr + 0.5))
      val v = win.value(1, math.floor(fc).toInt, math.floor(fr).toInt)
      if (v == null) Double.NaN else v.doubleValue
    }
    assert(at(120, 100) == 100 * 1000 + 120)
    assert(at(199, 139) == 139 * 1000 + 199)
    assert(at(150, 120).isNaN, "absent v3 chunk pixel must be fill")
    val v = spark.sql(
      s"SELECT rs_value(rs_frompath('$path'), st_point(70.5, -80.5, 'EPSG:32610'), 1) v")
      .collect()(0).getDouble(0)
    assert(v == 80 * 1000 + 70)
  }

  test("zarr V3 sharding_indexed: gzip inner chunks, crc32c index, range reads") {
    val dir = new java.io.File("/tmp/graft_window_spec/cube_shard.zarr")
    if (dir.isDirectory) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(dir)
    }
    dir.mkdirs()
    // shape [192, 256]; shard [96, 128] (4 shard objects); inner [32, 64]
    // (3x2 = 6 inner chunks per shard); inner chunk (0,0)+k=3 absent
    java.nio.file.Files.write(new java.io.File(dir, "zarr.json").toPath,
      """{"zarr_format": 3, "node_type": "array", "shape": [192, 256],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [96, 128]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": -1.0,
        | "codecs": [{"name": "sharding_indexed", "configuration": {
        |   "chunk_shape": [32, 64],
        |   "codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
        |     {"name": "gzip", "configuration": {"level": 6}}],
        |   "index_codecs": [{"name": "bytes"}, {"name": "crc32c"}],
        |   "index_location": "end"}}],
        | "attributes": {"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
        |   "crs": "EPSG:32610"}}""".stripMargin.getBytes("UTF-8"))
    def innerEnc(gy: Int, gx: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(32 * 64 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until 32; c <- 0 until 64)
        bb.putDouble(((gy * 32 + r) * 1000 + (gx * 64 + c)).toDouble)
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(bb.array()); gz.close()
      bos.toByteArray
    }
    for (sy <- 0 until 2; sx <- 0 until 2) {
      val payload = new java.io.ByteArrayOutputStream()
      val entries = Array.fill(6)((-1L, -1L))
      for (iy <- 0 until 3; ix <- 0 until 2) {
        val k = iy * 2 + ix
        if (!(sy == 0 && sx == 0 && k == 3)) {
          val enc = innerEnc(sy * 3 + iy, sx * 2 + ix)
          entries(k) = (payload.size().toLong, enc.length.toLong)
          payload.write(enc)
        }
      }
      val idx = java.nio.ByteBuffer.allocate(6 * 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      entries.foreach { case (o, l) => idx.putLong(o).putLong(l) }
      val crc = new java.util.zip.CRC32C()
      crc.update(idx.array())
      val crcBytes = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(crc.getValue.toInt).array()
      val f = new java.io.File(dir, s"c/$sy/$sx")
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath,
        payload.toByteArray ++ idx.array() ++ crcBytes)
    }
    val path = dir.getAbsolutePath
    val meta = RasterLoaders.readMeta(path)
    assert(meta.width == 256 && meta.height == 192 && meta.crs == "EPSG:32610")
    // window spanning the absent inner chunk (global chunk (1, 1) is the
    // (0,0)-shard's k=3): rows 32..63 x cols 64..127 are fill there
    RasterLoaders.resetCounters()
    val win = RasterLoaders.window(path, 40, 20, 100, 40)
    def at(gc: Int, gr: Int): Double = {
      val (fc, fr) = win.rasterCoord(gc + 0.5, -(gr + 0.5))
      val v = win.value(1, math.floor(fc).toInt, math.floor(fr).toInt)
      if (v == null) Double.NaN else v.doubleValue
    }
    assert(at(40, 20) == 20 * 1000 + 40)
    assert(at(139, 59) == 59 * 1000 + 139)
    assert(at(100, 40).isNaN, "absent inner chunk must read as fill")
    // range-read efficiency, measured on the loader directly (the cache
    // layer above aligns to 256px blocks, which covers this small array
    // wholesale): a one-inner-chunk window fetches that chunk's bytes
    // plus one shard index, NOT whole shards
    val totalStore = new java.io.File(dir, "c").listFiles()
      .flatMap(_.listFiles()).map(_.length).sum
    RasterLoaders.resetCounters()
    val direct = graft.sources.ZarrIO.OutDb.loadWindow(path,
      new org.apache.hadoop.conf.Configuration(), 70, 75, 20, 10)
    assert(direct.value(1, 0, 0).doubleValue == 75 * 1000 + 70)
    assert(RasterLoaders.fetchBytes.sum() < totalStore / 4,
      s"fetched ${RasterLoaders.fetchBytes.sum()} of $totalStore store bytes")
    // read(): one row per PRESENT inner chunk at its global position
    val rows = graft.sources.ZarrIO.read(spark, path)
    assert(rows.count() == 4 * 6 - 1)
    val r11 = rows.filter("cy = 1 AND cx = 1").count()
    assert(r11 == 0, "absent inner chunk must not produce a row")
    // SQL point sample through rs_frompath
    val v = spark.sql(
      s"SELECT rs_value(rs_frompath('$path'), st_point(70.5, -80.5, 'EPSG:32610'), 1) v")
      .collect()(0).getDouble(0)
    assert(v == 80 * 1000 + 70)
  }

  test("COG overviews: downsampled rs_resample reads the overview level, counter-asserted") {
    val r = makeRaster(1024, 768, 1)
    val cog = GeoTiff.writeCog(r, 64, 64, Seq(2, 4, 8))
    def fetchOf(bytes: Array[Byte]): (Long, Int) => Array[Byte] =
      (off, n) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    // the full reader still sees the main image; the chain enumerates
    // the three reduced-resolution IFDs in factor order
    val main = GeoTiff.read(cog)
    assert(main.width == 1024 && main.height == 768)
    assert(GeoTiff.overviews(fetchOf(cog)).map(o => (o._2, o._3)) ==
      Seq((512, 384), (256, 192), (128, 96)))
    val dir = new java.io.File("/tmp/graft_window_spec"); dir.mkdirs()
    val f = new java.io.File(dir, "cog.tif")
    val os = new java.io.FileOutputStream(f); os.write(cog); os.close()
    val path = f.getAbsolutePath

    RasterLoaders.resetCounters()
    // 4x nearest downsample out-db: reads the factor-4 overview (256x192
    // pixels = 1/16 of the data), never decodes full resolution
    val down = spark.sql(
      s"""SELECT rs_width(r) w, rs_height(r) h, rs_upperleftx(r) x0, rs_scalex(r) sx
         |FROM (SELECT rs_resample(rs_frompath('$path'),
         |  40.0, -40.0, true, 'nearestneighbor') r)""".stripMargin).collect()(0)
    assert(down.getInt(0) == 256 && down.getInt(1) == 192)
    assert(down.getDouble(2) == 500000.0 && down.getDouble(3) == 40.0)
    assert(RasterLoaders.overviewReads.sum() == 1, "must decode one overview level")
    assert(RasterLoaders.fullDecodes.sum() == 0, "no full decode on the overview path")
    val fetched = RasterLoaders.fetchBytes.sum()
    assert(fetched < cog.length / 8,
      s"overview read fetched $fetched of ${cog.length} bytes")

    // hash-match vs the full-res decimate oracle: the factor-4 overview
    // IS decimate(full, 4), and the 40m target grid aligns its pixel
    // centers with the overview's, so every output pixel must equal full
    // pixel (4c, 4row): v = 100000 + 4*row*1000 + 4*c
    for ((c, row) <- Seq((0, 0), (10, 5), (255, 191), (100, 100))) {
      val px = 500000.0 + c * 40.0 + 20.0
      val py = 4650000.0 - row * 40.0 - 20.0
      val v = spark.sql(
        s"""SELECT rs_value(rs_resample(rs_frompath('$path'),
           |  40.0, -40.0, true, 'nearestneighbor'),
           |  st_point($px, $py, 'EPSG:32610'), 1) v""".stripMargin)
        .collect()(0).getDouble(0)
      assert(v == 100000.0 + 4 * row * 1000.0 + 4 * c, s"pixel ($c,$row)")
    }

    // cache observability (VERDICT r7 #6): repeating the same resample
    // serves the overview decode from the per-executor cache
    val bytesBefore = RasterLoaders.fetchBytes.sum()
    val hitsBefore = RasterLoaders.cacheHits.sum()
    spark.sql(
      s"""SELECT rs_value(rs_resample(rs_frompath('$path'),
         |  40.0, -40.0, true, 'nearestneighbor'),
         |  st_point(500020.0, 4649980.0, 'EPSG:32610'), 1) v""".stripMargin).collect()
    assert(RasterLoaders.fetchBytes.sum() == bytesBefore,
      "repeated overview resample must hit the decode cache")
    assert(RasterLoaders.cacheHits.sum() > hitsBefore, "cache hits must be counted")

    // a full-resolution request ignores overviews; bilinear always
    // decodes full resolution for reference-faithful interpolation
    RasterLoaders.resetCounters()
    spark.sql(
      s"""SELECT rs_width(rs_resample(rs_frompath('$path'),
         |  10.0, -10.0, true, 'nearestneighbor')) w""".stripMargin).collect()
    assert(RasterLoaders.overviewReads.sum() == 0 &&
      RasterLoaders.fullDecodes.sum() == 1, "factor 1 must use full resolution")
    spark.sql(
      s"""SELECT rs_width(rs_resample(rs_frompath('$path'),
         |  40.0, -40.0, true, 'bilinear')) w""".stripMargin).collect()
    assert(RasterLoaders.overviewReads.sum() == 0, "bilinear stays full-res")
  }

  test("seeded fuzz: writeCog chains read back level-exact across sizes/factors/codecs") {
    val rnd = new scala.util.Random(0xC06)
    def fetchOf(bytes: Array[Byte]): (Long, Int) => Array[Byte] =
      (off, n) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    for (it <- 0 until 12) {
      val w = 40 + rnd.nextInt(300)
      val h = 30 + rnd.nextInt(200)
      val nb = 1 + rnd.nextInt(2)
      val tile = Seq(16, 32, 64)(rnd.nextInt(3))
      val code = Seq(1, 8, 5)(rnd.nextInt(3))
      val factors = Seq(2, 3, 4, 8).filter(_ => rnd.nextBoolean()) match {
        case Nil => Seq(2)
        case fs => fs
      }
      val r = makeRaster(w, h, nb)
      // alternate iterations fuzz the BigTIFF layout through the same chain
      val cog = GeoTiff.writeCog(r, tile, tile, factors, code,
        bigTiff = it % 2 == 0)
      assert(cog(2) == (if (it % 2 == 0) 43 else 42), s"it=$it magic")
      val main = GeoTiff.read(cog)
      assert(main.width == w && main.height == h && main.bands.length == nb, s"it=$it")
      for (b <- 1 to nb)
        assert(pixels(main, b) == pixels(r, b), s"it=$it main b=$b")
      val ovs = GeoTiff.overviews(fetchOf(cog))
      assert(ovs.length == factors.length, s"it=$it")
      factors.sorted.zip(ovs).foreach { case (f, (tok, ow, oh)) =>
        assert(ow == math.max(1, (w + f - 1) / f) &&
          oh == math.max(1, (h + f - 1) / f), s"it=$it f=$f")
        val lvl = GeoTiff.readWindow(fetchOf(cog), 0, 0, ow, oh, ifdAt = tok,
          fallbackGt = Array(r.gt(0), r.gt(1) * f, 0.0, r.gt(3), 0.0, r.gt(5) * f),
          fallbackCrs = r.crs)
        // overview pixel (row, c) must equal full pixel (f*row, f*c)
        for (b <- 1 to nb; row <- 0 until oh by math.max(1, oh / 7);
             c <- 0 until ow by math.max(1, ow / 7)) {
          val exp = r.value(b, math.min(c * f, w - 1), math.min(row * f, h - 1))
          assert(lvl.value(b, c, row) == exp, s"it=$it f=$f b=$b ($c,$row)")
        }
        assert(lvl.gt(1) == r.gt(1) * f && lvl.gt(5) == r.gt(5) * f, s"it=$it f=$f gt")
      }
    }
  }

  test("rs_value/rs_values band-less form resolves the default band out-db") {
    val r = makeRaster(200, 100, 1)
    val bytes = GeoTiff.writeTiled(r, 64, 64, 1)
    val dir = new java.io.File("/tmp/graft_window_spec"); dir.mkdirs()
    val f = new java.io.File(dir, "oneband.tif")
    val out = new java.io.FileOutputStream(f); out.write(bytes); out.close()
    val path = f.getAbsolutePath
    val x = 500000.0 + 42 * 10.0 + 5.0
    val y = 4650000.0 - 17 * 10.0 - 5.0
    val v = spark.sql(
      s"SELECT rs_value(rs_frompath('$path'), st_point($x, $y, 'EPSG:32610')) v")
      .collect()(0).getDouble(0)
    assert(v == 100000.0 + 17 * 1000.0 + 42)
    val vs = spark.sql(
      s"""SELECT rs_values(rs_frompath('$path'),
         |  st_geomfromtext('MULTIPOINT ($x $y, 400000 $y)', 'EPSG:32610')) v"""
        .stripMargin).collect()(0).getSeq[Any](0)
    assert(vs == Seq(100000.0 + 17 * 1000.0 + 42, null))
  }

  /** Deterministic 8-bit raster for the lossy JPEG codec tests. */
  private def makeRaster8(w: Int, h: Int, nb: Int,
      f: (Int, Int, Int) => Int): Raster = {
    val bands = (1 to nb).map { b =>
      val vals = Array.tabulate(w * h)(i => f(b, i / w, i % w).toDouble)
      Band(Double.NaN, RasterModel.packDoubles(vals), ptype = "UNSIGNED_8BITS")
    }
    Raster("EPSG:32610", Array(500000.0, 10.0, 0.0, 4650000.0, 0.0, -10.0),
      w, h, bands)
  }

  test("zarr interop: '.'-separated v3 keys, v2 key encoding, index_location start, v2 F order") {
    def fresh(name: String): java.io.File = {
      val d = new java.io.File(s"/tmp/graft_window_spec/$name")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (d.exists) rm(d)
      d.mkdirs()
      d
    }
    def chunk64(cy: Int, cx: Int, forder: Boolean): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64 * 64 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until 64; c <- 0 until 64) {
        val v = ((cy * 64 + r) * 1000 + (cx * 64 + c)).toDouble
        val k = if (forder) c * 64 + r else r * 64 + c
        bb.putDouble(k * 8, v)
      }
      bb.array()
    }
    def v3meta(cke: String): String =
      s"""{"zarr_format": 3, "node_type": "array", "shape": [128, 128],
         | "data_type": "float64",
         | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [64, 64]}},
         | $cke
         | "fill_value": -1.0,
         | "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
         | "attributes": {"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
         |   "crs": "EPSG:32610"}}""".stripMargin
    def probe(path: String, expectRows: Long = 4): Unit = {
      val win = RasterLoaders.window(path, 60, 60, 10, 10)
      def at(gc: Int, gr: Int): Double = {
        val (fc, fr) = win.rasterCoord(gc + 0.5, -(gr + 0.5))
        win.value(1, math.floor(fc).toInt, math.floor(fr).toInt).doubleValue
      }
      assert(at(60, 60) == 60 * 1000 + 60)
      assert(at(69, 69) == 69 * 1000 + 69) // crosses into chunk (1,1)
      val rows = graft.sources.ZarrIO.read(spark, path).count()
      assert(rows == expectRows, s"expected $expectRows chunk rows, got $rows")
    }
    // (a) v3 default key encoding with "." separator: flat c.y.x objects
    val a = fresh("interop_dot.zarr")
    java.nio.file.Files.write(new java.io.File(a, "zarr.json").toPath,
      v3meta(""""chunk_key_encoding": {"name": "default", "configuration": {"separator": "."}},""")
        .getBytes("UTF-8"))
    for (cy <- 0 until 2; cx <- 0 until 2)
      java.nio.file.Files.write(new java.io.File(a, s"c.$cy.$cx").toPath,
        chunk64(cy, cx, forder = false))
    probe(a.getAbsolutePath)
    // (b) v3 "v2" key encoding: flat y.x objects, no c prefix
    val b = fresh("interop_v2keys.zarr")
    java.nio.file.Files.write(new java.io.File(b, "zarr.json").toPath,
      v3meta(""""chunk_key_encoding": {"name": "v2"},""").getBytes("UTF-8"))
    for (cy <- 0 until 2; cx <- 0 until 2)
      java.nio.file.Files.write(new java.io.File(b, s"$cy.$cx").toPath,
        chunk64(cy, cx, forder = false))
    probe(b.getAbsolutePath)
    // (c) v2 store with Fortran (column-major) chunk order
    val c = fresh("interop_forder.zarr")
    java.nio.file.Files.write(new java.io.File(c, ".zarray").toPath,
      """{"zarr_format": 2, "shape": [128, 128], "chunks": [64, 64],
        | "dtype": "<f8", "order": "F", "fill_value": -1.0,
        | "compressor": null, "filters": null}""".stripMargin.getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(c, ".zattrs").toPath,
      """{"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0], "crs": "EPSG:32610"}"""
        .getBytes("UTF-8"))
    for (cy <- 0 until 2; cx <- 0 until 2)
      java.nio.file.Files.write(new java.io.File(c, s"$cy.$cx").toPath,
        chunk64(cy, cx, forder = true))
    probe(c.getAbsolutePath)
    // (d) sharding_indexed with index_location START: one 128x128 shard
    // of 2x2 inner 64x64 chunks, inner (1,0) absent -> fill
    val d = fresh("interop_idxstart.zarr")
    java.nio.file.Files.write(new java.io.File(d, "zarr.json").toPath,
      """{"zarr_format": 3, "node_type": "array", "shape": [128, 128],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [128, 128]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": -1.0,
        | "codecs": [{"name": "sharding_indexed", "configuration": {
        |   "chunk_shape": [64, 64],
        |   "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        |   "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
        |                    {"name": "crc32c"}],
        |   "index_location": "start"}}],
        | "attributes": {"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
        |   "crs": "EPSG:32610"}}""".stripMargin.getBytes("UTF-8"))
    val present = Seq((0, 0), (0, 1), (1, 1)) // inner (1,0) absent
    val idxLen = 4 * 16 + 4
    val chunkLen = 64 * 64 * 8
    val obj = java.nio.ByteBuffer.allocate(idxLen + present.length * chunkLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = idxLen.toLong
    val offsets = scala.collection.mutable.Map[(Int, Int), Long]()
    present.foreach { case (iy, ix) =>
      obj.position(off.toInt)
      obj.put(chunk64(iy, ix, forder = false))
      offsets((iy, ix)) = off
      off += chunkLen
    }
    for (iy <- 0 until 2; ix <- 0 until 2) {
      val k = iy * 2 + ix
      val (o, l) = offsets.get((iy, ix))
        .map(o => (o, chunkLen.toLong)).getOrElse((-1L, -1L))
      obj.putLong(k * 16, o)
      obj.putLong(k * 16 + 8, l)
    }
    val crc = new java.util.zip.CRC32C()
    crc.update(obj.array(), 0, 4 * 16)
    obj.putInt(4 * 16, crc.getValue.toInt)
    val shardFile = new java.io.File(d, "c/0/0")
    shardFile.getParentFile.mkdirs()
    java.nio.file.Files.write(shardFile.toPath, obj.array())
    probe(d.getAbsolutePath, expectRows = 3) // inner (1,0) absent
    // the absent inner chunk reads as fill through the windowed path
    // (fill == band nodata, so the pixel surfaces as null)
    val winD = RasterLoaders.window(d.getAbsolutePath, 10, 70, 4, 4)
    val (fc, fr) = winD.rasterCoord(10.5, -70.5)
    assert(winD.value(1, math.floor(fc).toInt, math.floor(fr).toInt) == null,
      "absent inner chunk must be fill under index_location start")
  }

  test("zarr v3 transpose codec: column-major chunks plain and inside sharding") {
    def fresh(name: String): java.io.File = {
      val d = new java.io.File(s"/tmp/graft_window_spec/$name")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      if (d.exists) rm(d)
      d.mkdirs()
      d
    }
    def chunk64(cy: Int, cx: Int, forder: Boolean): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64 * 64 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until 64; c <- 0 until 64) {
        val v = ((cy * 64 + r) * 1000 + (cx * 64 + c)).toDouble
        val k = if (forder) c * 64 + r else r * 64 + c
        bb.putDouble(k * 8, v)
      }
      bb.array()
    }
    def probe(path: String, expectRows: Long): Unit = {
      val win = RasterLoaders.window(path, 60, 60, 10, 10)
      def at(gc: Int, gr: Int): Double = {
        val (fc, fr) = win.rasterCoord(gc + 0.5, -(gr + 0.5))
        win.value(1, math.floor(fc).toInt, math.floor(fr).toInt).doubleValue
      }
      assert(at(60, 60) == 60 * 1000 + 60)
      assert(at(69, 69) == 69 * 1000 + 69) // crosses into chunk (1,1)
      val rows = graft.sources.ZarrIO.read(spark, path).count()
      assert(rows == expectRows, s"expected $expectRows chunk rows, got $rows")
    }
    // (a) plain chunks with a leading transpose [1,0]: stored F-order
    val a = fresh("interop_transpose.zarr")
    java.nio.file.Files.write(new java.io.File(a, "zarr.json").toPath,
      """{"zarr_format": 3, "node_type": "array", "shape": [128, 128],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [64, 64]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": -1.0,
        | "codecs": [{"name": "transpose", "configuration": {"order": [1, 0]}},
        |            {"name": "bytes", "configuration": {"endian": "little"}}],
        | "attributes": {"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
        |   "crs": "EPSG:32610"}}""".stripMargin.getBytes("UTF-8"))
    for (cy <- 0 until 2; cx <- 0 until 2) {
      val f = new java.io.File(a, s"c/$cy/$cx")
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, chunk64(cy, cx, forder = true))
    }
    probe(a.getAbsolutePath, expectRows = 4)
    // (b) identity transpose [0,1] is a no-op over row-major chunks
    val b = fresh("interop_transpose_id.zarr")
    java.nio.file.Files.write(new java.io.File(b, "zarr.json").toPath,
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(a, "zarr.json").toPath), "UTF-8")
        .replace("\"order\": [1, 0]", "\"order\": [0, 1]").getBytes("UTF-8"))
    for (cy <- 0 until 2; cx <- 0 until 2) {
      val f = new java.io.File(b, s"c/$cy/$cx")
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, chunk64(cy, cx, forder = false))
    }
    probe(b.getAbsolutePath, expectRows = 4)
    // (c) transpose as the sharding INNER codec chain: one 128x128 shard
    // of 2x2 F-order inner chunks, trailing index
    val c = fresh("interop_transpose_shard.zarr")
    java.nio.file.Files.write(new java.io.File(c, "zarr.json").toPath,
      """{"zarr_format": 3, "node_type": "array", "shape": [128, 128],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [128, 128]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": -1.0,
        | "codecs": [{"name": "sharding_indexed", "configuration": {
        |   "chunk_shape": [64, 64],
        |   "codecs": [{"name": "transpose", "configuration": {"order": [1, 0]}},
        |              {"name": "bytes", "configuration": {"endian": "little"}}],
        |   "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        |   "index_location": "end"}}],
        | "attributes": {"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
        |   "crs": "EPSG:32610"}}""".stripMargin.getBytes("UTF-8"))
    val chunkLen = 64 * 64 * 8
    val idxLen = 4 * 16
    val obj = java.nio.ByteBuffer.allocate(4 * chunkLen + idxLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (iy <- 0 until 2; ix <- 0 until 2) {
      val k = iy * 2 + ix
      obj.position(k * chunkLen)
      obj.put(chunk64(iy, ix, forder = true))
      obj.putLong(4 * chunkLen + k * 16, (k * chunkLen).toLong)
      obj.putLong(4 * chunkLen + k * 16 + 8, chunkLen.toLong)
    }
    val shardFile = new java.io.File(c, "c/0/0")
    shardFile.getParentFile.mkdirs()
    java.nio.file.Files.write(shardFile.toPath, obj.array())
    probe(c.getAbsolutePath, expectRows = 4)
  }

  test("zarr v3 NESTED sharding: shards of shards, absent levels are fill, range-read window") {
    val d = new java.io.File("/tmp/graft_window_spec/interop_nested.zarr")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (d.exists) rm(d)
    d.mkdirs()
    // 128x128 image; one top object (grid cell 128x128) holding a 2x2
    // index of 64x64 INNER SHARDS, each holding a 2x2 crc32c'd index of
    // 32x32 innermost chunks. Inner shard (1,1) absent at the top level;
    // innermost chunk (0,3) absent inside inner shard (0,1).
    java.nio.file.Files.write(new java.io.File(d, "zarr.json").toPath,
      """{"zarr_format": 3, "node_type": "array", "shape": [128, 128],
        | "data_type": "float64",
        | "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [128, 128]}},
        | "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        | "fill_value": -1.0,
        | "codecs": [{"name": "sharding_indexed", "configuration": {
        |   "chunk_shape": [64, 64],
        |   "codecs": [{"name": "sharding_indexed", "configuration": {
        |     "chunk_shape": [32, 32],
        |     "codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        |     "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
        |                      {"name": "crc32c"}],
        |     "index_location": "end"}}],
        |   "index_codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        |   "index_location": "end"}}],
        | "attributes": {"transform": [0.0, 1.0, 0.0, 0.0, 0.0, -1.0],
        |   "crs": "EPSG:32610"}}""".stripMargin.getBytes("UTF-8"))
    def chunk32(cy: Int, cx: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(32 * 32 * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until 32; c <- 0 until 32)
        bb.putDouble((r * 32 + c) * 8, ((cy * 32 + r) * 1000 + (cx * 32 + c)).toDouble)
      bb.array()
    }
    val chunkLen = 32 * 32 * 8
    // inner shard (sy,sx) = its present innermost chunks + crc32c'd index
    def innerShard(sy: Int, sx: Int, absent: Set[(Int, Int)]): Array[Byte] = {
      val present = (for (iy <- 0 until 2; ix <- 0 until 2
        if !absent((iy, ix))) yield (iy, ix)).toSeq
      val idxLen = 4 * 16 + 4
      val bb = java.nio.ByteBuffer.allocate(present.length * chunkLen + idxLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val offs = scala.collection.mutable.Map[(Int, Int), Long]()
      present.zipWithIndex.foreach { case ((iy, ix), i) =>
        bb.position(i * chunkLen)
        bb.put(chunk32(sy * 2 + iy, sx * 2 + ix))
        offs((iy, ix)) = (i * chunkLen).toLong
      }
      val base = present.length * chunkLen
      for (iy <- 0 until 2; ix <- 0 until 2) {
        val k = iy * 2 + ix
        val (o, l) = offs.get((iy, ix))
          .map(o => (o, chunkLen.toLong)).getOrElse((-1L, -1L))
        bb.putLong(base + k * 16, o)
        bb.putLong(base + k * 16 + 8, l)
      }
      val crc = new java.util.zip.CRC32C()
      crc.update(bb.array(), base, 4 * 16)
      bb.putInt(base + 4 * 16, crc.getValue.toInt)
      bb.array()
    }
    val shards = Seq(
      (0, 0) -> innerShard(0, 0, Set.empty),
      (0, 1) -> innerShard(0, 1, Set((0, 1))), // global chunk (0,3) absent
      (1, 0) -> innerShard(1, 0, Set.empty))   // inner shard (1,1) absent
    val topIdxLen = 4 * 16
    val topLen = shards.map(_._2.length).sum + topIdxLen
    val top = java.nio.ByteBuffer.allocate(topLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val topOffs = scala.collection.mutable.Map[(Int, Int), (Long, Long)]()
    var off = 0L
    shards.foreach { case (k, bytes) =>
      top.position(off.toInt); top.put(bytes)
      topOffs(k) = (off, bytes.length.toLong)
      off += bytes.length
    }
    for (sy <- 0 until 2; sx <- 0 until 2) {
      val k = sy * 2 + sx
      val (o, l) = topOffs.getOrElse((sy, sx), (-1L, -1L))
      top.putLong(off.toInt + k * 16, o)
      top.putLong(off.toInt + k * 16 + 8, l)
    }
    val f = new java.io.File(d, "c/0/0")
    f.getParentFile.mkdirs()
    java.nio.file.Files.write(f.toPath, top.array())
    // full read: 4 + 3 + 4 present innermost chunks = 11 rows
    assert(graft.sources.ZarrIO.read(spark, d.getAbsolutePath).count() == 11)
    // windowed read crossing all four innermost chunks around (60..69)²:
    // (2,2) lives in the ABSENT inner shard -> fill/null
    val win = RasterLoaders.window(d.getAbsolutePath, 60, 60, 10, 10)
    def at(gc: Int, gr: Int): Any = {
      val (fc, fr) = win.rasterCoord(gc + 0.5, -(gr + 0.5))
      win.value(1, math.floor(fc).toInt, math.floor(fr).toInt)
    }
    assert(at(60, 60).asInstanceOf[Number].doubleValue == 60 * 1000 + 60)
    assert(at(63, 65).asInstanceOf[Number].doubleValue == 65 * 1000 + 63)
    assert(at(69, 69) == null, "chunk inside the absent inner shard must be fill")
    // the absent INNERMOST chunk (global (0,3): pixels y<32, x in 96..127)
    val win2 = RasterLoaders.window(d.getAbsolutePath, 90, 10, 20, 8)
    val (fc2, fr2) = win2.rasterCoord(105.5, -12.5)
    assert(win2.value(1, math.floor(fc2).toInt, math.floor(fr2).toInt) == null,
      "absent innermost chunk must be fill")
    val (fc3, fr3) = win2.rasterCoord(95.5, -12.5) // chunk (0,2), present
    assert(win2.value(1, math.floor(fc3).toInt, math.floor(fr3).toInt)
      .doubleValue == 12 * 1000 + 95)
  }

  test("JPEG geotiff: constant tiles roundtrip within 1 at q=1.0; smooth data within tolerance; window == full crop") {
    def fetchOf(bytes: Array[Byte]): (Long, Int) => Array[Byte] =
      (off, n) => java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + n)
    // constant image at q=1.0: interior blocks are DC-only; the
    // zero-padded edge tiles put a hard step inside their blocks, so
    // integer DCT rounding may wobble edge-adjacent pixels by 1
    val rc = makeRaster8(150, 90, 2, (b, _, _) => 40 * b + 17)
    val cb = GeoTiff.writeTiled(rc, 64, 64, 7, quality = 1.0)
    val cback = GeoTiff.read(cb)
    for (b <- 1 to 2) {
      val d = pixels(cback, b).zip(pixels(rc, b)).map {
        case (a, e) => math.abs(a - e) }.max
      assert(d <= 1.0, s"constant JPEG band $b max error $d")
    }
    assert(cback.gt.toSeq == rc.gt.toSeq && cback.crs == rc.crs)
    // smooth gradient: lossy, but must stay within a tight tolerance
    val rg = makeRaster8(150, 90, 1, (_, row, col) => (row + col) / 2 % 200)
    val gb = GeoTiff.writeTiled(rg, 64, 64, 7, quality = 0.95)
    val gback = GeoTiff.read(gb)
    val maxd = pixels(gback, 1).zip(pixels(rg, 1)).map {
      case (a, e) => math.abs(a - e) }.max
    assert(maxd <= 8.0, s"JPEG q0.95 max pixel error $maxd")
    assert(gb.length < GeoTiff.writeTiled(rg, 64, 64, 1).length,
      "JPEG output should be smaller than uncompressed")
    // windowed read decodes the same streams -> exactly equal to the crop
    val win = GeoTiff.readWindow(fetchOf(gb), 30, 20, 70, 50)
    for (y <- 0 until 50; x <- 0 until 70)
      assert(win.value(1, x, y) == gback.value(1, x + 30, y + 20),
        s"window mismatch at ($x,$y)")
    // strip layout (one whole-band JPEG per band) roundtrips too; no
    // padding in a whole-band strip, so constants are exact here
    val sb = GeoTiff.read(GeoTiff.writeCompressed(rc, 7, quality = 1.0))
    for (b <- 1 to 2) assert(pixels(sb, b) == pixels(rc, b))
    // non-8-bit bands must be rejected loudly
    val r64 = makeRaster(64, 64, 1)
    intercept[IllegalArgumentException](GeoTiff.writeTiled(r64, 64, 64, 7))
  }

  test("chunky RGB JPEG strip with JPEGTables (the GDAL layout) decodes via the tables merge") {
    // reference image + stream from the JDK encoder itself: our TIFF
    // decode must match ImageIO's own decode of the same JPEG bit-exactly
    val w = 96; val h = 64
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 2 % 256) << 16) | ((y * 3 % 256) << 8) | ((x + y) % 256))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", baos)
    val full = baos.toByteArray
    // split the stream GDAL-style: DQT/DHT segments into tag 347, the
    // rest (APPn/SOF/SOS + entropy data) stays in the strip
    def u8(b: Byte) = b & 0xff
    val tables = new java.io.ByteArrayOutputStream()
    val chunk = new java.io.ByteArrayOutputStream()
    tables.write(0xff); tables.write(0xd8)
    chunk.write(0xff); chunk.write(0xd8)
    var i = 2
    while (i < full.length) {
      assert(u8(full(i)) == 0xff, s"marker expected at $i")
      val marker = u8(full(i + 1))
      if (marker == 0xd9) { chunk.write(full, i, 2); i += 2 }
      else if (marker == 0xda) { chunk.write(full, i, full.length - i); i = full.length }
      else {
        val len = ((u8(full(i + 2)) << 8) | u8(full(i + 3))) + 2
        if (marker == 0xdb || marker == 0xc4) tables.write(full, i, len)
        else chunk.write(full, i, len)
        i += len
      }
    }
    tables.write(0xff); tables.write(0xd9)
    val tbl = tables.toByteArray
    val strip = chunk.toByteArray
    assert(tbl.length > 8, "fixture must actually carry tables")
    // minimal little-endian classic TIFF: chunky 3-band JPEG strip
    val bb = java.nio.ByteBuffer.allocate(4096 + strip.length + tbl.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    val nTags = 11
    bb.putShort(8, nTags.toShort)
    val valArea = 10 + nTags * 12 + 4
    var vp = valArea // running cursor for out-of-line values
    def entry(idx: Int, tag: Int, typ: Int, count: Int, value: Long): Unit = {
      val p = 10 + idx * 12
      bb.putShort(p, tag.toShort); bb.putShort(p + 2, typ.toShort)
      bb.putInt(p + 4, count); bb.putInt(p + 8, value.toInt)
    }
    // out-of-line: BitsPerSample (3 shorts), JPEGTables, strip data
    val bitsOff = vp; bb.putShort(vp, 8).putShort(vp + 2, 8).putShort(vp + 4, 8); vp += 6
    val tblOff = vp; (0 until tbl.length).foreach(k => bb.put(vp + k, tbl(k))); vp += tbl.length
    val dataOff = vp; (0 until strip.length).foreach(k => bb.put(vp + k, strip(k))); vp += strip.length
    entry(0, 256, 4, 1, w); entry(1, 257, 4, 1, h)
    entry(2, 258, 3, 3, bitsOff); entry(3, 259, 3, 1, 7)
    entry(4, 262, 3, 1, 6) // photometric YCbCr, as GDAL writes for JPEG
    entry(5, 273, 4, 1, dataOff); entry(6, 277, 3, 1, 3)
    entry(7, 278, 4, 1, h); entry(8, 279, 4, 1, strip.length)
    entry(9, 284, 3, 1, 1) // chunky
    entry(10, 347, 7, tbl.length, tblOff)
    bb.putInt(10 + nTags * 12, 0) // next IFD
    val tiff = java.util.Arrays.copyOf(bb.array(), vp)
    val back = GeoTiff.read(tiff)
    assert(back.width == w && back.height == h && back.bands.length == 3)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(full))
    var bad = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      if (back.value(1, x, y) != ((p >> 16) & 0xff).toDouble ||
          back.value(2, x, y) != ((p >> 8) & 0xff).toDouble ||
          back.value(3, x, y) != (p & 0xff).toDouble) bad += 1
    }
    assert(bad == 0, s"$bad pixels diverge from the reference JPEG decode")
    // the same strip without tag 347 must fail loudly (tables missing),
    // proving the merge path is actually load-bearing... unless the
    // encoder emitted a self-contained stream; reassembled-with-tables
    // equality above is the real contract
  }
}
