package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, max => smax}
import org.apache.spark.sql.types._
import graft.functions.RasterModel

/** Zarr v2 N-D array source for rasters (zarr-specs v2: `.zarray` JSON
  * metadata + C-order chunk files named `i.j`). The reference ships a
  * Zarr raster source (rust/sedona-raster-zarr, python/sedonadb-zarr);
  * here the format is implemented directly — raw or zlib-compressed
  * chunks (numcodecs `zlib` == RFC1950, java.util.zip.Deflater), dtype
  * `<f8`, single band.
  *
  * Distributed mapping: ONE CHUNK == ONE ROW carrying an in-db raster
  * whose geotransform is the array's global transform shifted by the
  * chunk's pixel origin. Chunks are the parallelism unit both ways —
  * exactly how a 100 TB Zarr cube shards across executors. The global
  * transform and CRS ride in `.zattrs` (keys `transform`, `crs`).
  *
  * All-fill chunks are absent on disk per the spec; reads return only
  * materialized chunks. Edge chunks are stored full-size, padded with
  * `fill_value`.
  */
object ZarrIO {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], outLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](outLen)
    var off = 0
    // needsInput guard: a truncated chunk makes inflate() return 0
    // forever — fail loudly instead of spinning (mirrors GeoTiff's loop)
    while (!inf.finished() && off < outLen && !inf.needsInput()) {
      off += inf.inflate(out, off, outLen - off)
    }
    inf.end()
    require(off == outLen, s"zarr chunk inflated to $off bytes, expected $outLen (truncated?)")
    out
  }

  /** Write band 1 of `rasterCol` rasters as one Zarr array; `cyCol`/`cxCol`
    * give each row's chunk grid position (must be distinct). Every raster
    * must share the same width/height (the chunk shape) and a transform
    * consistent with one global grid. */
  def write(df: DataFrame, path: String, rasterCol: String,
      cyCol: String = "cy", cxCol: String = "cx", compress: Boolean = true): Unit = {
    val spark = df.sparkSession
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    locally {
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(conf)
      if (fs.exists(target)) fs.delete(target, true)
      fs.mkdirs(target)
    }
    val firstRow = df.select(cyCol, cxCol, rasterCol).limit(1).collect()
      .headOption.getOrElse(throw new IllegalArgumentException("zarr write: empty input"))
    val proto = rasterOf(firstRow, 2)
    val (cw, ch) = (proto.width, proto.height)
    // global upper-left from any chunk: shift back by its pixel origin
    val cy0 = chunkIdx(firstRow, 0); val cx0 = chunkIdx(firstRow, 1)
    val g = proto.gt
    val gUlx = g(0) - cx0 * cw * g(1) - cy0 * ch * g(2)
    val gUly = g(3) - cx0 * cw * g(4) - cy0 * ch * g(5)
    val bounds = df.agg(smax(col(cyCol).cast("long")), smax(col(cxCol).cast("long")))
      .collect().head
    val shape = ((bounds.getLong(0) + 1) * ch, (bounds.getLong(1) + 1) * cw)
    val compressor =
      if (compress) """{"id": "zlib", "level": 6}""" else "null"
    // the band nodata doubles as the array fill value, so it survives a
    // roundtrip (NaN spells "NaN" in zarr v2 JSON)
    val fillJson = {
      val nd = proto.bands.head.nodata
      if (nd.isNaN) "\"NaN\"" else nd.toString
    }
    val zarray =
      s"""{
         |  "zarr_format": 2,
         |  "shape": [${shape._1}, ${shape._2}],
         |  "chunks": [$ch, $cw],
         |  "dtype": "<f8",
         |  "compressor": $compressor,
         |  "fill_value": $fillJson,
         |  "order": "C",
         |  "filters": null
         |}""".stripMargin
    val zattrs =
      s"""{
         |  "transform": [$gUlx, ${g(1)}, ${g(2)}, $gUly, ${g(4)}, ${g(5)}],
         |  "crs": "${proto.crs}"
         |}""".stripMargin
    val fs0 = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    Seq(".zarray" -> zarray, ".zattrs" -> zattrs).foreach { case (name, txt) =>
      val os = fs0.create(new org.apache.hadoop.fs.Path(path, name), true)
      os.write(txt.getBytes("UTF-8")); os.close()
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val doCompress = compress
    df.select(cyCol, cxCol, rasterCol).rdd.foreachPartition { rows =>
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(serConf.value)
      rows.foreach { r =>
        val rast = rasterOf(r, 2)
        require(rast.width == cw && rast.height == ch,
          s"zarr write: chunk shape ${rast.width}x${rast.height} != ${cw}x$ch")
        val data = rast.bands.headOption.map(_.data).getOrElse(
          throw new IllegalArgumentException("zarr write: raster has no bands"))
        val bytes = if (doCompress) deflate(data) else data
        val p = new org.apache.hadoop.fs.Path(path, s"${chunkIdx(r, 0)}.${chunkIdx(r, 1)}")
        val os = fs.create(p, true)
        os.write(bytes); os.close()
      }
    }
  }

  /** Chunk index, widened from any integral column type; negative grid
    * positions would write files the reader's name pattern skips. */
  private def chunkIdx(r: Row, i: Int): Long = {
    val v = r.getAs[Number](i).longValue()
    require(v >= 0, s"zarr chunk index $v is negative (grid must be 0-anchored)")
    v
  }

  private def rasterOf(r: Row, i: Int): RasterModel.Raster = {
    val s = r.getStruct(i)
    RasterModel.Raster(
      s.getString(0),
      s.getSeq[Double](1).toArray,
      s.getInt(2), s.getInt(3),
      s.getSeq[Row](4).map(b =>
        RasterModel.Band(b.getDouble(0), b.getAs[Array[Byte]](1))).toIndexedSeq,
      if (s.length > 5) s.getString(5) else null)
  }

  /** Read a Zarr v2 array directory: one row per materialized chunk with
    * columns (cy, cx, raster). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    def readText(name: String): String = {
      val p = new org.apache.hadoop.fs.Path(dir, name)
      require(fs.exists(p), s"zarr read: missing $name under $path")
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p); in.readFully(0, buf); in.close()
      new String(buf, "UTF-8")
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val za = mapper.readTree(readText(".zarray"))
    require(za.get("zarr_format").asInt() == 2, "zarr v2 only")
    require(za.get("dtype").asText() == "<f8",
      s"zarr dtype ${za.get("dtype").asText()} not supported (<f8 only)")
    require(za.get("order").asText() == "C", "zarr order C only")
    val chunks = za.get("chunks")
    val ch = chunks.get(0).asInt(); val cw = chunks.get(1).asInt()
    // codec filters would alter the byte stream before decompression —
    // decoding without applying them yields garbage, so reject loudly
    locally {
      val f = za.get("filters")
      require(f == null || f.isNull || (f.isArray && f.size == 0),
        s"zarr filters $f not supported")
    }
    val fillValue: Double = {
      val fv = za.get("fill_value")
      if (fv == null || fv.isNull) Double.NaN
      else if (fv.isTextual) fv.asText() match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case other => other.toDouble
      }
      else fv.asDouble()
    }
    val compressed = {
      val c = za.get("compressor")
      if (c == null || c.isNull) false
      else {
        require(c.get("id").asText() == "zlib",
          s"zarr compressor ${c.get("id").asText()} not supported (zlib/raw only)")
        true
      }
    }
    val (gt, crs) = {
      val p = new org.apache.hadoop.fs.Path(dir, ".zattrs")
      if (fs.exists(p)) {
        val at = mapper.readTree(readText(".zattrs"))
        val t = Option(at.get("transform"))
          .map(n => Array.tabulate(6)(i => n.get(i).asDouble()))
          .getOrElse(Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0))
        (t, Option(at.get("crs")).map(_.asText()).getOrElse("EPSG:0"))
      } else (Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0), "EPSG:0")
    }
    val chunkFiles = fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.matches("\\d+\\.\\d+")).sorted.toSeq
    val outSchema = StructType(Seq(
      StructField("cy", LongType, nullable = false),
      StructField("cx", LongType, nullable = false),
      StructField("raster", RasterModel.dataType)))
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration(conf))
    val pathStr = path
    val rdd = spark.sparkContext.parallelize(chunkFiles, math.max(1, chunkFiles.length))
      .map { name =>
        val fsx = new org.apache.hadoop.fs.Path(pathStr).getFileSystem(serConf.value)
        val p = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(pathStr), name)
        val len = fsx.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fsx.open(p); in.readFully(0, buf); in.close()
        val Array(cyS, cxS) = name.split("\\.")
        val cy = cyS.toLong; val cx = cxS.toLong
        val raw = if (compressed) inflate(buf, cw * ch * 8) else buf
        require(raw.length == cw * ch * 8, s"chunk $name: ${raw.length} bytes")
        val cgt = Array(
          gt(0) + cx * cw * gt(1) + cy * ch * gt(2), gt(1), gt(2),
          gt(3) + cx * cw * gt(4) + cy * ch * gt(5), gt(4), gt(5))
        // external Row (createDataFrame converts to internal); the
        // array's fill_value becomes the band nodata
        Row(cy, cx, Row(crs, cgt.toSeq, cw, ch,
          Seq(Row(fillValue, raw, null, null, null)), null))
      }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------------------------
  // out-db loader: `rs_frompath('.../cube.zarr')` + windowed reads.
  // A Zarr store is chunked natively, so the window path reads ONLY the
  // chunk objects under the request — the same lazy out-db contract as
  // the reference's zarr source (rust/sedona-raster-zarr) behind the
  // format-keyed registry (rust/sedona/src/context.rs:383-392).

  /** Parsed v2 store metadata (single 2D `<f8` array at the store root). */
  private case class StoreMeta(shapeH: Int, shapeW: Int, ch: Int, cw: Int,
      compressed: Boolean, fill: Double, gt: Array[Double], crs: String)

  private def storeMeta(path: String,
      conf: org.apache.hadoop.conf.Configuration): StoreMeta = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    def readText(name: String): String = {
      val p = new org.apache.hadoop.fs.Path(dir, name)
      if (!fs.exists(p)) throw new java.io.FileNotFoundException(
        s"zarr outdb: missing $name under $path")
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p); in.readFully(0, buf); in.close()
      RasterLoaders.fetchCalls.increment()
      RasterLoaders.fetchBytes.add(len.toLong)
      new String(buf, "UTF-8")
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val za = mapper.readTree(readText(".zarray"))
    require(za.get("zarr_format").asInt() == 2, "zarr v2 only")
    require(za.get("dtype").asText() == "<f8",
      s"zarr dtype ${za.get("dtype").asText()} not supported (<f8 only)")
    require(za.get("order").asText() == "C", "zarr order C only")
    require(za.get("shape").size == 2,
      s"zarr outdb: ${za.get("shape").size}-D array (2D y/x only)")
    val fl = za.get("filters")
    require(fl == null || fl.isNull || (fl.isArray && fl.size == 0),
      s"zarr filters $fl not supported")
    val fill: Double = {
      val fv = za.get("fill_value")
      if (fv == null || fv.isNull) Double.NaN
      else if (fv.isTextual) fv.asText() match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case other => other.toDouble
      }
      else fv.asDouble()
    }
    val compressed = {
      val c = za.get("compressor")
      if (c == null || c.isNull) false
      else {
        require(c.get("id").asText() == "zlib",
          s"zarr compressor ${c.get("id").asText()} not supported (zlib/raw only)")
        true
      }
    }
    val (gt, crs) = {
      val p = new org.apache.hadoop.fs.Path(dir, ".zattrs")
      if (fs.exists(p)) {
        val at = mapper.readTree(readText(".zattrs"))
        val t = Option(at.get("transform"))
          .map(n => Array.tabulate(6)(i => n.get(i).asDouble()))
          .getOrElse(Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0))
        (t, Option(at.get("crs")).map(_.asText()).getOrElse("EPSG:0"))
      } else (Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0), "EPSG:0")
    }
    StoreMeta(za.get("shape").get(0).asInt(), za.get("shape").get(1).asInt(),
      za.get("chunks").get(0).asInt(), za.get("chunks").get(1).asInt(),
      compressed, fill, gt, crs)
  }

  object OutDb extends RasterLoaders.DirLoader {
    def statObject: String = ".zarray"

    def readMeta(path: String,
        conf: org.apache.hadoop.conf.Configuration): RasterModel.Raster = {
      val m = storeMeta(path, conf)
      RasterModel.Raster(m.crs, m.gt, m.shapeW, m.shapeH, Vector.empty)
    }

    def loadWindow(path: String, conf: org.apache.hadoop.conf.Configuration,
        xoff: Int, yoff: Int, w: Int, h: Int): RasterModel.Raster = {
      val m = storeMeta(path, conf)
      require(xoff >= 0 && yoff >= 0 && w > 0 && h > 0 &&
        xoff + w <= m.shapeW && yoff + h <= m.shapeH,
        s"zarr outdb: window ($xoff,$yoff ${w}x$h) outside ${m.shapeW}x${m.shapeH}")
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      val out = Array.fill(w * h)(m.fill) // absent chunks are all-fill per spec
      var cy = yoff / m.ch
      while (cy <= (yoff + h - 1) / m.ch) {
        var cx = xoff / m.cw
        while (cx <= (xoff + w - 1) / m.cw) {
          val p = new org.apache.hadoop.fs.Path(dir, s"$cy.$cx")
          if (fs.exists(p)) {
            val len = fs.getFileStatus(p).getLen.toInt
            val buf = new Array[Byte](len)
            val in = fs.open(p); in.readFully(0, buf); in.close()
            RasterLoaders.fetchCalls.increment()
            RasterLoaders.fetchBytes.add(len.toLong)
            val raw = if (m.compressed) inflate(buf, m.cw * m.ch * 8) else buf
            require(raw.length == m.cw * m.ch * 8,
              s"zarr chunk $cy.$cx: ${raw.length} bytes")
            val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
            val rowLo = math.max(yoff, cy * m.ch)
            val rowHi = math.min(yoff + h, (cy + 1) * m.ch)
            val colLo = math.max(xoff, cx * m.cw)
            val colHi = math.min(xoff + w, (cx + 1) * m.cw)
            var r0 = rowLo
            while (r0 < rowHi) {
              var c0 = colLo
              while (c0 < colHi) {
                out((r0 - yoff) * w + (c0 - xoff)) =
                  bb.getDouble(((r0 - cy * m.ch) * m.cw + (c0 - cx * m.cw)) * 8)
                c0 += 1
              }
              r0 += 1
            }
          }
          cx += 1
        }
        cy += 1
      }
      val g = m.gt
      val gtW = Array(
        g(0) + xoff * g(1) + yoff * g(2), g(1), g(2),
        g(3) + xoff * g(4) + yoff * g(5), g(4), g(5))
      RasterModel.Raster(m.crs, gtW, w, h,
        Vector(RasterModel.Band(m.fill, RasterModel.packDoubles(out))))
    }
  }
}
