package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** LAS/LAZ point-cloud reader + LAS writer (ASPRS LAS public specs).
  * The reference ships a LAS/LAZ source (rust/sedona-pointcloud,
  * registered context.rs:248-251); here the container formats are
  * implemented directly.
  *
  * Read support:
  *  - LAS 1.0-1.4 headers (legacy u32 / 1.4 u64 point counts).
  *  - Point formats 0/1 (legacy schema: x,y,z,intensity,classification
  *    [,gps_time]) and formats 6/7/8 (full LAS 1.4 field set + RGB for
  *    7/8 + NIR for 8, mirroring the reference's column names —
  *    sedona-pointcloud/src/las/schema.rs:50-95).
  *  - Extra Bytes VLR (LASF_Spec/4): one typed column per descriptor,
  *    raw stored values, null when the no_data bit is set and the value
  *    equals the descriptor's no_data (schema.rs:148-153 semantics).
  *  - LAZ (compressed): formats 6/7/8 via [[Laszip]] (chunked layered
  *    compressor 3, POINT14+RGB14/RGBNIR14+BYTE14 v3) and legacy
  *    formats 0/1 via the pointwise compressors 1/2
  *    (POINT10/GPSTIME11 v2).
  *
  * Write support: LAS 1.2 formats 0/1 plain or legacy-LAZ-compressed
  * ([[write]]), and LAS 1.4 formats 6/7/8 plain or LASzip-compressed
  * ([[writeFmt6]]). Coordinates
  * are i32 grid steps (`coord = raw*scale + offset`); pick a
  * power-of-two `scale` (0.25, 0.5, 1.0) when exact double roundtrips
  * matter.
  *
  * Scale notes: LAZ chunks and uncompressed row ranges are the read
  * split units (see Split6) — a single huge file fans out across the
  * cluster; writes are one file per partition.
  */
object LasIO {

  private val HeaderSize = 227 // LAS 1.2

  def schema(withGps: Boolean): StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("intensity", LongType, nullable = false),
    StructField("classification", LongType, nullable = false)) ++
    (if (withGps) Seq(StructField("gps_time", DoubleType, nullable = false)) else Nil))

  private def encodeFile(rows: Seq[Row], withGps: Boolean, scale: Double,
      idx: IndexedSeq[Int], compress: Boolean = false): Array[Byte] = {
    val recLen = if (withGps) 28 else 20
    val n = rows.length
    var minX = Double.MaxValue; var minY = Double.MaxValue; var minZ = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue; var maxZ = -Double.MaxValue
    rows.foreach { r =>
      val x = r.getDouble(idx(0)); val y = r.getDouble(idx(1)); val z = r.getDouble(idx(2))
      minX = math.min(minX, x); maxX = math.max(maxX, x)
      minY = math.min(minY, y); maxY = math.max(maxY, y)
      minZ = math.min(minZ, z); maxZ = math.max(maxZ, z)
    }
    if (n == 0) { minX = 0; minY = 0; minZ = 0; maxX = 0; maxY = 0; maxZ = 0 }
    def record(r: Row): Array[Byte] = {
      val rb = ByteBuffer.allocate(recLen).order(ByteOrder.LITTLE_ENDIAN)
      def step(v: Double, off: Double): Int = math.round((v - off) / scale).toInt
      rb.putInt(step(r.getDouble(idx(0)), minX))
      rb.putInt(step(r.getDouble(idx(1)), minY))
      rb.putInt(step(r.getDouble(idx(2)), minZ))
      rb.putShort(r.getLong(idx(3)).toShort) // intensity
      rb.put(0x09.toByte) // return 1 of 1
      rb.put(r.getLong(idx(4)).toByte) // classification
      rb.put(0.toByte) // scan angle
      rb.put(0.toByte) // user data
      rb.putShort(0.toShort) // point source id
      if (withGps) rb.putDouble(r.getDouble(idx(5)))
      rb.array()
    }
    // laszip VLR for the legacy pointwise-chunked scheme (compressor 2,
    // POINT10 v2 [+ GPSTIME11 v2])
    val vlrBytes: Array[Byte] =
      if (!compress) Array.emptyByteArray
      else {
        val nItems = if (withGps) 2 else 1
        val payload = ByteBuffer.allocate(34 + 6 * nItems).order(ByteOrder.LITTLE_ENDIAN)
        payload.putShort(2) // pointwise chunked
        payload.putShort(0) // arithmetic coder
        payload.put(2.toByte).put(2.toByte) // laszip version
        payload.putShort(0)
        payload.putInt(0) // options
        payload.putInt(LazChunkSize)
        payload.putLong(0L).putLong(0L) // special EVLRs unused
        payload.putShort(nItems.toShort)
        payload.putShort(6).putShort(20).putShort(2) // POINT10 size 20 v2
        if (withGps) payload.putShort(7).putShort(8).putShort(2) // GPSTIME11 v2
        val v = ByteBuffer.allocate(54 + payload.capacity())
          .order(ByteOrder.LITTLE_ENDIAN)
        v.putShort(0)
        v.put("laszip encoded".getBytes("US-ASCII")).put(new Array[Byte](2))
        v.putShort(22204.toShort)
        v.putShort(payload.capacity().toShort)
        v.put("graft laszip".padTo(32, ' ').getBytes("US-ASCII"))
        v.put(payload.array())
        v.array()
      }
    val pointOff = HeaderSize + vlrBytes.length
    val data: Array[Byte] =
      if (compress)
        Laszip.encodePointwise(rows.iterator.map(record), recLen, withGps,
          rgb = false, nExtra = 0, LazChunkSize, pointOff)
      else {
        val db = ByteBuffer.allocate(recLen * n)
        rows.foreach(r => db.put(record(r)))
        db.array()
      }
    val bb = ByteBuffer.allocate(pointOff + data.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("LASF".getBytes("US-ASCII"))
    bb.putShort(6, 0) // file source id at 4..6, global encoding at 6..8 (zeros)
    bb.position(24)
    bb.put(1.toByte); bb.put(2.toByte) // version 1.2
    bb.position(26)
    val sysId = "GRAFT".padTo(32, '\u0000').getBytes("US-ASCII")
    bb.put(sysId)
    bb.put("graft spark engine".padTo(32, '\u0000').getBytes("US-ASCII"))
    bb.putShort(1.toShort); bb.putShort(2026.toShort) // day/year of creation
    bb.putShort(HeaderSize.toShort)
    bb.putInt(pointOff) // offset to point data
    bb.putInt(if (compress) 1 else 0) // number of VLRs
    bb.put(((if (withGps) 1 else 0) | (if (compress) 0x80 else 0)).toByte)
    bb.putShort(recLen.toShort)
    bb.putInt(n) // legacy number of point records
    (0 until 5).foreach(_ => bb.putInt(0)) // points by return
    bb.putDouble(scale); bb.putDouble(scale); bb.putDouble(scale)
    // offsets chosen as the min corner so i32 steps stay in range
    bb.putDouble(minX); bb.putDouble(minY); bb.putDouble(minZ)
    bb.putDouble(maxX); bb.putDouble(minX) // max x, min x
    bb.putDouble(maxY); bb.putDouble(minY)
    bb.putDouble(maxZ); bb.putDouble(minZ)
    bb.position(HeaderSize)
    bb.put(vlrBytes)
    bb.put(data)
    bb.array()
  }

  /** Write a point cloud: columns x,y,z (double), intensity,
    * classification (long) and optionally gps_time (double). One file
    * per partition; the target directory is cleared first. `compress`
    * produces legacy LAZ (pointwise-chunked compressor 2, POINT10 v2
    * [+ GPSTIME11 v2]). */
  def write(df: DataFrame, path: String, scale: Double = 0.001,
      compress: Boolean = false): Unit = {
    val withGps = df.schema.fieldNames.contains("gps_time")
    val expect = schema(withGps).fieldNames.toSeq
    val idx = expect.map(df.schema.fieldIndex).toIndexedSeq
    val spark = df.sparkSession
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    locally {
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(conf)
      if (fs.exists(target)) fs.delete(target, true)
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val ext = if (compress) "laz" else "las"
    df.rdd.mapPartitionsWithIndex { (pid, rowIt) =>
      val rows = rowIt.toSeq
      if (rows.isEmpty) Iterator.empty
      else {
        val bytes = encodeFile(rows, withGps, scale, idx, compress)
        val p = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.$ext")
        val fs = p.getFileSystem(serConf.value)
        val os = fs.create(p, true)
        os.write(bytes); os.close()
        Iterator.single(1)
      }
    }.count(): Unit
  }

  // -------------------------------------------------------------------
  // LAS 1.4 / format 6 writer (plain or LAZ-compressed)
  // -------------------------------------------------------------------

  /** Write a LAS 1.4 format-6/7/8 point cloud, optionally
    * LASzip-compressed (chunked layered v3 — decodable by this engine
    * and by standard LASzip readers). Requires x, y, z double columns;
    * intensity, return_number, number_of_returns, classification,
    * user_data, scan_angle, point_source_id, gps_time are honored when
    * present (schema6 names), defaulted otherwise. red/green/blue
    * columns select format 7 (+nir: format 8). One file per
    * partition. */
  def writeFmt6(df: DataFrame, path: String, scale: Double = 0.001,
      compress: Boolean = true): Unit = {
    val spark = df.sparkSession
    val sch = df.schema
    def idx(n: String): Int = if (sch.fieldNames.contains(n)) sch.fieldIndex(n) else -1
    val ix = Array("x", "y", "z", "intensity", "return_number", "number_of_returns",
      "classification", "user_data", "scan_angle", "point_source_id", "gps_time",
      "red", "green", "blue", "nir").map(idx)
    require(ix(0) >= 0 && ix(1) >= 0 && ix(2) >= 0, "writeFmt6 requires x, y, z columns")
    require(ix(11) >= 0 == ix(12) >= 0 && ix(12) >= 0 == ix(13) >= 0,
      "red/green/blue columns must be present together")
    require(ix(14) < 0 || ix(11) >= 0, "nir requires red/green/blue columns")
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    locally {
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(conf)
      if (fs.exists(target)) fs.delete(target, true)
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val ext = if (compress) "laz" else "las"
    df.rdd.mapPartitionsWithIndex { (pid, rowIt) =>
      val rows = rowIt.toSeq
      if (rows.isEmpty) Iterator.empty
      else {
        val bytes = encodeFmt6(rows, ix, scale, compress)
        val p = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.$ext")
        val fs = p.getFileSystem(serConf.value)
        val os = fs.create(p, true)
        os.write(bytes); os.close()
        Iterator.single(1)
      }
    }.count(): Unit
  }

  private def encodeFmt6(rows: Seq[Row], ix: Array[Int], scale: Double,
      compress: Boolean): Array[Byte] = {
    val n = rows.length
    val fmt = if (ix(14) >= 0) 8 else if (ix(11) >= 0) 7 else 6
    val rgbBytes = fmt match { case 8 => 8; case 7 => 6; case _ => 0 }
    val recLen = 30 + rgbBytes
    var minX = Double.MaxValue; var minY = Double.MaxValue; var minZ = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue; var maxZ = -Double.MaxValue
    rows.foreach { r =>
      val x = r.getDouble(ix(0)); val y = r.getDouble(ix(1)); val z = r.getDouble(ix(2))
      minX = math.min(minX, x); maxX = math.max(maxX, x)
      minY = math.min(minY, y); maxY = math.max(maxY, y)
      minZ = math.min(minZ, z); maxZ = math.max(maxZ, z)
    }
    @inline def lv(r: Row, i: Int, dflt: Long): Long =
      if (i < 0 || r.isNullAt(i)) dflt else r.getLong(i)
    @inline def dv(r: Row, i: Int, dflt: Double): Double =
      if (i < 0 || r.isNullAt(i)) dflt else r.getDouble(i)
    val records = rows.iterator.map { r =>
      val bb = ByteBuffer.allocate(recLen).order(ByteOrder.LITTLE_ENDIAN)
      def step(v: Double, off: Double): Int = math.round((v - off) / scale).toInt
      bb.putInt(step(r.getDouble(ix(0)), minX))
      bb.putInt(step(r.getDouble(ix(1)), minY))
      bb.putInt(step(r.getDouble(ix(2)), minZ))
      bb.putShort(lv(r, ix(3), 0L).toShort)
      val rn = lv(r, ix(4), 1L) & 0x0f
      val nr = lv(r, ix(5), 1L) & 0x0f
      bb.put((rn | (nr << 4)).toByte)
      bb.put(0.toByte) // flags: no class flags, scanner 0, no edge
      bb.put(lv(r, ix(6), 0L).toByte)
      bb.put(lv(r, ix(7), 0L).toByte)
      bb.putShort(math.round(dv(r, ix(8), 0.0) / 0.006).toShort)
      bb.putShort(lv(r, ix(9), 0L).toShort)
      bb.putDouble(dv(r, ix(10), 0.0))
      if (fmt >= 7) {
        bb.putShort(lv(r, ix(11), 0L).toShort)
        bb.putShort(lv(r, ix(12), 0L).toShort)
        bb.putShort(lv(r, ix(13), 0L).toShort)
        if (fmt == 8) bb.putShort(lv(r, ix(14), 0L).toShort)
      }
      bb.array()
    }
    val vlrBytes: Array[Byte] =
      if (!compress) Array.emptyByteArray
      else {
        // POINT14 v3 + (fmt 7) RGB14 v3 / (fmt 8) RGBNIR14 v3
        val items: Seq[(Int, Int, Int)] = Seq((10, 30, 3)) ++
          (if (fmt == 7) Seq((11, 6, 3))
           else if (fmt == 8) Seq((12, 8, 3)) else Nil)
        val payloadLen = 34 + 6 * items.length
        val payload = ByteBuffer.allocate(payloadLen).order(ByteOrder.LITTLE_ENDIAN)
        payload.putShort(3) // chunked layered
        payload.putShort(0) // arithmetic coder
        payload.put(2.toByte).put(2.toByte) // laszip version
        payload.putShort(0)
        payload.putInt(0) // options
        payload.putInt(LazChunkSize)
        payload.putLong(0L).putLong(0L) // special EVLRs unused
        payload.putShort(items.length.toShort)
        items.foreach { case (t, sz, ver) =>
          payload.putShort(t.toShort).putShort(sz.toShort).putShort(ver.toShort)
        }
        val v = ByteBuffer.allocate(54 + payloadLen).order(ByteOrder.LITTLE_ENDIAN)
        v.putShort(0)
        v.put("laszip encoded".getBytes("US-ASCII")).put(new Array[Byte](2))
        v.putShort(22204.toShort)
        v.putShort(payloadLen.toShort)
        v.put("graft laszip".padTo(32, ' ').getBytes("US-ASCII"))
        v.put(payload.array())
        v.array()
      }
    val headerSize = 375
    val pointOff = headerSize + vlrBytes.length
    val data: Array[Byte] =
      if (compress) Laszip.encode(records, recLen, 0, LazChunkSize, pointOff, rgbBytes)
      else {
        val bb = ByteBuffer.allocate(recLen * n)
        records.foreach(bb.put)
        bb.array()
      }
    val out = ByteBuffer.allocate(pointOff + data.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("LASF".getBytes("US-ASCII"))
    out.position(24)
    out.put(1.toByte).put(4.toByte) // LAS 1.4
    out.position(26)
    out.put("GRAFT".padTo(32, ' ').getBytes("US-ASCII"))
    out.put("graft spark engine".padTo(32, ' ').getBytes("US-ASCII"))
    out.putShort(1.toShort).putShort(2026.toShort)
    out.putShort(headerSize.toShort)
    out.putInt(pointOff)
    out.putInt(if (compress) 1 else 0) // VLR count
    out.put((fmt | (if (compress) 0x80 else 0)).toByte)
    out.putShort(recLen.toShort)
    out.putInt(0) // legacy count: 0 for formats >= 6
    out.position(131)
    out.putDouble(scale).putDouble(scale).putDouble(scale)
    out.putDouble(minX).putDouble(minY).putDouble(minZ)
    out.putDouble(maxX).putDouble(minX)
    out.putDouble(maxY).putDouble(minY)
    out.putDouble(maxZ).putDouble(minZ)
    out.position(247)
    out.putLong(n.toLong) // 1.4 extended point count
    out.position(headerSize)
    out.put(vlrBytes)
    out.put(data)
    out.array()
  }

  private val LazChunkSize = 50000

  // -------------------------------------------------------------------
  // Read path (LAS 1.0-1.4, formats 0/1/6/7/8, LAZ for all of them)
  // -------------------------------------------------------------------

  private[sources] case class Vlr(userId: String, recordId: Int, payload: Array[Byte])

  /** Extra Bytes descriptor (LASF_Spec/4, 192-byte records): data type
    * code, byte offset inside the extra block, and optional no_data. */
  private[sources] case class ExtraDim(name: String, dtype: Int, off: Int, size: Int,
      nullable: Boolean, noDataBits: Long)

  private[sources] case class Header(versionMinor: Int, pointOff: Int, fmt: Int,
      compressed: Boolean, recLen: Int, count: Long,
      sx: Double, sy: Double, sz: Double, ox: Double, oy: Double, oz: Double,
      vlrs: Seq[Vlr], software: String = "")

  private[sources] def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length >= HeaderSize &&
      bytes(0) == 'L' && bytes(1) == 'A' && bytes(2) == 'S' && bytes(3) == 'F',
      "not a LAS file (bad magic)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val vMinor = bytes(25) & 0xff
    val headerSize = bb.getShort(94) & 0xffff
    val pointOff = bb.getInt(96)
    val nVlr = bb.getInt(100)
    val fmtByte = bytes(104) & 0xff
    val legacy = bb.getInt(107).toLong & 0xffffffffL
    val count = if (legacy != 0 || vMinor < 4) legacy else bb.getLong(247)
    val vlrs = {
      var o = headerSize
      (0 until nVlr).map { _ =>
        val uid = new String(bytes, o + 2, 16, "US-ASCII").takeWhile(_ != 0)
        val rid = bb.getShort(o + 18) & 0xffff
        val len = bb.getShort(o + 20) & 0xffff
        val v = Vlr(uid, rid, java.util.Arrays.copyOfRange(bytes, o + 54, o + 54 + len))
        o += 54 + len
        v
      }
    }
    Header(vMinor, pointOff, fmtByte & 0x3f, (fmtByte & 0x80) != 0,
      bb.getShort(105) & 0xffff, count,
      bb.getDouble(131), bb.getDouble(139), bb.getDouble(147),
      bb.getDouble(155), bb.getDouble(163), bb.getDouble(171), vlrs,
      new String(bytes, 58, 32, "US-ASCII").takeWhile(_ != 0).trim)
  }

  /** Our own generating-software stamp: files we wrote decode exactly
    * (encoder and decoder share the reconstructed return-map tables). */
  private val OwnSoftware = "graft spark engine"

  /** The LASzip return-map tables are reconstructed, not transcribed
    * from the spec (Laszip.scala header note): an EXTERNALLY-encoded
    * multi-return LAZ whose (returns, return-number) pattern varies can
    * silently mis-predict coordinates after the first pattern change.
    * Until the published 16x16 tables are available to transcribe, make
    * that risk LOUD: watch the decoded return byte and warn once per
    * split the first time the pattern changes in a foreign file. */
  private def warnVaryingReturns(records: Iterator[Array[Byte]],
      retOff: Int, mask: Int, file: String, software: String): Iterator[Array[Byte]] =
    if (software == OwnSoftware) records
    else new Iterator[Array[Byte]] {
      private var first = -1
      private var warned = false
      override def hasNext: Boolean = records.hasNext
      override def next(): Array[Byte] = {
        val rec = records.next()
        val rb = rec(retOff) & mask
        if (first < 0) first = rb
        else if (rb != first && !warned) {
          warned = true
          org.slf4j.LoggerFactory.getLogger(classOf[Header]).warn(
            s"$file (generating software '$software'): LAZ stream with a " +
              "varying multi-return pattern — X/Y/Z prediction contexts use " +
              "reconstructed return-map tables, not the published ones " +
              "(sources/Laszip.scala header); cross-check a sample of this " +
              "file against the producing tool before trusting coordinates")
        }
        rec
      }
    }

  /** Core record length per point format (extras follow it). */
  private[sources] def coreLen(fmt: Int): Int = fmt match {
    case 8 => 38 // fmt6 + RGB + NIR
    case 7 => 36 // fmt6 + RGB
    case 6 => 30
    case 1 => 28
    case _ => 20
  }

  private[sources] def extraDims(h: Header): Seq[ExtraDim] = {
    var off = 0
    val dims = h.vlrs.filter(v => v.userId == "LASF_Spec" && v.recordId == 4).flatMap { v =>
      v.payload.grouped(192).filter(_.length == 192).map { d =>
        val dtype = d(2) & 0xff
        val opts = d(3) & 0xff
        val name = new String(d, 4, 32, "US-ASCII").takeWhile(_ != 0)
        val size = dtype match {
          case 0 => opts // raw blob: options field is the byte count
          case 1 | 2 => 1
          case 3 | 4 => 2
          case 5 | 6 | 9 => 4
          case 7 | 8 | 10 => 8
          case other => throw new IllegalArgumentException(
            s"extra bytes type $other deprecated/reserved")
        }
        val noData = ByteBuffer.wrap(d, 40, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
        val dim = ExtraDim(name, dtype, off, size,
          nullable = dtype != 0 && (opts & 1) == 1, noData)
        off += size
        dim
      }
    }
    require(dims.map(_.size).sum <= h.recLen - coreLen(h.fmt),
      s"extra bytes overflow record: ${dims.map(_.size).sum} > ${h.recLen - coreLen(h.fmt)}")
    dims
  }

  private[sources] def extraField(d: ExtraDim): StructField = d.dtype match {
    case 0 => StructField(d.name, BinaryType, nullable = false)
    case 9 | 10 => StructField(d.name, DoubleType, nullable = d.nullable)
    case _ => StructField(d.name, LongType, nullable = d.nullable)
  }

  /** Full LAS 1.4 format-6-family schema (formats 6/7/8), column names
    * as in the reference (sedona-pointcloud/src/las/schema.rs:50-95):
    * RGB columns for 7/8, NIR for 8. */
  def schema6(extras: Seq[StructField], fmt: Int = 6): StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("intensity", LongType, nullable = false),
    StructField("return_number", LongType, nullable = false),
    StructField("number_of_returns", LongType, nullable = false),
    StructField("is_synthetic", BooleanType, nullable = false),
    StructField("is_key_point", BooleanType, nullable = false),
    StructField("is_withheld", BooleanType, nullable = false),
    StructField("is_overlap", BooleanType, nullable = false),
    StructField("scanner_channel", LongType, nullable = false),
    StructField("scan_direction", LongType, nullable = false),
    StructField("is_edge_of_flight_line", BooleanType, nullable = false),
    StructField("classification", LongType, nullable = false),
    StructField("user_data", LongType, nullable = false),
    StructField("scan_angle", DoubleType, nullable = false),
    StructField("point_source_id", LongType, nullable = false),
    StructField("gps_time", DoubleType, nullable = false)) ++
    (if (fmt >= 7) Seq(
      StructField("red", LongType, nullable = false),
      StructField("green", LongType, nullable = false),
      StructField("blue", LongType, nullable = false)) else Nil) ++
    (if (fmt == 8) Seq(StructField("nir", LongType, nullable = false)) else Nil) ++
    extras)

  /** Raw stored extra-bytes value; null when the descriptor's no_data
    * bit is set and the value equals no_data (anytype low 8 bytes). */
  private def extraValue(rec: Array[Byte], base: Int, d: ExtraDim): Any = {
    val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
    val o = base + d.off
    d.dtype match {
      case 0 => java.util.Arrays.copyOfRange(rec, o, o + d.size)
      case 9 =>
        val v = bb.getFloat(o)
        // f32 no_data is stored widened to f64 in the anytype slot
        if (d.nullable && java.lang.Double.doubleToRawLongBits(v.toDouble) == d.noDataBits) null
        else v.toDouble
      case 10 =>
        val v = bb.getDouble(o)
        if (d.nullable && java.lang.Double.doubleToRawLongBits(v) == d.noDataBits) null else v
      case _ =>
        val bits: Long = d.dtype match {
          case 1 => rec(o) & 0xffL
          case 2 => rec(o).toLong
          case 3 => bb.getShort(o) & 0xffffL
          case 4 => bb.getShort(o).toLong
          case 5 => bb.getInt(o) & 0xffffffffL
          case 6 => bb.getInt(o).toLong
          case _ => bb.getLong(o)
        }
        if (d.nullable && bits == d.noDataBits) null else bits
    }
  }

  /** Read a .las/.laz file or directory of part files, one task per
    * file. Format 0/1 keeps the legacy compact schema; format 6 (LAS
    * 1.4, plain or LAZ) exposes the full field set + extra bytes. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory) {
        val parts = fs.listStatus(p).map(_.getPath)
          .filter { f =>
            val n = f.getName.toLowerCase
            n.endsWith(".las") || n.endsWith(".laz")
          }.sortBy(_.getName).toSeq
        require(parts.nonEmpty, s"LAS read: no .las/.laz files under $path")
        parts.map(_.toString)
      } else Seq(p.toString)
    }
    // probe the first header for the point format + extra dims
    val probe = {
      val fp = new org.apache.hadoop.fs.Path(files.head)
      parseHeader(readHeaderRegion(fs, fp, fs.getFileStatus(fp).getLen))
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration(conf))
    // COPC files are variable-chunk LAZ indexed by an octree hierarchy —
    // route through the hierarchy reader (a full read selects every node);
    // a DIRECTORY of COPC tiles (writeTiled output) unions per-tile reads
    if (probe.vlrs.exists(v => v.userId == "copc" && v.recordId == 1)) {
      return files.map(f => Copc.read(spark, f, None)).reduce(_ unionAll _)
    }
    if (probe.fmt >= 6 && probe.fmt <= 8)
      readFmt6(spark, files, probe.fmt, extraDims(probe), serConf)
    else {
      require(probe.fmt == 0 || probe.fmt == 1,
        s"LAS point format ${probe.fmt} not supported (0/1/6/7/8)")
      readLegacy(spark, files, probe.fmt == 1, serConf)
    }
  }

  /** One unit of parallel legacy work, mirroring [[Split6]]: mode 0 =
    * whole-file pointwise decode (compressor 1, or no usable chunk
    * table), 1 = uncompressed row range, 2 = one pointwise-chunked LAZ
    * chunk (seek-read `len` bytes at `off`). The tiny laszip VLR payload
    * travels with the split so chunk tasks decode without re-reading the
    * header. */
  private case class LegacySplit(file: String, mode: Int, off: Long, len: Long,
      expect: Long, recLen: Int,
      sx: Double, sy: Double, sz: Double, ox: Double, oy: Double, oz: Double,
      software: String, vlrPayload: Array[Byte])

  /** Legacy formats 0/1, plain or LAZ (pointwise compressors 1/2 via
    * [[Laszip.decodePointwise]]). Pointwise-CHUNKED files (compressor 2,
    * what this writer and laszip emit by default) split per chunk, so a
    * single huge legacy .laz fans out across the cluster exactly like
    * the fmt-6 path; plain .las splits by row ranges. */
  private def readLegacy(spark: SparkSession, files: Seq[String], withGps: Boolean,
      serConf: org.apache.spark.util.SerializableConfiguration): DataFrame = {
    val outSchema = schema(withGps)
    val splits: Seq[LegacySplit] = files.flatMap { f =>
      val fp = new org.apache.hadoop.fs.Path(f)
      val fs = fp.getFileSystem(serConf.value)
      val flen = fs.getFileStatus(fp).getLen
      val h = parseHeader(readHeaderRegion(fs, fp, flen))
      require(h.fmt == (if (withGps) 1 else 0), s"mixed LAS point formats under $f")
      if (!h.compressed) {
        val rowsPerSplit = math.max(1L, (64L << 20) / h.recLen)
        (0L until h.count by rowsPerSplit).map { i0 =>
          val n = math.min(rowsPerSplit, h.count - i0)
          LegacySplit(f, 1, h.pointOff + i0 * h.recLen, n * h.recLen, n, h.recLen,
            h.sx, h.sy, h.sz, h.ox, h.oy, h.oz, h.software, Array.emptyByteArray)
        }
      } else {
        val vlr = h.vlrs.find(v => v.userId == "laszip encoded" || v.recordId == 22204)
          .getOrElse(throw new IllegalArgumentException(s"$f: LAZ without laszip VLR"))
        val lz = Laszip.parseVlr(vlr.payload)
        val table =
          if (lz.compressor == 2 && lz.chunkSize > 0 && lz.chunkSize != -1) {
            val ctoBuf = new Array[Byte](8)
            val in = fs.open(fp)
            try {
              in.readFully(h.pointOff, ctoBuf)
              val cto = ByteBuffer.wrap(ctoBuf).order(ByteOrder.LITTLE_ENDIAN).getLong
              if (cto > h.pointOff && cto < flen && flen - cto <= (64L << 20)) {
                val tail = new Array[Byte]((flen - cto).toInt)
                in.readFully(cto, tail)
                Laszip.chunkSizes(tail).map(Laszip.offsetsFromSizes(_, h.pointOff + 8L))
              } else None
            } finally in.close()
          } else None
        table match {
          case Some(chunks) =>
            var remaining = h.count
            chunks.toSeq.map { case (off, len) =>
              val expect = math.min(lz.chunkSize.toLong, remaining)
              remaining -= expect
              LegacySplit(f, 2, off, len, expect, h.recLen,
                h.sx, h.sy, h.sz, h.ox, h.oy, h.oz, h.software, vlr.payload)
            }
          case None =>
            Seq(LegacySplit(f, 0, 0, flen, h.count, h.recLen,
              h.sx, h.sy, h.sz, h.ox, h.oy, h.oz, h.software, vlr.payload))
        }
      }
    }
    val rdd = spark.sparkContext.parallelize(splits, math.max(1, splits.length))
      .flatMap { sp =>
        def toRow(rec: Array[Byte], off: Int): Row = {
          val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
          val x = bb.getInt(off) * sp.sx + sp.ox
          val y = bb.getInt(off + 4) * sp.sy + sp.oy
          val z = bb.getInt(off + 8) * sp.sz + sp.oz
          val intensity = (bb.getShort(off + 12) & 0xffff).toLong
          val cls = (rec(off + 15) & 0xff).toLong
          if (withGps) Row(x, y, z, intensity, cls, bb.getDouble(off + 20))
          else Row(x, y, z, intensity, cls)
        }
        val fp = new org.apache.hadoop.fs.Path(sp.file)
        val fsx = fp.getFileSystem(serConf.value)
        sp.mode match {
          case 1 =>
            val buf = new Array[Byte](sp.len.toInt)
            val in = fsx.open(fp); in.readFully(sp.off, buf); in.close()
            (0 until sp.expect.toInt).iterator.map(i => toRow(buf, i * sp.recLen))
          case 2 =>
            val buf = new Array[Byte](sp.len.toInt)
            val in = fsx.open(fp); in.readFully(sp.off, buf); in.close()
            warnVaryingReturns(
              Laszip.decodePointwiseChunkRecords(buf, sp.expect,
                Laszip.parseVlr(sp.vlrPayload), sp.recLen).iterator,
              retOff = 14, mask = 0x3f, sp.file, sp.software).map(toRow(_, 0))
          case _ =>
            val (h, bytes) = loadFile(sp.file, serConf)
            warnVaryingReturns(
              Laszip.decodePointwise(bytes, h.pointOff, h.count,
                Laszip.parseVlr(sp.vlrPayload), h.recLen),
              retOff = 14, mask = 0x3f, sp.file, sp.software).map(toRow(_, 0))
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** One unit of parallel fmt-6 work. mode 0 = whole-file LAZ decode
    * (chunk table unavailable), 1 = uncompressed row range, 2 = one LAZ
    * chunk (seek-read `len` bytes at `off`). Scale/offset travel with
    * the split so mixed-grid directories read correctly. */
  private[sources] case class Split6(file: String, mode: Int, off: Long, len: Long,
      expect: Long, recLen: Int, fmt: Int,
      sx: Double, sy: Double, sz: Double, ox: Double, oy: Double, oz: Double,
      software: String = "")

  /** The LAZ chunk table turns chunks (50k points by default), not
    * files, into the split unit — a single huge .laz parallelizes across
    * the cluster; uncompressed .las splits by row ranges. */
  private def readFmt6(spark: SparkSession, files: Seq[String], fmt: Int,
      dims: Seq[ExtraDim],
      serConf: org.apache.spark.util.SerializableConfiguration): DataFrame = {
    val outSchema = schema6(dims.map(extraField), fmt)
    val dimsB = dims.toArray
    val splits: Seq[Split6] = files.flatMap { f =>
      val fp = new org.apache.hadoop.fs.Path(f)
      val fs = fp.getFileSystem(serConf.value)
      val flen = fs.getFileStatus(fp).getLen
      val h = parseHeader(readHeaderRegion(fs, fp, flen))
      require(h.fmt == fmt, s"mixed LAS point formats under $f")
      // extra-bytes layout is part of the shared schema: reject files
      // whose descriptors differ from the probe's instead of misreading
      require(extraDims(h) == dims,
        s"$f: extra-bytes descriptors differ from ${files.head}")
      lazy val in = fs.open(fp)
      val out =
        if (!h.compressed) {
          // split by bytes (not rows): records with wide extra-bytes
          // blocks must still fit an Int-sized task buffer
          val rowsPerSplit = math.max(1L, (64L << 20) / h.recLen)
          (0L until h.count by rowsPerSplit).map { i0 =>
            val n = math.min(rowsPerSplit, h.count - i0)
            Split6(f, 1, h.pointOff + i0 * h.recLen, n * h.recLen, n, h.recLen, h.fmt,
              h.sx, h.sy, h.sz, h.ox, h.oy, h.oz)
          }
        } else {
          val vlr = h.vlrs.find(v => v.userId == "laszip encoded" || v.recordId == 22204)
            .getOrElse(throw new IllegalArgumentException(s"$f: LAZ bit set but no laszip VLR"))
          val lz = Laszip.parseVlr(vlr.payload)
          val ctoBuf = new Array[Byte](8)
          in.readFully(h.pointOff, ctoBuf)
          val cto = ByteBuffer.wrap(ctoBuf).order(ByteOrder.LITTLE_ENDIAN).getLong
          // variable-size chunks (chunk_size == u32 max) carry per-chunk
          // counts we don't split on — sequential decode handles them
          val fixedChunks = lz.chunkSize > 0
          // a sane chunk table is tiny (a few bytes per 50k-point chunk)
          val table =
            if (fixedChunks && cto > h.pointOff && cto < flen && flen - cto <= (64L << 20)) {
              val tail = new Array[Byte]((flen - cto).toInt)
              in.readFully(cto, tail)
              Laszip.chunkSizes(tail).map(Laszip.offsetsFromSizes(_, h.pointOff + 8L))
            } else None
          in.close()
          table match {
            case Some(chunks) =>
              var remaining = h.count
              chunks.toSeq.map { case (off, len) =>
                val expect = math.min(lz.chunkSize.toLong, remaining)
                remaining -= expect
                Split6(f, 2, off, len, expect, h.recLen, h.fmt,
                  h.sx, h.sy, h.sz, h.ox, h.oy, h.oz, h.software)
              }
            case None =>
              Seq(Split6(f, 0, 0, flen, h.count, h.recLen, h.fmt,
                h.sx, h.sy, h.sz, h.ox, h.oy, h.oz, h.software))
          }
        }
      out
    }
    val rdd = spark.sparkContext.parallelize(splits, math.max(1, splits.length))
      .flatMap { sp =>
        val fp = new org.apache.hadoop.fs.Path(sp.file)
        val fsx = fp.getFileSystem(serConf.value)
        val records: Iterator[Array[Byte]] = sp.mode match {
          case 1 =>
            val buf = new Array[Byte](sp.len.toInt)
            val in = fsx.open(fp); in.readFully(sp.off, buf); in.close()
            (0 until sp.expect.toInt).iterator.map { i =>
              java.util.Arrays.copyOfRange(buf, i * sp.recLen, (i + 1) * sp.recLen)
            }
          case 2 =>
            val buf = new Array[Byte](sp.len.toInt)
            val in = fsx.open(fp); in.readFully(sp.off, buf); in.close()
            val rgbB = sp.fmt match { case 8 => 8; case 7 => 6; case _ => 0 }
            warnVaryingReturns(
              Laszip.decodeChunkRecords(buf, sp.expect, sp.recLen - 30 - rgbB,
                sp.recLen, rgbB).iterator,
              retOff = 14, mask = 0xff, sp.file, sp.software)
          case _ =>
            val (h, bytes) = loadFile(sp.file, serConf)
            val vlr = h.vlrs.find(v => v.userId == "laszip encoded" || v.recordId == 22204).get
            warnVaryingReturns(
              Laszip.decode(bytes, h.pointOff, h.count, Laszip.parseVlr(vlr.payload), h.recLen),
              retOff = 14, mask = 0xff, sp.file, sp.software)
        }
        records.map(recordToRow(_, sp, dimsB))
      }
    spark.createDataFrame(rdd, outSchema)
  }

  private[sources] def recordToRow(rec: Array[Byte], sp: Split6, dims: Array[ExtraDim]): Row = {
    val bb = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
    val flags = rec(15) & 0xff
    val nCore = 18 + (if (sp.fmt >= 7) 3 else 0) + (if (sp.fmt == 8) 1 else 0)
    val vals = new Array[Any](nCore + dims.length)
    vals(0) = bb.getInt(0) * sp.sx + sp.ox
    vals(1) = bb.getInt(4) * sp.sy + sp.oy
    vals(2) = bb.getInt(8) * sp.sz + sp.oz
    vals(3) = (bb.getShort(12) & 0xffff).toLong
    vals(4) = (rec(14) & 0x0f).toLong
    vals(5) = ((rec(14) >> 4) & 0x0f).toLong
    vals(6) = (flags & 1) != 0
    vals(7) = (flags & 2) != 0
    vals(8) = (flags & 4) != 0
    vals(9) = (flags & 8) != 0
    vals(10) = ((flags >> 4) & 0x03).toLong
    vals(11) = ((flags >> 6) & 0x01).toLong
    vals(12) = (flags & 0x80) != 0
    vals(13) = (rec(16) & 0xff).toLong
    vals(14) = (rec(17) & 0xff).toLong
    vals(15) = bb.getShort(18) * 0.006
    vals(16) = (bb.getShort(20) & 0xffff).toLong
    vals(17) = bb.getDouble(22)
    var at = 18
    if (sp.fmt >= 7) {
      vals(at) = (bb.getShort(30) & 0xffff).toLong
      vals(at + 1) = (bb.getShort(32) & 0xffff).toLong
      vals(at + 2) = (bb.getShort(34) & 0xffff).toLong
      at += 3
    }
    if (sp.fmt == 8) {
      vals(at) = (bb.getShort(36) & 0xffff).toLong
      at += 1
    }
    val base = coreLen(sp.fmt)
    var i = 0
    while (i < dims.length) {
      vals(at + i) = extraValue(rec, base, dims(i))
      i += 1
    }
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
  }

  /** Read exactly the header + VLR region: a first 512-byte peek yields
    * the offset-to-point-data, which bounds the region precisely (VLRs
    * always precede point data), so oversized VLR blocks are never
    * truncated at an arbitrary probe size. */
  private[sources] def readHeaderRegion(fsx: org.apache.hadoop.fs.FileSystem,
      fp: org.apache.hadoop.fs.Path, flen: Long): Array[Byte] = {
    val in = fsx.open(fp)
    try {
      val first = new Array[Byte](math.min(flen, 512L).toInt)
      in.readFully(0, first)
      if (first.length < 100) return first
      val pointOff = ByteBuffer.wrap(first).order(ByteOrder.LITTLE_ENDIAN)
        .getInt(96).toLong & 0xffffffffL
      val want = math.min(flen, math.max(first.length.toLong, pointOff))
      require(want <= (64L << 20), s"$fp: header+VLR region ${want}B exceeds 64 MB")
      if (want <= first.length) first
      else {
        val all = new Array[Byte](want.toInt)
        in.readFully(0, all)
        all
      }
    } finally in.close()
  }

  private def loadFile(f: String,
      serConf: org.apache.spark.util.SerializableConfiguration): (Header, Array[Byte]) = {
    val fp = new org.apache.hadoop.fs.Path(f)
    val fsx = fp.getFileSystem(serConf.value)
    val len = fsx.getFileStatus(fp).getLen
    require(len < Int.MaxValue,
      s"$f: ${len}B exceeds the whole-file decode limit (2 GB); " +
        "re-chunk the file or write it with a fixed-size chunk table")
    val bytes = new Array[Byte](len.toInt)
    val in = fsx.open(fp); in.readFully(0, bytes); in.close()
    (parseHeader(bytes), bytes)
  }
}
