package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, LineString, LinearRing, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon}
import graft.geom.GeomIO
import graft.sources.fgb.FlatBuf

/** FlatGeobuf reader/writer (public spec: magic bytes + size-prefixed
  * FlatBuffers Header, optional packed Hilbert R-tree index, stream of
  * size-prefixed Feature buffers). The reference reads FGB via GDAL
  * (python/sedonadb read.py:134-142); here the format is implemented
  * directly on the spec so no native library is needed.
  *
  * Scale notes: FGB is a single-stream interchange format — features are
  * size-prefixed back to back, so one file is not block-splittable without
  * the spatial index. The reader therefore parallelizes across FILES
  * (spark.binaryFiles); the writer emits one .fgb per partition. For
  * analytics at scale, convert to GeoParquet (`GeoParquet.write`) — FGB
  * support exists for interchange with the GIS ecosystem.
  *
  * Supported: geometry types Point/LineString/Polygon/MultiPoint/
  * MultiLineString/MultiPolygon, XY coordinates, property types
  * Bool/Int/Long/Double/String; `write(index = true)` emits a packed
  * Hilbert R-tree per file (inner nodes store first-child node indices,
  * leaves store feature byte offsets, per the flatgeobuf spec) which
  * bbox reads traverse.
  * `ends` holds exclusive end indices into the flat xy array (in doubles).
  */
object FlatGeobuf {

  private val Magic = Array[Byte](0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x00)

  // ColumnType enum (header.fbs)
  private val TBool = 2; private val TInt = 5; private val TLong = 7
  private val TDouble = 10; private val TString = 11

  // GeometryType enum (header.fbs)
  private val GPoint = 1; private val GLine = 2; private val GPoly = 3
  private val GMPoint = 4; private val GMLine = 5; private val GMPoly = 6

  private def columnTypeOf(dt: DataType): Int = dt match {
    case BooleanType => TBool
    case IntegerType => TInt
    case LongType => TLong
    case DoubleType => TDouble
    case StringType => TString
    case other => throw new IllegalArgumentException(
      s"FlatGeobuf property type not supported: $other (cast to long/double/string)")
  }

  // ---- geometry encode/decode ----

  private def flatXY(cs: Array[Coordinate]): Array[Double] = {
    val out = new Array[Double](cs.length * 2)
    var i = 0
    while (i < cs.length) { out(2 * i) = cs(i).x; out(2 * i + 1) = cs(i).y; i += 1 }
    out
  }

  /** Build a Geometry table; returns its offset. */
  private def writeGeometry(b: FlatBuf.Builder, g: Geometry): Int = g match {
    case p: Point =>
      val xy = b.createDoubleVector(if (p.isEmpty) Array.empty else flatXY(p.getCoordinates))
      b.startTable(); b.slotRef(1, xy); b.slotByte(6, GPoint.toByte); b.endTable()
    case l: LineString =>
      val xy = b.createDoubleVector(flatXY(l.getCoordinates))
      b.startTable(); b.slotRef(1, xy); b.slotByte(6, GLine.toByte); b.endTable()
    case p: Polygon =>
      val rings = Seq(p.getExteriorRing) ++
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
      val coords = rings.map(r => flatXY(r.getCoordinates))
      val ends = coords.scanLeft(0)(_ + _.length).tail.toArray
      val xy = b.createDoubleVector(coords.toArray.flatten)
      val endsV = if (rings.length > 1) b.createUIntVector(ends) else 0
      b.startTable(); b.slotRef(0, endsV); b.slotRef(1, xy)
      b.slotByte(6, GPoly.toByte); b.endTable()
    case m: MultiPoint =>
      val xy = b.createDoubleVector(flatXY(m.getCoordinates))
      b.startTable(); b.slotRef(1, xy); b.slotByte(6, GMPoint.toByte); b.endTable()
    case m: MultiLineString =>
      val parts = (0 until m.getNumGeometries).map(i =>
        flatXY(m.getGeometryN(i).getCoordinates))
      val ends = parts.scanLeft(0)(_ + _.length).tail.toArray
      val xy = b.createDoubleVector(parts.toArray.flatten)
      val endsV = if (parts.length > 1) b.createUIntVector(ends) else 0
      b.startTable(); b.slotRef(0, endsV); b.slotRef(1, xy)
      b.slotByte(6, GMLine.toByte); b.endTable()
    case m: MultiPolygon =>
      val parts = (0 until m.getNumGeometries)
        .map(i => writeGeometry(b, m.getGeometryN(i))).toArray
      val pv = b.createRefVector(parts)
      b.startTable(); b.slotByte(6, GMPoly.toByte); b.slotRef(7, pv); b.endTable()
    case other => throw new IllegalArgumentException(
      s"FlatGeobuf geometry type not supported: ${other.getGeometryType}")
  }

  private def ringsOf(xy: Array[Double], ends: Array[Int]): Seq[Array[Coordinate]] = {
    val bounds = if (ends == null || ends.isEmpty) Array(xy.length) else ends
    var start = 0
    bounds.toSeq.map { end =>
      val cs = new Array[Coordinate]((end - start) / 2)
      var i = 0
      while (i < cs.length) {
        cs(i) = new Coordinate(xy(start + 2 * i), xy(start + 2 * i + 1)); i += 1
      }
      start = end
      cs
    }
  }

  private def readGeometry(t: FlatBuf.Table, gtype: Int): Geometry = {
    val f = GeomIO.factory
    val typ = { val tt = t.getByte(6, 0); if (tt != 0) tt.toInt else gtype }
    typ match {
      case GPoint =>
        val xy = t.getDoubleVector(1)
        if (xy == null || xy.isEmpty) f.createPoint()
        else f.createPoint(new Coordinate(xy(0), xy(1)))
      case GLine =>
        f.createLineString(ringsOf(t.getDoubleVector(1), null).head)
      case GPoly =>
        val rings = ringsOf(t.getDoubleVector(1), t.getUIntVector(0))
          .map(cs => f.createLinearRing(cs))
        f.createPolygon(rings.head, rings.tail.toArray[LinearRing])
      case GMPoint =>
        val cs = ringsOf(t.getDoubleVector(1), null).head
        f.createMultiPoint(cs.map(c => f.createPoint(c)))
      case GMLine =>
        val parts = ringsOf(t.getDoubleVector(1), t.getUIntVector(0))
        f.createMultiLineString(parts.map(cs => f.createLineString(cs)).toArray)
      case GMPoly =>
        val pv = t.vector(7)
        val polys = (0 until pv._2).map { i =>
          readGeometry(t.tableAt(pv, i), GPoly).asInstanceOf[Polygon]
        }
        f.createMultiPolygon(polys.toArray)
      case other =>
        throw new IllegalArgumentException(s"FlatGeobuf geometry type $other not supported")
    }
  }

  // ---- properties encode/decode (u16 column index + LE value each) ----

  private def writeProps(schema: Seq[(String, Int)], row: Row,
      idx: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def u64(v: Long): Unit = { u32((v & 0xffffffffL).toInt); u32((v >>> 32).toInt) }
    schema.zipWithIndex.foreach { case ((_, typ), ci) =>
      val fi = idx(ci)
      if (!row.isNullAt(fi)) {
        u16(ci)
        typ match {
          case TBool => out.write(if (row.getBoolean(fi)) 1 else 0)
          case TInt => u32(row.getInt(fi))
          case TLong => u64(row.getLong(fi))
          case TDouble => u64(java.lang.Double.doubleToLongBits(row.getDouble(fi)))
          case TString =>
            val bs = row.getString(fi).getBytes("UTF-8")
            u32(bs.length); out.write(bs)
        }
      }
    }
    out.toByteArray
  }

  private def readProps(schema: Seq[(String, Int)], bytes: Array[Byte]): Array[Any] = {
    val out = new Array[Any](schema.length)
    if (bytes == null) return out
    var p = 0
    def u16(): Int = { val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v }
    def u32(): Int = u16() | (u16() << 16)
    def u64(): Long = (u32() & 0xffffffffL) | (u32().toLong << 32)
    while (p < bytes.length) {
      val ci = u16()
      schema(ci)._2 match {
        case TBool => out(ci) = bytes(p) != 0; p += 1
        case TInt => out(ci) = u32()
        case TLong => out(ci) = u64()
        case TDouble => out(ci) = java.lang.Double.longBitsToDouble(u64())
        case TString =>
          val len = u32()
          out(ci) = new String(bytes, p, len, "UTF-8"); p += len
      }
    }
    out
  }

  private def writeColumn(b: FlatBuf.Builder, name: String, typ: Int): Int = {
    val n = b.createString(name)
    b.startTable(); b.slotRef(0, n); b.slotByte(1, typ.toByte); b.endTable()
  }

  private val NodeSize = 16

  /** One complete .fgb byte stream for an iterator of (geom, row). When
    * `index` is set and every geometry is non-null, features are
    * Hilbert-sorted and a packed R-tree (40-byte nodes, root level first,
    * leaf offsets = feature byte offsets) is written between header and
    * features. */
  private def encodeFile(schema: Seq[(String, Int)], geomIdx: Int,
      propIdx: Seq[Int], rows: Iterator[Row], index: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    var features = new scala.collection.mutable.ArrayBuffer[
      (Array[Byte], org.locationtech.jts.geom.Envelope)]()
    var anyNullGeom = false
    rows.foreach { r =>
      val b = new FlatBuf.Builder(256)
      val props = writeProps(schema, r, propIdx)
      val propsV = if (props.nonEmpty) b.createByteVector(props) else 0
      var env: org.locationtech.jts.geom.Envelope = null
      val geomOff =
        if (r.isNullAt(geomIdx)) { anyNullGeom = true; 0 }
        else {
          val g = GeomIO.read(r.getAs[Array[Byte]](geomIdx))
          env = g.getEnvelopeInternal
          writeGeometry(b, g)
        }
      b.startTable(); b.slotRef(0, geomOff); b.slotRef(1, propsV)
      features += ((b.finishSizePrefixed(b.endTable()), env))
    }
    val withIndex = index && !anyNullGeom && features.nonEmpty
    if (withIndex) {
      // Hilbert order over the file extent (FGB index precondition)
      val xs0 = features.map(_._2.getMinX).min; val ys0 = features.map(_._2.getMinY).min
      val xs1 = features.map(_._2.getMaxX).max; val ys1 = features.map(_._2.getMaxY).max
      features = features.sortBy { case (_, e) =>
        graft.functions.SpaceCurve.hilbert(
          GeomIO.point((e.getMinX + e.getMaxX) / 2, (e.getMinY + e.getMaxY) / 2),
          xs0, ys0, math.max(xs1, xs0 + 1e-9), math.max(ys1, ys0 + 1e-9))
      }
    }
    val hb = new FlatBuf.Builder(512)
    val cols = schema.map { case (n, t) => writeColumn(hb, n, t) }.toArray
    val colsV = if (cols.nonEmpty) hb.createRefVector(cols) else 0
    val name = hb.createString("graft")
    hb.startTable()
    hb.slotRef(0, name)
    hb.slotByte(2, 0) // geometry_type Unknown: per-feature types
    hb.slotRef(7, colsV)
    hb.slotLong(8, features.length.toLong)
    hb.slotShort(9, if (withIndex) NodeSize.toShort else 0, default = 16)
    out.write(hb.finishSizePrefixed(hb.endTable()))
    if (withIndex) out.write(buildIndex(features.toSeq))
    features.foreach(f => out.write(f._1))
    out.toByteArray
  }

  /** Level sizes from leaf to root for `n` items. */
  private def levelSizes(n: Long, nodeSize: Int): Seq[Long] = {
    var sizes = List(n)
    while (sizes.head != 1) sizes ::= (sizes.head + nodeSize - 1) / nodeSize
    sizes // root first
  }

  /** Packed Hilbert R-tree bytes: 40-byte nodes (bbox f64 x4 + u64
    * offset), root level first, leaves last; leaf offsets address the
    * feature stream (byte offsets), internal offsets hold the NODE
    * INDEX of the first child — matching the flatgeobuf packed-rtree
    * layout so conformant readers (GDAL, flatgeobuf-js/rust) traverse
    * our index correctly. */
  private def buildIndex(
      features: Seq[(Array[Byte], org.locationtech.jts.geom.Envelope)]): Array[Byte] = {
    case class Node(var x0: Double, var y0: Double, var x1: Double, var y1: Double,
      var off: Long)
    val sizes = levelSizes(features.length.toLong, NodeSize) // root..leaf
    val starts = sizes.scanLeft(0L)(_ + _).init // node-index start per level
    val total = sizes.sum
    val nodes = new Array[Node](total.toInt)
    // leaves
    val leafStart = starts.last.toInt
    var featOff = 0L
    features.zipWithIndex.foreach { case ((bytes, e), i) =>
      nodes(leafStart + i) = Node(e.getMinX, e.getMinY, e.getMaxX, e.getMaxY, featOff)
      featOff += bytes.length
    }
    // internal levels, bottom-up
    for (li <- sizes.length - 2 to 0 by -1) {
      val childStart = starts(li + 1).toInt
      val childCount = sizes(li + 1).toInt
      val myStart = starts(li).toInt
      var c = 0
      var p = 0
      while (c < childCount) {
        val end = math.min(c + NodeSize, childCount)
        val n = Node(Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue,
          (childStart + c).toLong) // first-child node index (spec), not a byte offset
        var i = c
        while (i < end) {
          val ch = nodes(childStart + i)
          if (ch.x0 < n.x0) n.x0 = ch.x0; if (ch.y0 < n.y0) n.y0 = ch.y0
          if (ch.x1 > n.x1) n.x1 = ch.x1; if (ch.y1 > n.y1) n.y1 = ch.y1
          i += 1
        }
        nodes(myStart + p) = n
        p += 1
        c = end
      }
    }
    val bb = java.nio.ByteBuffer.allocate(total.toInt * 40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nodes.foreach { n =>
      bb.putDouble(n.x0); bb.putDouble(n.y0); bb.putDouble(n.x1); bb.putDouble(n.y1)
      bb.putLong(n.off)
    }
    bb.array()
  }

  /** Feature byte offsets (within the feature stream) whose index bbox
    * intersects the query window. */
  private def searchIndex(bytes: Array[Byte], indexStart: Int, numItems: Long,
      nodeSize: Int, q: (Double, Double, Double, Double)): Seq[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sizes = levelSizes(numItems, nodeSize)
    val starts = sizes.scanLeft(0L)(_ + _).init
    val leafStart = starts.last
    val levelEnd = starts.zip(sizes).map { case (s, n) => s + n }
    def nodeBox(i: Long): (Double, Double, Double, Double, Long) = {
      val p = indexStart + i.toInt * 40
      (bb.getDouble(p), bb.getDouble(p + 8), bb.getDouble(p + 16), bb.getDouble(p + 24),
        bb.getLong(p + 32))
    }
    val hits = scala.collection.mutable.ArrayBuffer[Long]()
    val stack = scala.collection.mutable.Stack[(Long, Int)]() // nodeIdx, level
    (0L until sizes.head).foreach(i => stack.push((i, 0)))
    while (stack.nonEmpty) {
      val (idx, lvl) = stack.pop()
      val (x0, y0, x1, y1, off) = nodeBox(idx)
      if (x0 <= q._3 && x1 >= q._1 && y0 <= q._4 && y1 >= q._2) {
        if (idx >= leafStart) hits += off
        else {
          val childStart = off // node index of first child (spec)
          val end = math.min(childStart + nodeSize, levelEnd(lvl + 1))
          (childStart until end).foreach(i => stack.push((i, lvl + 1)))
        }
      }
    }
    hits.toSeq
  }

  /** Packed Hilbert R-tree size (skip-only): 40 bytes per node. */
  private def indexBytes(numItems: Long, nodeSize: Int): Long = {
    if (numItems == 0 || nodeSize == 0) return 0L
    var n = numItems
    var total = n
    while (n != 1) { n = (n + nodeSize - 1) / nodeSize; total += n }
    total * 40L
  }

  /** Write `df` as FlatGeobuf: one .fgb file per partition under `path`.
    * With `index = true` each file carries a packed Hilbert R-tree over
    * its (Hilbert-sorted) features, enabling bbox-filtered reads. */
  def write(df: DataFrame, path: String, geomCol: String, index: Boolean = false): Unit = {
    val schema = df.schema.fields.filterNot(_.name == geomCol)
      .map(f => (f.name, columnTypeOf(f.dataType))).toSeq
    val geomIdx = df.schema.fieldIndex(geomCol)
    val propIdx = df.schema.fields.filterNot(_.name == geomCol)
      .map(f => df.schema.fieldIndex(f.name)).toSeq
    val spark = df.sparkSession
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    // Overwrite semantics: a rewrite with fewer partitions must not leave
    // stale part-*.fgb files from a previous write mixed into later reads.
    locally {
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(conf)
      if (fs.exists(target)) fs.delete(target, true)
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val written = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val bytes = encodeFile(schema, geomIdx, propIdx, rows, index)
        val p = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.fgb")
        val fs = p.getFileSystem(serConf.value)
        val os = fs.create(p, true)
        os.write(bytes); os.close()
        Iterator.single(1)
      }
    }.count()
    // an all-empty input must still yield a readable dataset: one
    // zero-feature file carrying the schema
    if (written == 0L) {
      val bytes = encodeFile(schema, geomIdx, propIdx, Iterator.empty, index = false)
      val p = new org.apache.hadoop.fs.Path(path, "part-00000.fgb")
      val fs = p.getFileSystem(conf)
      val os = fs.create(p, true)
      os.write(bytes); os.close()
    }
  }

  private def decodeHeader(bytes: Array[Byte]): (Seq[(String, Int)], Int, Long, Int, Int) = {
    // byte 7 is the PATCH version (0x00 ours, 0x01 in GDAL-written
    // files) — the spec says readers must not reject on it
    require(bytes.length > 12 && (0 until 7).forall(i => bytes(i) == Magic(i)),
      "not a FlatGeobuf file (bad magic)")
    val (h, consumed) = FlatBuf.rootSizePrefixed(bytes, 8)
    val cols = {
      val v = h.vector(7)
      if (v == null) Seq.empty
      else (0 until v._2).map { i =>
        val c = h.tableAt(v, i)
        (c.getString(0), c.getByte(1, 0).toInt)
      }
    }
    val gtype = h.getByte(2, 0).toInt
    val count = h.getLong(8, 0)
    val nodeSize = h.getShort(9, 16).toInt
    (cols, gtype, count, nodeSize, 8 + consumed)
  }

  /** Read a .fgb file or a directory of part-*.fgb (parallel per file).
    * `bbox` = (xmin, ymin, xmax, ymax) prefilters features by envelope:
    * indexed files are searched through the packed R-tree and only hit
    * features are decoded; unindexed files filter after decode. */
  def read(spark: SparkSession, path: String, geomCol: String = "geometry",
      bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val first = {
      val st = fs.getFileStatus(p)
      val f = if (st.isDirectory) {
        val parts = fs.listStatus(p).filter(_.getPath.getName.endsWith(".fgb"))
        require(parts.nonEmpty, s"FlatGeobuf read: no .fgb files under $path")
        parts.head.getPath
      } else p
      val fileLen = fs.getFileStatus(f).getLen
      require(fileLen > 12, s"FlatGeobuf read: $f too short (${fileLen}B)")
      val in = fs.open(f)
      // magic (8B) + u32 size prefix → exact header extent; no arbitrary cap
      val prefix = new Array[Byte](12)
      in.readFully(0, prefix)
      val hdrSize = (prefix(8) & 0xff) | ((prefix(9) & 0xff) << 8) |
        ((prefix(10) & 0xff) << 16) | ((prefix(11) & 0xff) << 24)
      val head = new Array[Byte](math.min(12L + hdrSize.toLong, fileLen).toInt)
      in.readFully(0, head); in.close()
      head
    }
    val (schema, _, _, _, _) = decodeHeader(first)
    val sparkSchema = StructType(schema.map { case (n, t) =>
      StructField(n, t match {
        case TBool => BooleanType
        case TInt => IntegerType
        case TLong => LongType
        case TDouble => DoubleType
        case TString => StringType
      })
    } :+ StructField(geomCol, BinaryType))
    val schemaB = schema
    val rdd = spark.sparkContext.binaryFiles(path + (if (fs.getFileStatus(p).isDirectory) "/*.fgb" else ""))
      .flatMap { case (_, stream) =>
        val bytes = stream.toArray()
        val (cols, gtype, count, nodeSize, afterHeader) = decodeHeader(bytes)
        require(cols == schemaB, s"FlatGeobuf schema mismatch: $cols vs $schemaB")
        val featureStart = afterHeader + indexBytes(count, nodeSize).toInt
        def decode(pos: Int): (Row, Int) = {
          val (ft, consumed) = FlatBuf.rootSizePrefixed(bytes, pos)
          val props = readProps(cols, ft.getByteVector(1))
          val gt = ft.getTable(0)
          val g = if (gt == null) null else readGeometry(gt, gtype)
          val keep = bbox.forall { case (x0, y0, x1, y1) =>
            g != null && {
              val e = g.getEnvelopeInternal
              e.getMinX <= x1 && e.getMaxX >= x0 && e.getMinY <= y1 && e.getMaxY >= y0
            }
          }
          (if (keep) Row.fromSeq(props.toSeq :+ (if (g == null) null else GeomIO.write(g)))
           else null, consumed)
        }
        val out = new scala.collection.mutable.ArrayBuffer[Row]()
        bbox match {
          case Some(q) if nodeSize > 0 && count > 0 =>
            // R-tree candidates only — the rest of the file is skipped
            searchIndex(bytes, afterHeader, count, nodeSize, q).foreach { off =>
              val (row, _) = decode(featureStart + off.toInt)
              if (row != null) out += row
            }
          case _ =>
            var pos = featureStart
            while (pos < bytes.length) {
              val (row, consumed) = decode(pos)
              pos += consumed
              if (row != null) out += row
            }
        }
        out
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
