package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, LineString, LinearRing, MultiLineString, MultiPoint, MultiPolygon, Point, Polygon}
import graft.geom.GeomIO

/** ESRI Shapefile reader/writer implemented directly on the public spec
  * (ESRI Shapefile Technical Description, 1998): .shp geometry stream +
  * .dbf (dBase III) attributes + .shx offset index. The reference reads
  * shapefiles through GDAL/pyogrio (python/sedonadb read.py:134-142);
  * here the format is hand-implemented so no native library is needed.
  *
  * Scale notes: like FlatGeobuf, one .shp is a sequential stream — the
  * reader parallelizes across FILES (one task per .shp), the writer emits
  * one .shp/.shx/.dbf trio per partition. Interchange format only; for
  * analytics at scale convert to GeoParquet.
  *
  * Supported: shape types Point/MultiPoint/PolyLine/Polygon (XY), one
  * geometry family per file (shapefile spec requirement — mixed input
  * errors loudly); attributes N (integral), F (floating, %.17G so doubles
  * round-trip bit-exactly), C (string, UTF-8), L (logical). Polygon
  * rings follow the spec orientation: outer CW, holes CCW; readers
  * re-assemble holes into their containing shells.
  */
object Shapefile {

  // shape type codes (spec table 1)
  private val TNull = 0; private val TPoint = 1; private val TPolyLine = 3
  private val TPolygon = 5; private val TMultiPoint = 8

  // ---------------------------------------------------------------- write

  private def shapeTypeOf(g: Geometry): Int = g match {
    case _: Point => TPoint
    case _: MultiPoint => TMultiPoint
    case _: LineString | _: MultiLineString => TPolyLine
    case _: Polygon | _: MultiPolygon => TPolygon
    case other => throw new IllegalArgumentException(
      s"Shapefile cannot store ${other.getGeometryType}")
  }

  /** Family promotion: Point+Point=Point, Line+MultiLine=PolyLine, ... */
  private def unify(a: Int, b: Int): Int = {
    if (a == TNull) return b
    if (b == TNull) return a
    require(a == b, s"Shapefile requires one geometry family per file: $a vs $b")
    a
  }

  private def ringCoords(r: LineString, clockwise: Boolean): Array[Coordinate] = {
    val cs = r.getCoordinates
    if (Orientation.isCCW(cs) == clockwise) cs.reverse else cs
  }

  /** Shape record body (after the 8-byte record header): LE type + data. */
  private def encodeShape(g: Geometry): Array[Byte] = {
    if (g == null) {
      val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(TNull); return bb.array()
    }
    val env = g.getEnvelopeInternal
    def header(bb: ByteBuffer, t: Int): Unit = {
      bb.putInt(t)
      bb.putDouble(env.getMinX); bb.putDouble(env.getMinY)
      bb.putDouble(env.getMaxX); bb.putDouble(env.getMaxY)
    }
    g match {
      case p: Point =>
        val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(TPoint); bb.putDouble(p.getX); bb.putDouble(p.getY)
        bb.array()
      case m: MultiPoint =>
        val cs = m.getCoordinates
        val bb = ByteBuffer.allocate(40 + 8 + cs.length * 16).order(ByteOrder.LITTLE_ENDIAN)
        header(bb, TMultiPoint); bb.putInt(cs.length)
        cs.foreach { c => bb.putDouble(c.x); bb.putDouble(c.y) }
        bb.array()
      case _: LineString | _: MultiLineString =>
        val parts = (0 until g.getNumGeometries).map(g.getGeometryN(_).getCoordinates)
        encodeParts(g, TPolyLine, parts)
      case _: Polygon | _: MultiPolygon =>
        val rings = (0 until g.getNumGeometries).flatMap { i =>
          val p = g.getGeometryN(i).asInstanceOf[Polygon]
          ringCoords(p.getExteriorRing, clockwise = true) +:
            (0 until p.getNumInteriorRing)
              .map(j => ringCoords(p.getInteriorRingN(j), clockwise = false))
        }
        encodeParts(g, TPolygon, rings)
      case other => throw new IllegalArgumentException(
        s"Shapefile cannot store ${other.getGeometryType}")
    }
  }

  private def encodeParts(g: Geometry, t: Int, parts: Seq[Array[Coordinate]]): Array[Byte] = {
    val npts = parts.map(_.length).sum
    val bb = ByteBuffer.allocate(40 + 8 + 4 * parts.length + 16 * npts)
      .order(ByteOrder.LITTLE_ENDIAN)
    val env = g.getEnvelopeInternal
    bb.putInt(t)
    bb.putDouble(env.getMinX); bb.putDouble(env.getMinY)
    bb.putDouble(env.getMaxX); bb.putDouble(env.getMaxY)
    bb.putInt(parts.length); bb.putInt(npts)
    var off = 0
    parts.foreach { p => bb.putInt(off); off += p.length }
    parts.foreach(_.foreach { c => bb.putDouble(c.x); bb.putDouble(c.y) })
    bb.array()
  }

  private case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  private def dbfFieldOf(f: StructField): DbfField = f.dataType match {
    case IntegerType | LongType => DbfField(f.name, 'N', 19, 0)
    // %.17G needs up to 24 chars (sign + 17 digits + point + E-308)
    case DoubleType | FloatType => DbfField(f.name, 'F', 25, 17)
    case BooleanType => DbfField(f.name, 'L', 1, 0)
    case StringType => DbfField(f.name, 'C', 254, 0)
    case other => throw new IllegalArgumentException(
      s"Shapefile attribute type not supported: $other (cast to long/double/string)")
  }

  private def fmtDouble(v: Double): String = {
    val s = "%.17G".format(v)
    if (s.length <= 25) s else "%.16G".format(v)
  }

  private def dbfBytes(fields: Seq[DbfField], rows: Seq[Row], idx: Seq[Int]): Array[Byte] = {
    val recSize = 1 + fields.map(_.len).sum
    val hdrSize = 32 + 32 * fields.length + 1
    val out = ByteBuffer.allocate(hdrSize + recSize * rows.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0x03.toByte); out.put(126.toByte); out.put(1.toByte); out.put(1.toByte)
    out.putInt(rows.length)
    out.putShort(hdrSize.toShort); out.putShort(recSize.toShort)
    out.position(out.position() + 20) // reserved
    fields.foreach { f =>
      val name = f.name.getBytes("US-ASCII").take(10)
      out.put(name); out.position(out.position() + (11 - name.length))
      out.put(f.typ.toByte)
      out.position(out.position() + 4)
      out.put(f.len.toByte); out.put(f.dec.toByte)
      out.position(out.position() + 14)
    }
    out.put(0x0d.toByte)
    rows.foreach { r =>
      out.put(' '.toByte) // not deleted
      fields.zipWithIndex.foreach { case (f, ci) =>
        val fi = idx(ci)
        val txt =
          if (r.isNullAt(fi)) ""
          else f.typ match {
            case 'N' => r.get(fi).toString
            case 'F' => fmtDouble(r.get(fi) match {
              case d: Double => d; case fl: Float => fl.toDouble
            })
            case 'L' => if (r.getBoolean(fi)) "T" else "F"
            case 'C' => r.getString(fi)
          }
        val bs = txt.getBytes("UTF-8")
        require(bs.length <= f.len, s"${f.name}: value too long for DBF (${bs.length})")
        if (f.typ == 'N' || f.typ == 'F') { // right-justified
          (bs.length until f.len).foreach(_ => out.put(' '.toByte))
          out.put(bs)
        } else {
          out.put(bs)
          (bs.length until f.len).foreach(_ => out.put(' '.toByte))
        }
      }
    }
    out.put(0x1a.toByte) // EOF
    out.array()
  }

  /** .shp main-file bytes + .shx index bytes for the encoded shapes. */
  private def shpBytes(shapes: Seq[Array[Byte]], shapeType: Int,
      bbox: (Double, Double, Double, Double)): (Array[Byte], Array[Byte]) = {
    val contentBytes = shapes.map(s => 8 + s.length).sum
    val shp = ByteBuffer.allocate(100 + contentBytes)
    val shx = ByteBuffer.allocate(100 + 8 * shapes.length)
    def fileHeader(bb: ByteBuffer, fileWords: Int): Unit = {
      bb.order(ByteOrder.BIG_ENDIAN)
      bb.putInt(9994); bb.position(24)
      bb.putInt(fileWords)
      bb.order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1000); bb.putInt(shapeType)
      bb.putDouble(bbox._1); bb.putDouble(bbox._2)
      bb.putDouble(bbox._3); bb.putDouble(bbox._4)
      bb.putDouble(0); bb.putDouble(0); bb.putDouble(0); bb.putDouble(0) // Z/M ranges
    }
    fileHeader(shp, (100 + contentBytes) / 2)
    fileHeader(shx, (100 + 8 * shapes.length) / 2)
    var offWords = 50
    shapes.zipWithIndex.foreach { case (s, i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1); shp.putInt(s.length / 2)
      shp.put(s)
      shx.order(ByteOrder.BIG_ENDIAN)
      shx.putInt(offWords); shx.putInt(s.length / 2)
      offWords += (8 + s.length) / 2
    }
    (shp.array(), shx.array())
  }

  /** Write `df` as shapefiles: one .shp/.shx/.dbf trio per partition under
    * `path`. The target directory is cleared first (overwrite semantics). */
  def write(df: DataFrame, path: String, geomCol: String): Unit = {
    val geomIdx = df.schema.fieldIndex(geomCol)
    val attrs = df.schema.fields.filterNot(_.name == geomCol).toSeq
    val fields = attrs.map(dbfFieldOf)
    val idx = attrs.map(f => df.schema.fieldIndex(f.name))
    val spark = df.sparkSession
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    locally {
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(conf)
      if (fs.exists(target)) fs.delete(target, true)
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    df.rdd.mapPartitionsWithIndex { (pid, rowIt) =>
      val rows = rowIt.toSeq
      if (rows.isEmpty) Iterator.empty
      else {
        var shapeType = TNull
        var xmin = Double.MaxValue; var ymin = Double.MaxValue
        var xmax = -Double.MaxValue; var ymax = -Double.MaxValue
        val shapes = rows.map { r =>
          if (r.isNullAt(geomIdx)) encodeShape(null)
          else {
            val g = GeomIO.read(r.getAs[Array[Byte]](geomIdx))
            shapeType = unify(shapeType, shapeTypeOf(g))
            val e = g.getEnvelopeInternal
            if (!e.isNull) {
              xmin = math.min(xmin, e.getMinX); ymin = math.min(ymin, e.getMinY)
              xmax = math.max(xmax, e.getMaxX); ymax = math.max(ymax, e.getMaxY)
            }
            encodeShape(g)
          }
        }
        val bbox = if (xmin <= xmax) (xmin, ymin, xmax, ymax) else (0.0, 0.0, 0.0, 0.0)
        val (shp, shx) = shpBytes(shapes, if (shapeType == TNull) TPoint else shapeType, bbox)
        val dbf = dbfBytes(fields, rows, idx)
        val base = f"part-$pid%05d"
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(serConf.value)
        Seq(("shp", shp), ("shx", shx), ("dbf", dbf)).foreach { case (ext, bytes) =>
          val os = fs.create(new org.apache.hadoop.fs.Path(path, s"$base.$ext"), true)
          os.write(bytes); os.close()
        }
        Iterator.single(1)
      }
    }.count(): Unit
  }

  // ----------------------------------------------------------------- read

  /** Assemble polygon rings (spec: CW shells, CCW holes) into (Multi)Polygon. */
  private def assemblePolygons(rings: Seq[Array[Coordinate]]): Geometry = {
    val f = GeomIO.factory
    val shells = new scala.collection.mutable.ArrayBuffer[(LinearRing,
      scala.collection.mutable.ArrayBuffer[LinearRing])]()
    val holes = new scala.collection.mutable.ArrayBuffer[LinearRing]()
    rings.foreach { cs =>
      val ring = f.createLinearRing(cs)
      if (!Orientation.isCCW(cs)) shells += ((ring, new scala.collection.mutable.ArrayBuffer))
      else holes += ring
    }
    if (shells.isEmpty) { // degenerate: all rings CCW — treat each as a shell
      val ps = holes.map(h => f.createPolygon(f.createLinearRing(h.getCoordinates.reverse)))
      return if (ps.length == 1) ps.head else f.createMultiPolygon(ps.toArray)
    }
    holes.foreach { h =>
      val pt = f.createPoint(h.getCoordinateN(0))
      val owner = shells.find { case (s, _) => f.createPolygon(s).covers(pt) }
        .getOrElse(shells.head)
      owner._2 += h
    }
    val ps = shells.map { case (s, hs) => f.createPolygon(s, hs.toArray) }
    if (ps.length == 1) ps.head else f.createMultiPolygon(ps.toArray)
  }

  private def decodeShape(bb: ByteBuffer): Geometry = {
    val f = GeomIO.factory
    bb.order(ByteOrder.LITTLE_ENDIAN)
    val t = bb.getInt
    t match {
      case TNull => null
      case TPoint => f.createPoint(new Coordinate(bb.getDouble, bb.getDouble))
      case TMultiPoint =>
        bb.position(bb.position() + 32) // bbox
        val n = bb.getInt
        f.createMultiPoint((0 until n).map(_ =>
          f.createPoint(new Coordinate(bb.getDouble, bb.getDouble))).toArray[Point])
      case TPolyLine | TPolygon =>
        bb.position(bb.position() + 32)
        val nparts = bb.getInt; val npts = bb.getInt
        val offs = Array.fill(nparts)(bb.getInt) :+ npts
        val all = Array.fill(npts)(new Coordinate(bb.getDouble, bb.getDouble))
        val parts = (0 until nparts).map(i => all.slice(offs(i), offs(i + 1)))
        if (t == TPolyLine) {
          val ls = parts.map(f.createLineString)
          if (ls.length == 1) ls.head else f.createMultiLineString(ls.toArray)
        } else assemblePolygons(parts)
      case other => throw new IllegalArgumentException(
        s"Shapefile shape type $other not supported (XY types only)")
    }
  }

  private def parseDbfHeader(bytes: Array[Byte]): (Seq[DbfField], Int, Int, Int) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(4)
    val nrec = bb.getInt
    val hdrSize = bb.getShort & 0xffff
    val recSize = bb.getShort & 0xffff
    val nFields = (hdrSize - 33) / 32
    val fields = (0 until nFields).map { i =>
      val p = 32 + i * 32
      val nameEnd = (p until p + 11).find(bytes(_) == 0).getOrElse(p + 11)
      DbfField(new String(bytes, p, nameEnd - p, "US-ASCII"),
        bytes(p + 11).toChar, bytes(p + 16) & 0xff, bytes(p + 17) & 0xff)
    }
    (fields, nrec, hdrSize, recSize)
  }

  private def dbfDataType(f: DbfField): DataType = f.typ match {
    case 'N' => if (f.dec == 0) LongType else DoubleType
    case 'F' => DoubleType
    case 'L' => BooleanType
    case 'C' | 'D' => StringType
    case other => throw new IllegalArgumentException(s"DBF field type $other not supported")
  }

  private def parseDbfValue(f: DbfField, raw: String): Any = {
    val s = raw.trim
    if (s.isEmpty) null
    else f.typ match {
      case 'N' => if (f.dec == 0) s.toLong else s.toDouble
      case 'F' => s.toDouble
      case 'L' => s == "T" || s == "t" || s == "Y" || s == "y"
      case 'C' | 'D' => raw.reverse.dropWhile(_ == ' ').reverse
    }
  }

  /** Read a .shp file or a directory of part-*.shp (parallel per file).
    * Attributes come from the sibling .dbf; geometry lands in `geomCol`. */
  def read(spark: SparkSession, path: String, geomCol: String = "geometry"): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val shpFiles: Seq[org.apache.hadoop.fs.Path] = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory) {
        val parts = fs.listStatus(p).map(_.getPath)
          .filter(_.getName.toLowerCase.endsWith(".shp")).sortBy(_.getName).toSeq
        require(parts.nonEmpty, s"Shapefile read: no .shp files under $path")
        parts
      } else Seq(p)
    }
    def dbfOf(shp: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
      new org.apache.hadoop.fs.Path(shp.getParent,
        shp.getName.replaceAll("(?i)\\.shp$", ".dbf"))
    val firstDbf = {
      val f = dbfOf(shpFiles.head)
      require(fs.exists(f), s"Shapefile read: missing sibling ${f.getName}")
      val in = fs.open(f)
      val head = new Array[Byte](math.min(fs.getFileStatus(f).getLen, 65536L).toInt)
      in.readFully(0, head); in.close()
      head
    }
    val (fields, _, _, _) = parseDbfHeader(firstDbf)
    val sparkSchema = StructType(
      fields.map(f => StructField(f.name, dbfDataType(f))) :+
        StructField(geomCol, BinaryType))
    val fieldsB = fields
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration(conf))
    val pathStrs = shpFiles.map(_.toString)
    val rdd = spark.sparkContext.parallelize(pathStrs, pathStrs.length).flatMap { shpStr =>
      val shpPath = new org.apache.hadoop.fs.Path(shpStr)
      val fsx = shpPath.getFileSystem(serConf.value)
      def readAll(pp: org.apache.hadoop.fs.Path): Array[Byte] = {
        val len = fsx.getFileStatus(pp).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fsx.open(pp); in.readFully(0, buf); in.close(); buf
      }
      val shp = readAll(shpPath)
      val dbf = readAll(new org.apache.hadoop.fs.Path(shpPath.getParent,
        shpPath.getName.replaceAll("(?i)\\.shp$", ".dbf")))
      val (dFields, nrec, hdrSize, recSize) = parseDbfHeader(dbf)
      require(dFields == fieldsB, s"Shapefile schema mismatch in $shpStr")
      val geoms = new scala.collection.mutable.ArrayBuffer[Geometry]()
      val bb = ByteBuffer.wrap(shp)
      var pos = 100
      while (pos + 8 <= shp.length) {
        bb.order(ByteOrder.BIG_ENDIAN)
        bb.position(pos + 4)
        val contentWords = bb.getInt
        bb.position(pos + 8)
        geoms += decodeShape(bb)
        pos += 8 + contentWords * 2
      }
      require(geoms.length == nrec,
        s"Shapefile $shpStr: ${geoms.length} shapes vs $nrec dbf records")
      (0 until nrec).iterator.map { i =>
        val base = hdrSize + i * recSize
        var off = base + 1 // skip deletion flag
        val vals = dFields.map { f =>
          val v = parseDbfValue(f, new String(dbf, off, f.len, "UTF-8"))
          off += f.len
          v
        }
        val g = geoms(i)
        Row.fromSeq(vals :+ (if (g == null) null else GeomIO.write(g)))
      }
    }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
