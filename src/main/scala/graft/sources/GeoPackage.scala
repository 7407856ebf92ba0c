package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry
import graft.geom.GeomIO
import graft.sources.gpkg.Sqlite

/** GeoPackage reader/writer on a hand-implemented SQLite core (no native
  * deps). The reference reads .gpkg via GDAL/pyogrio (python/sedonadb
  * read.py:134-142); here both the SQLite container format and the
  * GeoPackage layer (OGC 12-128r19: GPB geometry blobs, gpkg_contents /
  * gpkg_geometry_columns / gpkg_spatial_ref_sys) are implemented on the
  * published specs.
  *
  * Scale notes: a .gpkg is one SQLite file — not block-splittable. The
  * reader parallelizes across FILES, the writer emits one .gpkg per
  * partition (each a complete, conformant package). Interchange format;
  * convert to GeoParquet for analytics at scale.
  *
  * Supported: any JTS geometry type (generic GEOMETRY column), attributes
  * INTEGER/REAL/TEXT/BLOB, fid = rowid, feature tables listed in
  * gpkg_contents. GPB blobs are written little-endian with XY envelopes.
  */
object GeoPackage {

  // ---------------------------------------------------------- GPB blobs

  /** GeoPackageBinary: magic GP, version 0, flags (LE + XY envelope),
    * srs_id, envelope, WKB. */
  private def encodeGpb(g: Geometry, srid: Int): Array[Byte] = {
    val wkb = GeomIO.writePlain(g)
    val empty = g.isEmpty
    val envInd = if (empty) 0 else 1
    val flags = 0x01 | (envInd << 1) | (if (empty) 0x10 else 0)
    val bb = ByteBuffer.allocate(8 + (if (empty) 0 else 32) + wkb.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put('G'.toByte); bb.put('P'.toByte); bb.put(0.toByte); bb.put(flags.toByte)
    bb.putInt(srid)
    if (!empty) {
      val e = g.getEnvelopeInternal
      bb.putDouble(e.getMinX); bb.putDouble(e.getMaxX)
      bb.putDouble(e.getMinY); bb.putDouble(e.getMaxY)
    }
    bb.put(wkb)
    bb.array()
  }

  private def decodeGpb(blob: Array[Byte]): Geometry = {
    require(blob.length >= 8 && blob(0) == 'G' && blob(1) == 'P',
      "not a GeoPackage geometry blob")
    val flags = blob(3) & 0xff
    require((flags & 0x20) == 0, "extended GPB geometry not supported")
    val envInd = (flags >> 1) & 0x07
    val envBytes = envInd match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => throw new IllegalArgumentException(s"GPB envelope indicator $other")
    }
    val wkbStart = 8 + envBytes
    GeomIO.read(java.util.Arrays.copyOfRange(blob, wkbStart, blob.length))
  }

  // ----------------------------------------------------------------- write

  private val LastChange = "2026-01-01T00:00:00.000Z" // deterministic stamp

  private def sqlType(dt: DataType): String = dt match {
    case IntegerType | LongType => "INTEGER"
    case DoubleType | FloatType => "REAL"
    case StringType => "TEXT"
    case BooleanType => "INTEGER"
    case BinaryType => "BLOB"
    case other => throw new IllegalArgumentException(
      s"GeoPackage attribute type not supported: $other (cast to long/double/string)")
  }

  private def gpkgFileBytes(rows: Seq[Row], schema: StructType, geomIdx: Int,
      table: String, srid: Int): Array[Byte] = {
    val attrs = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = -Double.MaxValue; var ymax = -Double.MaxValue
    val featureRows = rows.zipWithIndex.map { case (r, i) =>
      val geomVal: Any =
        if (r.isNullAt(geomIdx)) null
        else {
          val g = GeomIO.read(r.getAs[Array[Byte]](geomIdx))
          val e = g.getEnvelopeInternal
          if (!e.isNull) {
            xmin = math.min(xmin, e.getMinX); ymin = math.min(ymin, e.getMinY)
            xmax = math.max(xmax, e.getMaxX); ymax = math.max(ymax, e.getMaxY)
          }
          encodeGpb(g, srid)
        }
      // fid is INTEGER PRIMARY KEY (= rowid alias): stored as NULL
      Seq[Any](null, geomVal) ++ attrs.map { case (f, fi) =>
        if (r.isNullAt(fi)) null
        else f.dataType match {
          case IntegerType => r.getInt(fi).toLong
          case LongType => r.getLong(fi)
          case FloatType => r.getFloat(fi).toDouble
          case DoubleType => r.getDouble(fi)
          case BooleanType => if (r.getBoolean(fi)) 1L else 0L
          case StringType => r.getString(fi)
          case BinaryType => r.getAs[Array[Byte]](fi)
          case other => throw new IllegalArgumentException(s"unsupported $other")
        }
      }
    }
    val haveBounds = xmin <= xmax
    val attrCols = attrs.map { case (f, _) => s""""${f.name}" ${sqlType(f.dataType)}""" }
    // DDL note: the canonical gpkg DDL declares TEXT PRIMARY KEY / UNIQUE
    // constraints on the metadata tables, which imply auto-index B-trees.
    // We write constraint-free DDL instead (same columns, same rows) so
    // the file needs no index pages — sqlite3 PRAGMA integrity_check
    // passes and readers query these tables by content, not constraints.
    // "fid" INTEGER PRIMARY KEY is kept: it is a rowid alias (no index).
    val featureSql =
      (s"""CREATE TABLE "$table" ("fid" INTEGER PRIMARY KEY, """ +
        s""""geom" GEOMETRY""" +
        (if (attrCols.isEmpty) "" else attrCols.mkString(", ", ", ", "")) + ")")
    val srs = Sqlite.Table("gpkg_spatial_ref_sys",
      """CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)""",
      Seq(
        Seq[Any]("Undefined Cartesian SRS", -1L, "NONE", -1L, "undefined", null),
        Seq[Any]("Undefined Geographic SRS", 0L, "NONE", 0L, "undefined", null),
        Seq[Any]("WGS 84", 4326L, "EPSG", 4326L,
          "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\",SPHEROID[\"WGS 84\",6378137,298.257223563]],PRIMEM[\"Greenwich\",0],UNIT[\"degree\",0.0174532925199433]]",
          null)) ++
        (if (srid != 4326 && srid > 0)
          Seq(Seq[Any](s"EPSG:$srid", srid.toLong, "EPSG", srid.toLong, "undefined", null))
        else Nil))
    val contents = Sqlite.Table("gpkg_contents",
      """CREATE TABLE gpkg_contents (table_name TEXT NOT NULL, data_type TEXT NOT NULL, identifier TEXT, description TEXT DEFAULT '', last_change DATETIME NOT NULL, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""",
      Seq(Seq[Any](table, "features", table, "", LastChange,
        if (haveBounds) xmin else null, if (haveBounds) ymin else null,
        if (haveBounds) xmax else null, if (haveBounds) ymax else null,
        srid.toLong)))
    val geomCols = Sqlite.Table("gpkg_geometry_columns",
      """CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL)""",
      Seq(Seq[Any](table, "geom", "GEOMETRY", srid.toLong, 0L, 0L)))
    val features = Sqlite.Table(table, featureSql, featureRows,
      explicitRowids = Some(featureRows.indices.map(_ + 1L)))
    Sqlite.build(Seq(srs, contents, geomCols, features),
      appId = 0x47504B47 /* GPKG */, userVersion = 10300)
  }

  /** Write `df` as GeoPackage: one complete .gpkg per partition under
    * `path` (target cleared first). */
  def write(df: DataFrame, path: String, geomCol: String,
      table: String = "layer", srid: Int = 0): Unit = {
    val geomIdx = df.schema.fieldIndex(geomCol)
    val schema = df.schema
    val spark = df.sparkSession
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    locally {
      val target = new org.apache.hadoop.fs.Path(path)
      val fs = target.getFileSystem(conf)
      if (fs.exists(target)) fs.delete(target, true)
    }
    val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
    val written = df.rdd.mapPartitionsWithIndex { (pid, rowIt) =>
      val rows = rowIt.toSeq
      if (rows.isEmpty) Iterator.empty
      else {
        val bytes = gpkgFileBytes(rows, schema, geomIdx, table, srid)
        val p = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.gpkg")
        val fs = p.getFileSystem(serConf.value)
        val os = fs.create(p, true)
        os.write(bytes); os.close()
        Iterator.single(1)
      }
    }.count()
    // an all-empty input must still yield a readable dataset: one
    // zero-row container carrying the table schema
    if (written == 0L) {
      val bytes = gpkgFileBytes(Seq.empty, schema, geomIdx, table, srid)
      val p = new org.apache.hadoop.fs.Path(path, "part-00000.gpkg")
      val fs = p.getFileSystem(conf)
      val os = fs.create(p, true)
      os.write(bytes); os.close()
    }
  }

  // ----------------------------------------------------------------- read

  /** Column (name, declaredType, isIntegerPk) list from CREATE TABLE sql. */
  private def parseCreate(sql: String): Seq[(String, String, Boolean)] = {
    val open = sql.indexOf('(')
    val body = sql.substring(open + 1, sql.lastIndexOf(')'))
    // split on commas at paren depth 0, outside quotes
    val items = new scala.collection.mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var depth = 0; var inQuote = false
    body.foreach {
      case '(' if !inQuote => depth += 1; sb += '('
      case ')' if !inQuote => depth -= 1; sb += ')'
      case '"' => inQuote = !inQuote; sb += '"'
      case ',' if depth == 0 && !inQuote => items += sb.toString; sb.clear()
      case c => sb += c
    }
    items += sb.toString
    items.map(_.trim).filter(_.nonEmpty)
      // table-level constraints start with one of these KEYWORDS — match
      // the whole first token, not a prefix (a column named `checksum` or
      // `primary_road` is a column, not a constraint)
      .filterNot { i =>
        val kw = i.takeWhile(c => !c.isWhitespace && c != '(').toUpperCase
        Seq("CONSTRAINT", "PRIMARY", "UNIQUE", "CHECK", "FOREIGN").contains(kw)
      }
      .map { item =>
        val (name, rest) =
          if (item.startsWith("\"")) {
            val end = item.indexOf('"', 1)
            (item.substring(1, end), item.substring(end + 1).trim)
          } else {
            val sp = item.indexOf(' ')
            if (sp < 0) (item, "") else (item.substring(0, sp), item.substring(sp + 1).trim)
          }
        val typ = rest.split("\\s+").headOption.getOrElse("").toUpperCase
        val isPk = rest.toUpperCase.contains("PRIMARY KEY") &&
          (typ == "INTEGER" || typ == "INT")
        (name, typ, isPk)
      }.toSeq
  }

  private def dataTypeOf(declared: String): DataType = declared match {
    case "INTEGER" | "INT" | "TINYINT" | "SMALLINT" | "MEDIUMINT" | "BIGINT" |
         "BOOLEAN" => LongType
    case "REAL" | "DOUBLE" | "FLOAT" => DoubleType
    case "TEXT" | "DATETIME" | "DATE" => StringType
    case t if t.startsWith("TEXT(") || t.startsWith("VARCHAR") => StringType
    case "BLOB" => BinaryType
    case _ => BinaryType // geometry columns and unknown types carry bytes
  }

  private val GeomTypeNames = Set("GEOMETRY", "POINT", "LINESTRING", "POLYGON",
    "MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION", "CURVE", "SURFACE")

  /** Read a feature table from a .gpkg file or a directory of part-*.gpkg.
    * `table` defaults to the first 'features' entry in gpkg_contents. */
  def read(spark: SparkSession, path: String, table: String = null,
      geomCol: String = "geometry"): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files: Seq[String] = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory) {
        val parts = fs.listStatus(p).map(_.getPath)
          .filter(_.getName.toLowerCase.endsWith(".gpkg")).sortBy(_.getName).toSeq
        require(parts.nonEmpty, s"GeoPackage read: no .gpkg files under $path")
        parts.map(_.toString)
      } else Seq(p.toString)
    }
    def load(pathStr: String, hconf: org.apache.hadoop.conf.Configuration): Sqlite.Db = {
      val fp = new org.apache.hadoop.fs.Path(pathStr)
      val fsx = fp.getFileSystem(hconf)
      val len = fsx.getFileStatus(fp).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fsx.open(fp); in.readFully(0, buf); in.close()
      new Sqlite.Db(buf)
    }
    // schema + layer resolution from the first file
    val db0 = load(files.head, conf)
    val layer = Option(table).getOrElse {
      db0.scanTable(db0.tableRoot("gpkg_contents"))
        .collectFirst { case (_, vs) if vs(1) == "features" => vs(0).asInstanceOf[String] }
        .getOrElse(throw new IllegalArgumentException("no features table in gpkg_contents"))
    }
    val geomColumn = db0.scanTable(db0.tableRoot("gpkg_geometry_columns"))
      .collectFirst { case (_, vs) if vs(0) == layer => vs(1).asInstanceOf[String] }
      .getOrElse("geom")
    val cols = parseCreate(db0.tableSql(layer))
    val sparkFields = cols.map { case (name, typ, _) =>
      if (name == geomColumn) StructField(geomCol, BinaryType)
      else StructField(name, dataTypeOf(typ))
    }
    val sparkSchema = StructType(sparkFields)
    val colsB = cols
    val layerB = layer
    val geomColumnB = geomColumn
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration(conf))
    val rdd = spark.sparkContext.parallelize(files, files.length).flatMap { f =>
      val db = load(f, serConf.value)
      val rows = db.scanTable(db.tableRoot(layerB))
      rows.iterator.map { case (rowid, vs) =>
        Row.fromSeq(colsB.zipWithIndex.map { case ((name, typ, isPk), i) =>
          val raw = if (i < vs.length) vs(i) else null
          if (name == geomColumnB)
            raw match {
              case null => null
              case blob: Array[Byte] => GeomIO.write(decodeGpb(blob))
            }
          else if (isPk && raw == null) rowid // INTEGER PRIMARY KEY = rowid alias
          else (dataTypeOf(typ), raw) match {
            case (_, null) => null
            case (LongType, l: Long) => l
            case (LongType, d: Double) => d.toLong
            case (DoubleType, d: Double) => d
            case (DoubleType, l: Long) => l.toDouble
            case (StringType, s: String) => s
            case (StringType, other) => other.toString
            case (BinaryType, b: Array[Byte]) => b
            case (dt, other) => throw new IllegalArgumentException(
              s"$name: cannot map ${other.getClass.getSimpleName} to $dt")
          }
        })
      }
    }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
