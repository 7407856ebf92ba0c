package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** COPC (Cloud-Optimized Point Cloud) support: a LAZ 1.4 file whose
  * chunks are the nodes of an octree, indexed by a hierarchy so a reader
  * can fetch ONLY the nodes intersecting a query window — the point-cloud
  * analog of the COG/Zarr/netCDF windowed-raster paths (copc.io spec;
  * the reference's pointcloud side reads plain LAS/LAZ via the laz crate,
  * so this is beyond-reference breadth on the same chunk machinery).
  *
  * Layout honored: the `copc` info VLR (user id "copc", record 1, 160
  * bytes: center xyz, halfsize, spacing, root hierarchy offset/size,
  * gpstime range) MUST be the first VLR; point data is chunked layered
  * LAZ with VARIABLE chunks — laszip VLR chunk_size = -1, every chunk
  * prefixed by its u32 point count, chunk table coding (count, size)
  * pairs; the hierarchy lives in an EVLR of 32-byte entries
  * (VoxelKey{level,x,y,z}, absolute offset, byte size, point count;
  * count -1 = pointer to a child hierarchy page).
  *
  * Scale shape of [[read]]: header + VLRs + hierarchy are a few bounded
  * fetches; each selected node is one Spark task seek-reading exactly its
  * chunk's byte range — a city-block query over a country-sized cloud
  * touches a handful of nodes, never the file.
  */
object Copc {

  final case class Info(cx: Double, cy: Double, cz: Double, halfsize: Double,
      spacing: Double, rootHierOffset: Long, rootHierSize: Long)

  final case class Entry(level: Int, x: Int, y: Int, z: Int,
      offset: Long, byteSize: Int, pointCount: Int) {
    /** Voxel cube bounds of this node inside `info`'s root cube. */
    def bounds(info: Info): (Double, Double, Double, Double, Double, Double) = {
      val size = 2.0 * info.halfsize / (1L << level)
      val x0 = info.cx - info.halfsize + x * size
      val y0 = info.cy - info.halfsize + y * size
      val z0 = info.cz - info.halfsize + z * size
      (x0, y0, z0, x0 + size, y0 + size, z0 + size)
    }
  }

  // ------------------------------------------------------------------
  // read
  // ------------------------------------------------------------------

  private def parseInfo(payload: Array[Byte]): Info = {
    require(payload.length >= 64, "copc: info VLR too short")
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    Info(bb.getDouble(0), bb.getDouble(8), bb.getDouble(16), bb.getDouble(24),
      bb.getDouble(32), bb.getLong(40), bb.getLong(48))
  }

  private def parseHierPage(bytes: Array[Byte]): Seq[Entry] = {
    require(bytes.length % 32 == 0, "copc: hierarchy page not 32-byte entries")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    (0 until bytes.length / 32).map { i =>
      val o = i * 32
      Entry(bb.getInt(o), bb.getInt(o + 4), bb.getInt(o + 8), bb.getInt(o + 12),
        bb.getLong(o + 16), bb.getInt(o + 24), bb.getInt(o + 28))
    }
  }

  /** All leaf entries (pointCount >= 0), child pages followed. */
  private def hierarchy(fetch: (Long, Int) => Array[Byte], off: Long,
      size: Long, depth: Int = 0): Seq[Entry] = {
    require(depth < 16, "copc: hierarchy page nesting too deep")
    parseHierPage(fetch(off, size.toInt)).flatMap { e =>
      if (e.pointCount == -1) hierarchy(fetch, e.offset, e.byteSize.toLong, depth + 1)
      else Seq(e)
    }
  }

  /** (LAS header, copc info, hierarchy leaves) via bounded fetches. */
  private[graft] def meta(fetch: (Long, Int) => Array[Byte], fileLen: Long)
    : (LasIO.Header, Info, Seq[Entry]) = {
    val head = fetch(0L, math.min(fileLen, 512L).toInt)
    val pointOff = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getInt(96)
    require(pointOff > 0 && pointOff <= fileLen, "copc: bad point-data offset")
    val h = LasIO.parseHeader(fetch(0L, pointOff))
    val copcVlr = h.vlrs.find(v => v.userId == "copc" && v.recordId == 1)
      .getOrElse(throw new IllegalArgumentException("not a COPC file (no copc info VLR)"))
    require(h.vlrs.head.userId == "copc", "copc: info VLR must be the first VLR")
    val info = parseInfo(copcVlr.payload)
    (h, info, hierarchy(fetch, info.rootHierOffset, info.rootHierSize))
  }

  /** Read a COPC file, optionally restricted to the octree nodes whose
    * voxels intersect `bbox` (xmin, ymin, xmax, ymax in file CRS units).
    * Returned rows are ALL points of the selected nodes (a superset of
    * the bbox — refine with a predicate); `None` reads every node. */
  // per-JVM meta cache: repeated bbox queries over the same cloud (the
  // interactive pattern) and readTiled fan-outs skip re-reading header +
  // hierarchy pages; keyed by (path, mtime, length) so an overwritten
  // file is re-read, never served stale. Values are SoftReferences: a
  // hierarchy Seq[Entry] has unbounded per-cloud size, so up to 1024
  // strong entries could pin substantial heap for the JVM lifetime — the
  // GC may reclaim them under pressure and the next query re-reads.
  private type Meta = (LasIO.Header, Info, Seq[Entry])
  private val metaCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long, Long),
        java.lang.ref.SoftReference[Meta]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long),
            java.lang.ref.SoftReference[Meta]]): Boolean = size() > 1024
    })

  /** Node-pruned splits + output schema + extra-dim list for one COPC
    * file: the shared planning step of [[read]] and [[readTiled]]
    * (per-file meta served from [[metaCache]]). */
  private def splitsFor(spark: SparkSession, path: String,
      bbox: Option[(Double, Double, Double, Double)])
      : (Seq[LasIO.Split6], org.apache.spark.sql.types.StructType,
        Array[LasIO.ExtraDim]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val flen = st.getLen
    val cacheKey = (path, st.getModificationTime, flen)
    val cached = Option(metaCache.get(cacheKey)).flatMap(r => Option(r.get))
    val (h, info, leaves) = cached.getOrElse {
      val in = fs.open(p)
      val m = try {
        meta((off, n) => { val b = new Array[Byte](n); in.readFully(off, b); b }, flen)
      } finally in.close()
      metaCache.put(cacheKey, new java.lang.ref.SoftReference[Meta](m))
      m
    }
    require(h.fmt >= 6 && h.fmt <= 8, s"copc: point format ${h.fmt} (6-8 required)")
    val selected = leaves.filter { e =>
      e.pointCount > 0 && (bbox match {
        case None => true
        case Some((qx0, qy0, qx1, qy1)) =>
          val (x0, y0, _, x1, y1, _) = e.bounds(info)
          x0 <= qx1 && qx0 <= x1 && y0 <= qy1 && qy0 <= y1
      })
    }
    val dims = LasIO.extraDims(h)
    val outSchema = LasIO.schema6(dims.map(LasIO.extraField), h.fmt)
    // +4/-4 skips the chunk's leading u32 point count (the
    // variable-chunk convention)
    val splits = selected.map { e =>
      LasIO.Split6(path, 2, e.offset + 4, e.byteSize.toLong - 4,
        e.pointCount.toLong, h.recLen, h.fmt,
        h.sx, h.sy, h.sz, h.ox, h.oy, h.oz, h.software)
    }
    (splits, outSchema, dims.toArray)
  }

  /** One scan over a split list (possibly spanning several files): tasks
    * are BATCHED to ~4x the default parallelism — one task per node is
    * pure scheduler overhead when nodes are small, and a batched task
    * just decodes its nodes sequentially (the same per-task byte-range
    * batching FileScanRDD does for small files). */
  private def splitsToDf(spark: SparkSession, splits: Seq[LasIO.Split6],
      outSchema: org.apache.spark.sql.types.StructType,
      dimsB: Array[LasIO.ExtraDim]): DataFrame = {
    if (splits.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(splits.length,
      spark.sparkContext.defaultParallelism * 4))
    val rdd = spark.sparkContext.parallelize(splits, slices)
      .flatMap { sp =>
        val fp = new org.apache.hadoop.fs.Path(sp.file)
        val fsx = fp.getFileSystem(serConf.value)
        val buf = new Array[Byte](sp.len.toInt)
        val inx = fsx.open(fp); inx.readFully(sp.off, buf); inx.close()
        val rgbB = sp.fmt match { case 8 => 8; case 7 => 6; case _ => 0 }
        Laszip.decodeChunkRecords(buf, sp.expect, sp.recLen - 30 - rgbB,
          sp.recLen, rgbB).iterator.map(LasIO.recordToRow(_, sp, dimsB))
      }
    spark.createDataFrame(rdd, outSchema)
  }

  def read(spark: SparkSession, path: String,
      bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val (splits, outSchema, dimsB) = splitsFor(spark, path, bbox)
    splitsToDf(spark, splits, outSchema, dimsB)
  }

  /** One scan serving MANY bbox queries over tagged node splits: each
    * node decodes ONCE and its rows are emitted under every query id
    * whose bbox intersects it (`qid` leading column). Shared plumbing of
    * [[readMulti]] / [[readTiledMulti]]. */
  private def taggedSplitsToDf(spark: SparkSession,
      tagged: Seq[(LasIO.Split6, Array[Long])],
      outSchema: org.apache.spark.sql.types.StructType,
      dimsB: Array[LasIO.ExtraDim]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val qSchema = StructType(StructField("qid", LongType, nullable = false) +:
      outSchema.fields)
    if (tagged.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], qSchema)
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration))
    val slices = math.max(1, math.min(tagged.length,
      spark.sparkContext.defaultParallelism * 4))
    val rdd = spark.sparkContext.parallelize(tagged, slices)
      .flatMap { case (sp, qids) =>
        val fp = new org.apache.hadoop.fs.Path(sp.file)
        val fsx = fp.getFileSystem(serConf.value)
        val buf = new Array[Byte](sp.len.toInt)
        val inx = fsx.open(fp); inx.readFully(sp.off, buf); inx.close()
        val rgbB = sp.fmt match { case 8 => 8; case 7 => 6; case _ => 0 }
        Laszip.decodeChunkRecords(buf, sp.expect, sp.recLen - 30 - rgbB,
          sp.recLen, rgbB).iterator.flatMap { rec =>
          val base = LasIO.recordToRow(rec, sp, dimsB).toSeq
          qids.iterator.map(q => Row.fromSeq(q +: base))
        }
      }
    spark.createDataFrame(rdd, qSchema)
  }

  /** Multi-query read of one COPC file: the N-aggregates-over-one-cloud
    * shape (pc06) planned as ONE scan instead of N. Per-qid candidate
    * semantics are identical to `read(path, Some(box))`; callers refine
    * exactly, then aggregate grouped by `qid`. */
  def readMulti(spark: SparkSession, path: String,
      boxes: Seq[(Long, (Double, Double, Double, Double))]): DataFrame = {
    require(boxes.nonEmpty, "copc readMulti: no boxes")
    val perBox = boxes.map { case (qid, b) =>
      (qid, splitsFor(spark, path, Some(b)))
    }
    val (_, (_, outSchema, dimsB)) = perBox.head
    val byNode = collection.mutable.LinkedHashMap
      .empty[LasIO.Split6, collection.mutable.ArrayBuffer[Long]]
    perBox.foreach { case (qid, (splits, _, _)) =>
      splits.foreach(sp =>
        byNode.getOrElseUpdate(sp, collection.mutable.ArrayBuffer.empty) += qid)
    }
    taggedSplitsToDf(spark,
      byNode.iterator.map { case (sp, qs) => (sp, qs.toArray) }.toSeq,
      outSchema, dimsB)
  }

  /** Multi-query read of a tiled COPC directory: [[readTiled]]'s two
    * pruning levels (header bbox, then octree nodes) run per query id,
    * but every surviving node across all queries decodes in ONE scan.
    * Falls back to per-query [[readTiled]] unions when tile layouts are
    * heterogeneous (foreign mixed dirs). */
  def readTiledMulti(spark: SparkSession, dir: String,
      boxes: Seq[(Long, (Double, Double, Double, Double))]): DataFrame = {
    require(boxes.nonEmpty, "copc readTiledMulti: no boxes")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tiles = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".copc.laz")).sortBy(_.getName)
    require(tiles.nonEmpty, s"copc readTiledMulti: no .copc.laz files under $dir")
    val headerBox: Map[String, (Double, Double, Double, Double)] =
      tiles.map { t =>
        val st = fs.getFileStatus(t)
        val key = (t.toString, st.getModificationTime, st.getLen)
        var fb = bboxCache.get(key)
        if (fb == null) {
          val in = fs.open(t)
          val head = new Array[Byte](227)
          try in.readFully(0L, head) finally in.close()
          val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
          fb = (bb.getDouble(187), bb.getDouble(203),
            bb.getDouble(179), bb.getDouble(195))
          bboxCache.put(key, fb)
        }
        t.toString -> fb
      }.toMap
    // plan per (qid, surviving tile); bail to per-query unions when any
    // participating tile disagrees on schema/extra-dims
    val planned = boxes.flatMap { case (qid, q @ (qx0, qy0, qx1, qy1)) =>
      tiles.iterator.filter { t =>
        val (fx0, fy0, fx1, fy1) = headerBox(t.toString)
        fx0 <= qx1 && qx0 <= fx1 && fy0 <= qy1 && qy0 <= fy1
      }.map(t => (qid, splitsFor(spark, t.toString, Some(q))))
    }
    val layouts = planned.map(pl => (pl._2._2, pl._2._3.toSeq)).distinct
    if (planned.nonEmpty && layouts.length > 1)
      return boxes.map { case (qid, b) =>
        readTiled(spark, dir, Some(b)).select(
          org.apache.spark.sql.functions.lit(qid).as("qid"),
          org.apache.spark.sql.functions.col("*"))
      }.reduce(_ unionAll _)
    val (outSchema, dimsB) =
      if (planned.nonEmpty) (planned.head._2._2, planned.head._2._3)
      else { val (_, sch, dims) = splitsFor(spark, tiles.head.toString,
        Some((Double.MaxValue, Double.MaxValue, Double.MaxValue, Double.MaxValue)))
        (sch, dims) }
    val byNode = collection.mutable.LinkedHashMap
      .empty[LasIO.Split6, collection.mutable.ArrayBuffer[Long]]
    planned.foreach { case (qid, (splits, _, _)) =>
      splits.foreach(sp =>
        byNode.getOrElseUpdate(sp, collection.mutable.ArrayBuffer.empty) += qid)
    }
    taggedSplitsToDf(spark,
      byNode.iterator.map { case (sp, qs) => (sp, qs.toArray) }.toSeq,
      outSchema, dimsB)
  }

  // ------------------------------------------------------------------
  // write (fixture/tooling scale: single file built on the driver — a
  // production pipeline would write per-partition COPC tiles)
  // ------------------------------------------------------------------

  /** Octree assignment: subdivide while a node holds more than
    * `maxPerNode` points (depth-capped); internal nodes hold none. */
  private def buildOctree(pts: Array[(Double, Double, Double, Int)],
      info: Info, maxPerNode: Int): Seq[((Int, Int, Int, Int), Array[Int])] = {
    val out = Seq.newBuilder[((Int, Int, Int, Int), Array[Int])]
    def go(level: Int, x: Int, y: Int, z: Int, idx: Array[Int]): Unit = {
      if (idx.isEmpty) return
      if (idx.length <= maxPerNode || level >= 8) {
        out += (((level, x, y, z), idx))
      } else {
        val size = 2.0 * info.halfsize / (1L << level)
        val x0 = info.cx - info.halfsize + x * size
        val y0 = info.cy - info.halfsize + y * size
        val z0 = info.cz - info.halfsize + z * size
        val groups = idx.groupBy { i =>
          val (px, py, pz, _) = pts(i)
          val cx = if (px >= x0 + size / 2) 1 else 0
          val cy = if (py >= y0 + size / 2) 1 else 0
          val cz = if (pz >= z0 + size / 2) 1 else 0
          (cx, cy, cz)
        }
        groups.toSeq.sortBy(_._1).foreach { case ((cx, cy, cz), sub) =>
          go(level + 1, 2 * x + cx, 2 * y + cy, 2 * z + cz, sub)
        }
      }
    }
    go(0, 0, 0, 0, pts.indices.toArray)
    out.result()
  }

  /** Serialize (x, y, z[, intensity, classification, gps_time]) rows as
    * a single COPC file. Fixture/tooling scale: rows are collected to the
    * driver — the distributed path is [[writeTiled]]. */
  def write(df: DataFrame, path: String, scale: Double = 0.001,
      maxPerNode: Int = 4096): Unit =
    writeRows(df.collect(), df.schema, path, scale, maxPerNode,
      df.sparkSession.sparkContext.hadoopConfiguration)

  /** Single-file COPC serialization core, callable on an executor with
    * the rows of one tile (no SparkSession dependency). */
  private[graft] def writeRows(rows: Array[Row],
      sch: org.apache.spark.sql.types.StructType, path: String,
      scale: Double, maxPerNode: Int,
      hconf: org.apache.hadoop.conf.Configuration): Unit = {
    def idx(n: String): Int = if (sch.fieldNames.contains(n)) sch.fieldIndex(n) else -1
    val xi = idx("x"); val yi = idx("y"); val zi = idx("z")
    require(xi >= 0 && yi >= 0 && zi >= 0, "copc write: x, y, z columns required")
    val ii = idx("intensity"); val ci = idx("classification"); val gi = idx("gps_time")
    // red/green/blue together select point format 7 (RGB14 item)
    val ri = idx("red"); val gri = idx("green"); val bi = idx("blue")
    require(ri >= 0 == gri >= 0 && gri >= 0 == bi >= 0,
      "copc write: red/green/blue columns must be present together")
    val hasRgb = ri >= 0
    require(rows.nonEmpty, "copc write: empty input")
    val pts = rows.zipWithIndex.map { case (r, i) =>
      (r.getDouble(xi), r.getDouble(yi), r.getDouble(zi), i)
    }
    var minX = Double.MaxValue; var minY = Double.MaxValue; var minZ = Double.MaxValue
    var maxX = -Double.MaxValue; var maxY = -Double.MaxValue; var maxZ = -Double.MaxValue
    pts.foreach { case (x, y, z, _) =>
      minX = math.min(minX, x); maxX = math.max(maxX, x)
      minY = math.min(minY, y); maxY = math.max(maxY, y)
      minZ = math.min(minZ, z); maxZ = math.max(maxZ, z)
    }
    // root cube: centered on the bbox, half-size = half the largest extent
    // (slightly inflated so max-edge points fall strictly inside)
    val half = math.max(math.max(maxX - minX, maxY - minY),
      math.max(maxZ - minZ, scale)) / 2 * 1.000001
    val info0 = Info((minX + maxX) / 2, (minY + maxY) / 2, (minZ + maxZ) / 2,
      half, half / 64, 0L, 0L)
    val nodes = buildOctree(pts, info0, maxPerNode)

    val rgbBytes = if (hasRgb) 6 else 0
    val fmt = if (hasRgb) 7 else 6
    val recLen = 30 + rgbBytes
    def record(r: Row): Array[Byte] = {
      val bb = ByteBuffer.allocate(recLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(math.round((r.getDouble(xi) - minX) / scale).toInt)
      bb.putInt(math.round((r.getDouble(yi) - minY) / scale).toInt)
      bb.putInt(math.round((r.getDouble(zi) - minZ) / scale).toInt)
      bb.putShort(if (ii >= 0 && !r.isNullAt(ii)) r.getLong(ii).toShort else 0)
      bb.put(0x11.toByte) // return 1 of 1
      bb.put(0.toByte)
      bb.put(if (ci >= 0 && !r.isNullAt(ci)) r.getLong(ci).toByte else 0.toByte)
      bb.put(0.toByte)
      bb.putShort(0); bb.putShort(0)
      bb.putDouble(if (gi >= 0 && !r.isNullAt(gi)) r.getDouble(gi) else 0.0)
      if (hasRgb) {
        bb.putShort(if (r.isNullAt(ri)) 0 else r.getLong(ri).toShort)
        bb.putShort(if (r.isNullAt(gri)) 0 else r.getLong(gri).toShort)
        bb.putShort(if (r.isNullAt(bi)) 0 else r.getLong(bi).toShort)
      }
      bb.array()
    }

    // chunks in node order, each prefixed by its u32 point count
    val chunks = nodes.map { case (_, idxs) =>
      val recs = idxs.map(i => record(rows(pts(i)._4)))
      val body = Laszip.encodeChunk(recs, 0, recLen, rgbBytes)
      val withCount = ByteBuffer.allocate(4 + body.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      withCount.putInt(idxs.length).put(body)
      withCount.array()
    }

    // laszip VLR: compressor 3, chunk_size -1 (variable), POINT14 v3
    // (+ RGB14 v3 for point format 7)
    val items: Seq[(Int, Int, Int)] =
      Seq((10, 30, 3)) ++ (if (hasRgb) Seq((11, 6, 3)) else Nil)
    val lazPayload = ByteBuffer.allocate(34 + 6 * items.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    lazPayload.putShort(3).putShort(0)
    lazPayload.put(2.toByte).put(2.toByte).putShort(0)
    lazPayload.putInt(0)
    lazPayload.putInt(-1) // variable-size chunks
    lazPayload.putLong(0L).putLong(0L)
    lazPayload.putShort(items.length.toShort)
    items.foreach { case (t, sz, ver) =>
      lazPayload.putShort(t.toShort).putShort(sz.toShort).putShort(ver.toShort)
    }
    def vlr(userId: String, recordId: Int, payload: Array[Byte]): Array[Byte] = {
      val v = ByteBuffer.allocate(54 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
      v.putShort(0)
      v.put(userId.padTo(16, '\u0000').getBytes("US-ASCII"))
      v.putShort(recordId.toShort)
      v.putShort(payload.length.toShort)
      v.position(54)
      v.put(payload)
      v.array()
    }
    // OGC WKT CRS VLR (LASF_Projection/2112): LAS 1.4 point formats 6-8
    // REQUIRE WKT CRS storage (global-encoding WKT bit set below); strict
    // readers (PDAL, lastools) warn or reject without it. The writer has
    // no CRS parameter, so a local engineering CRS in WKT2 form states
    // "coordinates are metric, datum unspecified" honestly.
    val wktCrs = ("ENGCRS[\"Local engineering (unspecified datum)\"," +
      "EDATUM[\"Unknown\"],CS[Cartesian,3]," +
      "AXIS[\"x\",east],AXIS[\"y\",north],AXIS[\"z\",up]," +
      "LENGTHUNIT[\"metre\",1]]\u0000").getBytes("US-ASCII")
    val copcPayload = new Array[Byte](160) // offsets patched below
    val vlrs = Array(vlr("copc", 1, copcPayload), vlr("laszip encoded", 22204,
      lazPayload.array()), vlr("LASF_Projection", 2112, wktCrs))
    val headerSize = 375
    val pointOff = headerSize + vlrs.map(_.length).sum

    // point data stream: [i64 cto][chunks][variable table of (count,size)]
    val dataLen = chunks.map(_.length.toLong).sum
    val tenc = new Laszip.ArEncoder
    val tic = new Laszip.IntEnc(tenc, 32, 2)
    var prevC = 0; var prevS = 0
    nodes.zip(chunks).foreach { case ((_, idxs), c) =>
      tic.compress(prevC, idxs.length, 0); prevC = idxs.length
      tic.compress(prevS, c.length, 1); prevS = c.length
    }
    val table = tenc.done()
    val cto = pointOff + 8 + dataLen

    // hierarchy EVLR after the point data (single page)
    val evlrHeaderLen = 60
    val hierOff = cto + 8 + table.length + evlrHeaderLen
    val chunkOffsets = chunks.scanLeft(pointOff + 8L)(_ + _.length)
    val hier = ByteBuffer.allocate(nodes.length * 32).order(ByteOrder.LITTLE_ENDIAN)
    nodes.zipWithIndex.foreach { case (((lvl, nx, ny, nz), idxs), i) =>
      hier.putInt(lvl).putInt(nx).putInt(ny).putInt(nz)
      hier.putLong(chunkOffsets(i)).putInt(chunks(i).length).putInt(idxs.length)
    }
    // copc info payload: center, halfsize, spacing, root hier off/size
    locally {
      val bb = ByteBuffer.wrap(copcPayload).order(ByteOrder.LITTLE_ENDIAN)
      bb.putDouble(info0.cx).putDouble(info0.cy).putDouble(info0.cz)
      bb.putDouble(info0.halfsize).putDouble(info0.spacing)
      bb.putLong(hierOff).putLong(nodes.length * 32L)
      bb.putDouble(0.0).putDouble(0.0) // gpstime range (unused)
    }
    val vlrBytes = Array(vlr("copc", 1, copcPayload),
      vlr("laszip encoded", 22204, lazPayload.array()),
      vlr("LASF_Projection", 2112, wktCrs)).flatten

    val total = cto + 8 + table.length + evlrHeaderLen + nodes.length * 32L
    val out = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    out.put("LASF".getBytes("US-ASCII"))
    // global encoding bit 4 (0x0010): CRS is WKT — mandatory for formats 6-8
    out.position(6); out.putShort(0x0010.toShort)
    out.position(24); out.put(1.toByte).put(4.toByte)
    out.position(26)
    out.put("GRAFT".padTo(32, ' ').getBytes("US-ASCII"))
    out.put("graft spark engine".padTo(32, ' ').getBytes("US-ASCII"))
    out.putShort(1.toShort).putShort(2026.toShort)
    out.putShort(headerSize.toShort)
    out.putInt(pointOff)
    out.putInt(3) // VLR count
    out.put((fmt | 0x80).toByte)
    out.putShort(recLen.toShort)
    out.putInt(0)
    out.position(131)
    out.putDouble(scale).putDouble(scale).putDouble(scale)
    out.putDouble(minX).putDouble(minY).putDouble(minZ)
    out.putDouble(maxX).putDouble(minX)
    out.putDouble(maxY).putDouble(minY)
    out.putDouble(maxZ).putDouble(minZ)
    out.position(235)
    out.putLong(cto + 8 + table.length) // first EVLR offset
    out.putInt(1) // EVLR count
    out.position(247)
    out.putLong(rows.length.toLong)
    out.position(headerSize)
    out.put(vlrBytes)
    out.putLong(cto)
    chunks.foreach(out.put)
    out.putInt(0).putInt(chunks.length)
    out.put(table)
    // EVLR header (60 bytes) + hierarchy page
    val eh = ByteBuffer.allocate(evlrHeaderLen).order(ByteOrder.LITTLE_ENDIAN)
    eh.putShort(0)
    eh.put("copc".padTo(16, '\u0000').getBytes("US-ASCII"))
    eh.putShort(1000.toShort)
    eh.putLong(nodes.length * 32L)
    out.put(eh.array())
    out.put(hier.array())

    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val os = fs.create(p, true)
    os.write(java.util.Arrays.copyOf(out.array(), out.position()))
    os.close()
  }

  // ------------------------------------------------------------------
  // distributed tiled write + pruned tiled read
  // ------------------------------------------------------------------

  /** Distributed COPC writer: partitions the cloud by octant cells of the
    * GLOBAL root cube (level picked so a tile holds ~`targetPerTile`
    * points), ships each tile's rows to one task, and has every task
    * serialize its own complete COPC file (octree, chunked LAZ, hierarchy
    * page) under `dir` — no point data ever crosses the driver; the
    * driver's only jobs are a 6-scalar bounds/count aggregate and the
    * final file listing. The tile grid is the top level of one logical
    * octree, so [[readTiled]] can prune whole FILES by header bbox before
    * per-file node pruning takes over — the standard tiled-COPC layout
    * production pipelines emit.
    *
    * Per-task memory is bounded by the tile size knob (a tile's rows are
    * materialized to build its octree), the same contract as any
    * columnar writer's row-group buffer. */
  def writeTiled(df: DataFrame, dir: String, scale: Double = 0.001,
      maxPerNode: Int = 4096, targetPerTile: Long = 2000000L): Unit = {
    import org.apache.spark.sql.functions._
    require(targetPerTile > 0, "copc writeTiled: targetPerTile must be positive")
    val spark = df.sparkSession
    val stats = df.agg(count(lit(1)), min("x"), min("y"), min("z"),
      max("x"), max("y"), max("z")).collect()(0)
    val n = stats.getLong(0)
    require(n > 0, "copc writeTiled: empty input")
    val (minX, minY, minZ) = (stats.getDouble(1), stats.getDouble(2), stats.getDouble(3))
    val (maxX, maxY, maxZ) = (stats.getDouble(4), stats.getDouble(5), stats.getDouble(6))
    // the same root cube the single-file writer would build, so tile
    // cells are genuine octants of one logical octree
    val half = math.max(math.max(maxX - minX, maxY - minY),
      math.max(maxZ - minZ, scale)) / 2 * 1.000001
    val cx = (minX + maxX) / 2; val cy = (minY + maxY) / 2; val cz = (minZ + maxZ) / 2
    val level = math.max(0,
      math.ceil(math.log(n.toDouble / targetPerTile) / math.log(8.0)).toInt)
    val dim = 1 << level
    def cellIdx(c: org.apache.spark.sql.Column, lo: Double): org.apache.spark.sql.Column =
      least(lit(dim - 1), greatest(lit(0),
        floor((c - lit(lo)) / lit(2.0 * half) * lit(dim.toDouble)).cast("int")))
    val tile = (cellIdx(col("z"), cz - half) * dim + cellIdx(col("y"), cy - half)) *
      dim + cellIdx(col("x"), cx - half)
    val outPath = new org.apache.hadoop.fs.Path(dir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath)) fs.delete(outPath, true)
    fs.mkdirs(outPath)
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration))
    val sch = df.schema
    val parts = math.min(dim.toLong * dim * dim,
      math.max(spark.sparkContext.defaultParallelism.toLong, 8L)).toInt
    df.withColumn("__tile", tile)
      .repartition(parts, col("__tile"))
      .foreachPartition { (it: Iterator[Row]) =>
        // a hash partition may carry several tiles; group and write each
        val byTile = new scala.collection.mutable.HashMap[Long,
          scala.collection.mutable.ArrayBuffer[Row]]()
        val ti = sch.length // __tile appended after the original columns
        it.foreach { r =>
          byTile.getOrElseUpdate(r.getInt(ti).toLong,
            new scala.collection.mutable.ArrayBuffer[Row]()) += r
        }
        byTile.foreach { case (tid, rows) =>
          val tx = tid % dim; val ty = (tid / dim) % dim; val tz = tid / (dim.toLong * dim)
          writeRows(rows.toArray, sch,
            s"$dir/tile_${level}_${tx}_${ty}_$tz.copc.laz",
            scale, maxPerNode, serConf.value)
        }
      }
  }

  // per-JVM tile-header bbox cache for [[readTiled]]'s file-level prune
  private val bboxCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long, Long),
        (Double, Double, Double, Double)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long),
            (Double, Double, Double, Double)]): Boolean = size() > 8192
    })

  /** Read a tiled COPC directory written by [[writeTiled]] (or any
    * directory of COPC files): tiles whose HEADER bbox misses `bbox` are
    * pruned without opening their hierarchy; surviving tiles read through
    * [[read]]'s per-node pruning. Header bboxes and per-file meta are
    * cached per (path, mtime), so repeated queries over the same tile
    * set cost only the file listing. */
  def readTiled(spark: SparkSession, dir: String,
      bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tiles = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".copc.laz")).sortBy(_.getName)
    require(tiles.nonEmpty, s"copc readTiled: no .copc.laz files under $dir")
    val selected = bbox match {
      case None => tiles.toSeq
      case Some((qx0, qy0, qx1, qy1)) => tiles.toSeq.filter { t =>
        val st = fs.getFileStatus(t)
        val key = (t.toString, st.getModificationTime, st.getLen)
        var fb = bboxCache.get(key)
        if (fb == null) {
          // LAS header min/max X/Y at fixed offsets 179..210
          val in = fs.open(t)
          val head = new Array[Byte](227)
          try in.readFully(0L, head) finally in.close()
          val bb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
          fb = (bb.getDouble(187), bb.getDouble(203),
            bb.getDouble(179), bb.getDouble(195))
          bboxCache.put(key, fb)
        }
        val (fx0, fy0, fx1, fy1) = fb
        fx0 <= qx1 && qx0 <= fx1 && fy0 <= qy1 && qy0 <= fy1
      }
    }
    if (selected.isEmpty)
      // preserve the schema by asking one tile for a necessarily-empty read
      read(spark, tiles.head.toString, Some((Double.MaxValue, Double.MaxValue,
        Double.MaxValue, Double.MaxValue)))
    else {
      // ONE scan across every surviving tile's node splits (Split6
      // carries its own file path): a per-tile scan per query multiplies
      // plan width and task count by the tile fan-out for nothing. Tiles
      // with a different point format/extra-dims (foreign mixed dirs)
      // fall back to the per-tile union.
      val planned = selected.map(t => splitsFor(spark, t.toString, bbox))
      // Homogeneity must cover the extra-dim tables too (offsets/sizes/
      // no-data bits), not just the output schema: same-named same-typed
      // extra dims with different record layouts would silently misdecode
      // under a shared planned.head._3.
      if (planned.map(p => (p._2, p._3.toSeq)).distinct.length == 1)
        splitsToDf(spark, planned.flatMap(_._1), planned.head._2,
          planned.head._3)
      else selected.map(t => read(spark, t.toString, bbox)).reduce(_ unionAll _)
    }
  }
}
