package graft.sources

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
  * the planner-injected `rs_ensureloaded` materializes them.
  */
object RasterLoaders {

  trait Loader {
    /** Header-only metadata: bounded reads through `fetch`, no pixels. */
    def readMeta(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster
    /** Full decode of the file bytes, bands materialized. */
    def load(bytes: Array[Byte]): Raster
  }

  private object GeoTiffLoader extends Loader {
    def readMeta(fetch: (Long, Int) => Array[Byte], fileLen: Long): Raster =
      GeoTiff.readMeta(fetch)
    def load(bytes: Array[Byte]): Raster = GeoTiff.read(bytes)
  }

  @volatile private var registry: Map[String, Loader] =
    Map("tif" -> GeoTiffLoader, "tiff" -> GeoTiffLoader)

  def register(ext: String, loader: Loader): Unit = synchronized {
    registry = registry + (ext.toLowerCase -> loader)
  }

  private def loaderFor(path: String): Loader = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    val ext = if (dot < 0) "" else name.substring(dot + 1).toLowerCase
    registry.getOrElse(ext, throw new IllegalArgumentException(
      s"rs_frompath: no raster loader registered for extension '$ext' of $path " +
        s"(registered: ${registry.keys.toSeq.sorted.mkString(", ")})"))
  }

  private def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Header-only metadata; bands stay empty, `path` is carried so
    * `rs_ensureloaded` can find the bytes later. Throws
    * FileNotFoundException for a missing file. */
  def readMeta(path: String): Raster = {
    val loader = loaderFor(path)
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val r = loader.readMeta((off, n) => {
        val buf = new Array[Byte](n)
        in.readFully(off, buf)
        buf
      }, len)
      Raster(r.crs, r.gt, r.width, r.height, Vector.empty, path)
    } finally in.close()
  }

  /** Full load: one sequential read + format decode, bands materialized. */
  def load(path: String): Raster = {
    val loader = loaderFor(path)
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"rs_ensureloaded: $path too large ($len bytes)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val r = loader.load(bytes)
    Raster(r.crs, r.gt, r.width, r.height, r.bands, path)
  }
}
