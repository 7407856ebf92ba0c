package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry point for every supported vector / point-cloud container —
  * the engine's analog of the reference's `sd.read_*` convenience surface
  * (python/sedonadb/python/sedonadb/read.py): dispatch on the path's
  * extension; a directory without one dispatches on the extension of the
  * files it contains (each source handles multi-file inputs itself).
  * Rasters are columnar values, not datasets — they enter through
  * `rs_frompath` / the RasterLoaders registry instead.
  */
object Geo {

  private val dispatch: Map[String, (SparkSession, String) => DataFrame] = Map(
    "parquet" -> ((s, p) => GeoParquet.read(s, p)),
    "fgb" -> ((s, p) => FlatGeobuf.read(s, p)),
    "shp" -> ((s, p) => Shapefile.read(s, p)),
    "gpkg" -> ((s, p) => GeoPackage.read(s, p)),
    "geojson" -> ((s, p) => GeoJsonIO.read(s, p)),
    "las" -> ((s, p) => LasIO.read(s, p)),
    "laz" -> ((s, p) => LasIO.read(s, p)))

  private def extOf(name: String): String = {
    val dot = name.lastIndexOf('.')
    if (dot < 0) "" else name.substring(dot + 1).toLowerCase
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val ext = extOf(path.stripSuffix("/").split('/').last) match {
      case "" => // directory: dispatch on the contained files' extension
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(hp).iterator
          .map(s => extOf(s.getPath.getName))
          .find(dispatch.contains)
          .getOrElse("")
      case e => e
    }
    dispatch.getOrElse(ext, throw new IllegalArgumentException(
      s"Geo.read: no reader for '$path' " +
        s"(supported extensions: ${dispatch.keys.toSeq.sorted.mkString(", ")})"))(
      spark, path)
  }
}
