package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}
import graft.functions.GraftFunctions.st

/** GeoParquet-style IO (reference: rust/sedona-geoparquet).
  *
  * Geometry columns are tagged with Spark field metadata (encoding/CRS) —
  * Spark persists field metadata in the parquet footer schema JSON, so the
  * tags round-trip through plain `spark.read.parquet` with zero custom
  * reader code (the reference rides Arrow extension metadata the same way,
  * rust/sedona-schema/src/extension_type.rs).
  *
  * The scale lever is the **bbox covering column** (`<geom>_bbox`, struct of
  * xmin/ymin/xmax/ymax — spec layout from
  * rust/sedona-geoparquet/src/metadata.rs:263-269): write clustered by
  * SD_Order (Hilbert) and every row group's bbox min/max statistics become
  * tight, so a spatial filter rewritten to bbox ranges (GeoPruneRule) is
  * pruned by Spark's stock parquet reader — the exact effect of the
  * reference's filter_access_plan_using_geoparquet_covering
  * (rust/sedona-geoparquet/src/file_opener.rs:315-340).
  *
  * A `_geo.json` sidecar mirrors the `geo` footer metadata content
  * (metadata.rs:285 GeoParquetMetadata) for interop/debugging.
  */
object GeoParquet {

  def geomMetadata(crs: String): Metadata = new MetadataBuilder()
    .putString("graft.encoding", "WKB")
    .putString("graft.crs", crs)
    .putBoolean("graft.geometry", true)
    .build()

  def bboxCol(geom: Column): Column = struct(
    st.xmin(geom).as("xmin"), st.ymin(geom).as("ymin"),
    st.xmax(geom).as("xmax"), st.ymax(geom).as("ymax"))

  /** Write a GeoParquet-style dataset: tagged geometry column, bbox
    * covering column, Hilbert clustering, per-column bounds in the
    * sidecar. `clusterPartitions` controls output parallelism (one tight
    * row-group run per partition). */
  def write(df: DataFrame, path: String, geomCol: String,
      crs: String = "EPSG:4326", withBbox: Boolean = true,
      hilbertCluster: Boolean = true, clusterPartitions: Int = 0): Unit = {
    val g = col(geomCol)
    var out = df.withColumn(geomCol, g.as(geomCol, geomMetadata(crs)))
    if (withBbox) out = out.withColumn(s"${geomCol}_bbox", bboxCol(col(geomCol)))
    // Dataset-level bounds for the sidecar ride the write job as an
    // observed metric instead of a separate aggregate pass — at 100 TB a
    // second full scan (and WKB parse) of the input just for 4 doubles is
    // the difference between one pass and two. min/max are idempotent, so
    // the range-partitioner sampling job double-counting rows into the
    // observation is harmless.
    val obs = new org.apache.spark.sql.Observation()
    out = out.observe(obs,
      st.xmin(st.envelopeAgg(col(geomCol))).as("xmin"),
      st.ymin(st.envelopeAgg(col(geomCol))).as("ymin"),
      st.xmax(st.envelopeAgg(col(geomCol))).as("xmax"),
      st.ymax(st.envelopeAgg(col(geomCol))).as("ymax"))
    if (hilbertCluster) {
      val parts = if (clusterPartitions > 0) clusterPartitions
        else df.sparkSession.sessionState.conf.numShufflePartitions
      out = out.repartitionByRange(parts, st.f("sd_order", col(geomCol)))
    }
    out.write.mode("overwrite").parquet(path)

    // sidecar mirroring the `geo` footer metadata (GeoParquetMetadata)
    val spark = df.sparkSession
    val m = obs.get
    // GeoParquet requires bbox values to be numbers — an empty input
    // observes null min/max, so omit the bbox key entirely in that case.
    val bounds = Seq("xmin", "ymin", "xmax", "ymax").map(k => m.get(k) match {
      case Some(v: java.lang.Double) => Some(v.doubleValue)
      case _ => None
    })
    val bboxJson =
      if (bounds.forall(_.isDefined))
        s""""bbox":[${bounds.map(_.get).mkString(",")}],"""
      else ""
    val geoJson =
      s"""{"version":"1.1.0","primary_column":"$geomCol","columns":{"$geomCol":{
         |"encoding":"WKB","crs":"$crs",
         |$bboxJson
         |"covering":${if (withBbox) s"""{"bbox":{"xmin":["${geomCol}_bbox","xmin"],"ymin":["${geomCol}_bbox","ymin"],"xmax":["${geomCol}_bbox","xmax"],"ymax":["${geomCol}_bbox","ymax"]}}""" else "null"}}}}""".stripMargin
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path, "_geo.json")
    val fs = p.getFileSystem(conf)
    val os = fs.create(p, true)
    os.write(geoJson.getBytes("UTF-8")); os.close()
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Geometry columns of a dataframe, identified by field metadata. */
  def geometryColumns(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.collect {
      case f if f.metadata.contains("graft.geometry") =>
        f.name -> f.metadata.getString("graft.crs")
    }.toSeq
}
