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

    // Per-file bbox manifest (`_geo_files.json`): the FILE-level skip.
    // Row-group pruning via the covering column still requires opening
    // every footer; at 10^6 files that listing+footer pass dominates. The
    // manifest lets GeoPruneRule drop whole files before the scan is
    // planned (the reference's file-level prune,
    // rust/sedona-geoparquet/src/file_opener.rs:291-309). Built from a
    // read-back over the 4 bbox doubles only — column-pruned, no WKB
    // parse, one distributed pass; Hilbert clustering makes the per-file
    // boxes tight.
    if (withBbox) {
      val bb = s"${geomCol}_bbox"
      val rows = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(s"$bb.xmin")).as("x0"), min(col(s"$bb.ymin")).as("y0"),
          max(col(s"$bb.xmax")).as("x1"), max(col(s"$bb.ymax")).as("y1"))
        .collect()
      val entries = rows.filterNot(_.anyNull).map { r =>
        val name = r.getString(0).split('/').last
        s""""$name":[${r.getDouble(1)},${r.getDouble(2)},${r.getDouble(3)},${r.getDouble(4)}]"""
      }
      val mp = new org.apache.hadoop.fs.Path(path, manifestName)
      val mos = fs.create(mp, true)
      mos.write(
        s"""{"version":1,"column":"$geomCol","files":{${entries.mkString(",")}}}"""
          .getBytes("UTF-8"))
      mos.close()
    }
    invalidateManifest(path)
  }

  val manifestName = "_geo_files.json"

  /** Geometry column the `_geo_files.json` manifest covers, if present. */
  def manifestColumn(spark: SparkSession, root: org.apache.hadoop.fs.Path)
    : Option[String] = manifestMeta(spark, root).map(_._1)

  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[(String, Map[String, Array[Double]])]]()

  /** Cached (column, files) manifest read — the optimizer may consult the
    * manifest several times per query (fixpoint batch); one FS read per
    * root path per JVM. Invalidated by path on rewrite. */
  private def manifestMeta(spark: SparkSession, root: org.apache.hadoop.fs.Path)
    : Option[(String, Map[String, Array[Double]])] =
    manifestCache.computeIfAbsent(root.toString, _ => readManifest(spark, root))

  /** Drop the cached manifest for `path` (call after rewriting a dataset). */
  def invalidateManifest(path: String): Unit = {
    val it = manifestCache.keys()
    while (it.hasMoreElements) {
      val k = it.nextElement()
      if (k == path || k.endsWith(path)) manifestCache.remove(k)
    }
  }

  /** Per-file bboxes from the `_geo_files.json` manifest, or None when the
    * dataset has none. Keys are file names (not full paths). */
  def fileManifest(spark: SparkSession, root: org.apache.hadoop.fs.Path)
    : Option[Map[String, Array[Double]]] = manifestMeta(spark, root).map(_._2)

  private def readManifest(spark: SparkSession, root: org.apache.hadoop.fs.Path)
    : Option[(String, Map[String, Array[Double]])] = {
    try {
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mp = new org.apache.hadoop.fs.Path(root, manifestName)
      if (!fs.exists(mp)) return None
      val in = fs.open(mp)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val tree = om.readTree(bytes)
      val files = tree.get("files")
      val colNode = tree.get("column")
      if (files == null || colNode == null) return None
      val out = Map.newBuilder[String, Array[Double]]
      val it = files.fields()
      while (it.hasNext) {
        val e = it.next()
        val a = e.getValue
        if (a.isArray && a.size() == 4)
          out += e.getKey -> Array(a.get(0).asDouble, a.get(1).asDouble,
            a.get(2).asDouble, a.get(3).asDouble)
      }
      Some((colNode.asText(), out.result()))
    } catch { case _: Exception => None }
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Geometry columns of a dataframe, identified by field metadata. */
  def geometryColumns(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.collect {
      case f if f.metadata.contains("graft.geometry") =>
        f.name -> f.metadata.getString("graft.crs")
    }.toSeq
}
