package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.st

/** CSV / JSON read+write with WKT geometry columns — the reference's
  * text-format path (rust/sedona/src/context.rs:603,635; dataframe.py
  * to_csv/to_json): geometry serializes as WKT text, parses back with
  * ST_GeomFromWKT. Spark's CSV/JSON sources do the heavy lifting; these
  * wrappers only transcode the geometry columns.
  */
object GeoTextIO {

  /** CSV/JSON have no geometry representation: a tagged geometry column
    * that is not being transcoded is a hard error naming the column
    * (reference io/test_write_csv_json.py test_to_csv_geometry_raises —
    * a silent base64/binary encoding is worse than an error). */
  private def requireNoUntranscodedGeometry(df: DataFrame, geomCols: Seq[String],
      format: String): Unit = {
    val untranscoded = GeoParquet.geometryColumns(df).map(_._1)
      .filterNot(geomCols.contains)
    require(untranscoded.isEmpty,
      s"""Can't write geometry column${if (untranscoded.length > 1) "s" else ""} """ +
        untranscoded.map(c => s""""$c"""").mkString(", ") +
        s" to $format: project to text first (ST_AsText) or list it in geomCols")
  }

  def writeCsv(df: DataFrame, path: String, geomCols: Seq[String]): Unit = {
    requireNoUntranscodedGeometry(df, geomCols, "CSV")
    geomCols.foldLeft(df)((d, c) => d.withColumn(c, st.asText(col(c))))
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  def readCsv(spark: SparkSession, path: String, geomCols: Seq[String]): DataFrame = {
    val raw = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    geomCols.foldLeft(raw)((d, c) => d.withColumn(c, st.geomFromWkt(col(c))))
  }

  def writeJson(df: DataFrame, path: String, geomCols: Seq[String]): Unit = {
    requireNoUntranscodedGeometry(df, geomCols, "JSON")
    geomCols.foldLeft(df)((d, c) => d.withColumn(c, st.asText(col(c))))
      .write.mode("overwrite").json(path)
  }

  def readJson(spark: SparkSession, path: String, geomCols: Seq[String]): DataFrame = {
    val raw = spark.read.json(path)
    geomCols.foldLeft(raw)((d, c) => d.withColumn(c, st.geomFromWkt(col(c))))
  }
}
