package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.GraftFunctions.st

/** Newline-delimited GeoJSON feature source/sink — the Spark-native analog
  * of the reference's GDAL-backed GeoJSON path (python read.py via pyogrio;
  * generic plugin trait rust/sedona-datasource/src/spec.rs). One feature
  * per line:
  *
  *   {"type":"Feature","geometry":{...},"properties":{...}}
  *
  * Spark's distributed text source does the IO (splittable, predicate
  * pushdown on the parsed columns after projection); geometry transcodes
  * through st_geomfromgeojson / st_asgeojson, properties through Spark's
  * JSON machinery. Mixed geometry types per file are fine — the geometry
  * fragment is parsed per row, never schema-inferred.
  */
object GeoJsonIO {

  /** Write `df` as newline-delimited GeoJSON features; every column except
    * `geomCol` becomes a property. */
  def write(df: DataFrame, path: String, geomCol: String): Unit = {
    val props = df.columns.filterNot(_ == geomCol)
    df.select(concat(
        lit("""{"type":"Feature","geometry":"""),
        st.f("st_asgeojson", col(geomCol)),
        lit(""","properties":"""),
        to_json(struct(props.map(col).toIndexedSeq: _*)),
        lit("}")).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Read newline-delimited GeoJSON. Pass `propertiesSchema` to skip the
    * inference pre-pass (recommended at scale — inference reads the data
    * twice, exactly like spark.read.json without a schema). */
  def read(spark: SparkSession, path: String, geomCol: String = "geometry",
      propertiesSchema: Option[StructType] = None): DataFrame = {
    val lines = spark.read.text(path)
    val pjson = get_json_object(col("value"), "$.properties")
    val pschema = propertiesSchema.getOrElse {
      import spark.implicits._
      spark.read.json(lines.select(pjson.as("p")).as[String]).schema
    }
    lines.select(
        from_json(pjson, pschema).as("__props"),
        st.f("st_geomfromgeojson",
          get_json_object(col("value"), "$.geometry")).as(geomCol))
      .select(col("__props.*"), col(geomCol))
  }
}
