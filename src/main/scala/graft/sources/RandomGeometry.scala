package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.st

/** Seeded synthetic geometry generator — the reference's
  * `sd_random_geometry` table function
  * (rust/sedona/src/random_geometry_provider.rs:52-104) as a
  * `spark.range`-based DataFrame: fully distributed, deterministic per
  * (seed, id), no driver-side data generation. Used by benchmarks and
  * property tests.
  */
object RandomGeometry {

  private def u(seed: Long, salt: Int, lo: Double, hi: Double) = {
    // xorshift-free determinism: Spark's hash of (id, seed, salt) -> [lo, hi)
    (c: org.apache.spark.sql.Column) =>
      lit(lo) + (pmod(hash(c, lit(seed), lit(salt)), lit(1000000)).cast("double") / 1000000.0) * (hi - lo)
  }

  /** n random points in [xmin,xmax)x[ymin,ymax). Columns: id, geom. */
  def points(spark: SparkSession, n: Long, seed: Long = 42,
      xmin: Double = 0, ymin: Double = 0, xmax: Double = 100, ymax: Double = 100): DataFrame =
    spark.range(n).select(col("id"),
      st.point(u(seed, 1, xmin, xmax)(col("id")), u(seed, 2, ymin, ymax)(col("id"))).as("geom"))

  /** n random axis-aligned boxes with sizes in [1, maxSize). */
  def boxes(spark: SparkSession, n: Long, seed: Long = 42,
      xmin: Double = 0, ymin: Double = 0, xmax: Double = 100, ymax: Double = 100,
      maxSize: Double = 5): DataFrame =
    spark.range(n).select(col("id"),
      st.makeEnvelope(
        u(seed, 1, xmin, xmax)(col("id")),
        u(seed, 2, ymin, ymax)(col("id")),
        u(seed, 1, xmin, xmax)(col("id")) + u(seed, 3, 1, maxSize)(col("id")),
        u(seed, 2, ymin, ymax)(col("id")) + u(seed, 4, 1, maxSize)(col("id"))).as("geom"))

  /** The reference's SQL surface: `SELECT * FROM
    * sd_random_geometry('{"num_rows": 8192, "seed": 42, ...}')`
    * (random_geometry_provider.rs:444, options :96-147). Output schema
    * mirrors the provider: (id int, dist double, geometry) —
    * sedona-testing/src/datagen.rs:305-310. JSON keys: num_rows,
    * num_partitions, seed, geometry_type (point|box|polygon), bounds
    * [xmin,ymin,xmax,ymax], vertices. */
  def table(spark: SparkSession, optionsJson: String): DataFrame = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(if (optionsJson == null || optionsJson.trim.isEmpty) "{}" else optionsJson)
    def i(k: String, d: Long): Long = if (node.has(k)) node.get(k).asLong(d) else d
    def s(k: String, d: String): String = if (node.has(k)) node.get(k).asText(d) else d
    val n = i("num_rows", 1024)
    val parts = i("num_partitions", 1).toInt
    val seed = i("seed", java.lang.Math.floorMod(scala.util.Random.nextLong(), 1000000L))
    val bounds =
      if (node.has("bounds") && node.get("bounds").isArray && node.get("bounds").size == 4)
        (0 until 4).map(j => node.get("bounds").get(j).asDouble())
      else Seq(0.0, 0.0, 100.0, 100.0)
    val geomOf = s("geometry_type", "point").toLowerCase match {
      case "box" | "envelope" | "rectangle" =>
        boxes(spark, n, seed, bounds(0), bounds(1), bounds(2), bounds(3))
      case "polygon" =>
        polygons(spark, n, seed, i("vertices", 8).toInt,
          bounds(0), bounds(1), bounds(2), bounds(3))
      case _ => points(spark, n, seed, bounds(0), bounds(1), bounds(2), bounds(3))
    }
    geomOf
      .repartition(math.max(parts, 1))
      .select(col("id").cast("int").as("id"),
        u(seed, 9, 0.0, 1.0)(col("id")).as("dist"),
        col("geom").as("geometry"))
  }

  /** Register `sd_random_geometry` as a SQL table-valued function. */
  def registerTable(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "sd_random_geometry",
      (exprs: Seq[Expression]) => {
        val json = exprs match {
          case Seq(Literal(v, _)) if v != null => v.toString
          case Seq() => "{}"
          case _ => throw new IllegalArgumentException(
            "sd_random_geometry() expects one string literal of JSON options")
        }
        table(SparkSession.active, json).queryExecution.logical
      },
      "built-in")
  }

  /** n random `nVertices`-gon polygons (star-convex around a center). */
  def polygons(spark: SparkSession, n: Long, seed: Long = 42, nVertices: Int = 8,
      xmin: Double = 0, ymin: Double = 0, xmax: Double = 100, ymax: Double = 100,
      radius: Double = 3): DataFrame = {
    val cx = u(seed, 1, xmin, xmax)(col("id"))
    val cy = u(seed, 2, ymin, ymax)(col("id"))
    val wkt = concat(lit("POLYGON (("),
      concat_ws(", ",
        transform(sequence(lit(0), lit(nVertices)), i => {
          val ang = (i % nVertices).cast("double") * (2 * math.Pi / nVertices)
          val r = lit(radius) * (lit(0.5) +
            pmod(hash(col("id"), (i % nVertices), lit(seed)), lit(500)).cast("double") / 1000.0)
          concat(cx + r * cos(ang), lit(" "), cy + r * sin(ang))
        })),
      lit("))"))
    spark.range(n).select(col("id"), st.geomFromWkt(wkt).as("geom"))
  }
}
