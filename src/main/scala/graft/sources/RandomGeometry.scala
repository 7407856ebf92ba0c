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
