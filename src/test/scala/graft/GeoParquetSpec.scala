package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.functions.GraftFunctions.st
import graft.sources.GeoParquet

class GeoParquetSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
  }
  override def afterAll(): Unit = spark.stop()

  private def sample: DataFrame =
    spark.range(2000).select(col("id"),
      st.makeEnvelope(
        (pmod(hash(col("id")), lit(1000))).cast("double"),
        (pmod(hash(col("id") * 3), lit(1000))).cast("double"),
        (pmod(hash(col("id")), lit(1000))).cast("double") + 2.0,
        (pmod(hash(col("id") * 3), lit(1000))).cast("double") + 2.0).as("geom"))

  test("write/read round trip preserves geometry values, CRS metadata, sidecar") {
    val dir = Files.createTempDirectory("gp").toString + "/t1"
    GeoParquet.write(sample, dir, "geom", crs = "EPSG:3857")
    val back = GeoParquet.read(spark, dir)
    assert(back.count() == 2000)
    assert(GeoParquet.geometryColumns(back) == Seq("geom" -> "EPSG:3857"))
    assert(back.columns.contains("geom_bbox"))
    // same geometry multiset
    val a = sample.select(st.asText(col("geom"))).collect().map(_.getString(0)).sorted
    val b = back.select(st.asText(col("geom"))).collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_geo.json"))).contains("\"covering\""))
  }

  test("spatial filter is rewritten to bbox ranges and pushed to parquet") {
    val dir = Files.createTempDirectory("gp").toString + "/t2"
    GeoParquet.write(sample, dir, "geom")
    val back = GeoParquet.read(spark, dir)
    val q = back.filter(st.intersects(col("geom"),
      st.makeEnvelope(lit(100.0), lit(100.0), lit(300.0), lit(300.0))))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("geom_bbox.xmin"),
      plan.take(3000))
    // pruned result ≡ brute force on the raw data
    val expected = sample.filter(st.intersects(col("geom"),
      st.makeEnvelope(lit(100.0), lit(100.0), lit(300.0), lit(300.0))))
      .select("id").collect().map(_.getLong(0)).sorted
    val actual = q.select("id").collect().map(_.getLong(0)).sorted
    assert(actual.sameElements(expected))
  }

  test("dwithin filter prunes with expanded envelope") {
    val dir = Files.createTempDirectory("gp").toString + "/t3"
    GeoParquet.write(sample, dir, "geom")
    val back = GeoParquet.read(spark, dir)
    val q = back.filter(st.dwithin(col("geom"), st.point(lit(500.0), lit(500.0)), lit(50.0)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("geom_bbox.xmin"), plan.take(3000))
    val expected = sample.filter(st.dwithin(col("geom"), st.point(lit(500.0), lit(500.0)), lit(50.0))).count()
    assert(q.count() == expected)
  }

  test("FlatGeobuf roundtrip: all geometry types, nulls, property types") {
    import graft.sources.FlatGeobuf
    val wkts = Seq(
      "POINT (1 2)",
      "LINESTRING (0 0, 1 1, 2 0.5)",
      "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))",
      "MULTIPOINT ((1 1), (2 3))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))",
      "MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)), ((5 5, 5 7, 7 7, 7 5, 5 5), (5.5 5.5, 5.5 6, 6 6, 6 5.5, 5.5 5.5)))")
    import spark.implicits._
    val df = wkts.zipWithIndex.map { case (w, i) =>
      (i.toLong, if (i % 3 == 0) null else s"name_$i", i * 1.5, i % 2 == 0, i, w)
    }.toDF("id", "label", "score", "flag", "small", "wkt")
      .withColumn("geom", st.geomFromWkt(col("wkt")))
      .drop("wkt")
    val path = "/tmp/graft_fgb_spec"
    FlatGeobuf.write(df, path, "geom")
    val back = FlatGeobuf.read(spark, path, "geom")
    assert(back.schema.fieldNames.toSet == df.schema.fieldNames.toSet)
    def snap(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.select(col("id"), col("label"), col("score"), col("flag"), col("small"),
          st.asText(col("geom")).as("wkt"))
        .collect().map(_.toString).sorted.toSeq
    assert(snap(back) == snap(df))
  }

  test("FlatGeobuf packed R-tree: bbox read matches full-scan filter") {
    import graft.sources.FlatGeobuf
    // 1000 points -> multi-level tree (1000 leaves, 63 + 4 + 1 nodes)
    val pts = spark.range(1000).select(col("id"),
      st.point(pmod(hash(col("id") * 7 + 1), lit(1000)).cast("double"),
        pmod(hash(col("id") * 13 + 2), lit(1000)).cast("double")).as("geom"))
      .repartition(2)
    val path = "/tmp/graft_fgb_idx"
    FlatGeobuf.write(pts, path, "geom", index = true)
    val q = (200.0, 300.0, 600.0, 800.0)
    val viaIndex = FlatGeobuf.read(spark, path, "geom", bbox = Some(q))
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    val full = FlatGeobuf.read(spark, path, "geom")
    val expected = full
      .filter(st.x(col("geom")).between(q._1, q._3)
        && st.y(col("geom")).between(q._2, q._4))
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(expected.nonEmpty && viaIndex == expected, s"${viaIndex.size} vs ${expected.size}")
    // unindexed files honor the same bbox semantics (post-decode filter)
    FlatGeobuf.write(pts, path + "_noidx", "geom")
    val noIdx = FlatGeobuf.read(spark, path + "_noidx", "geom", bbox = Some(q))
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(noIdx == expected)
  }
}
