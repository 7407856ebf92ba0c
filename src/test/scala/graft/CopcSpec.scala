package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sources.{Copc, LasIO}

/** COPC octree point cloud: write/read roundtrip, hierarchy-driven
  * bbox-pruned reads, and routing of COPC files through the generic LAS
  * reader. */
class CopcSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  // deterministic cloud over a 1000x800 m footprint; scale 0.001 keeps
  // the quantized coordinates exactly representable (multiples of 1/8)
  private def cloud(n: Int) = spark.range(n).select(
    (pmod(hash(col("id"), lit(1)), lit(8000)).cast("double") / 8.0).as("x"),
    (pmod(hash(col("id"), lit(2)), lit(6400)).cast("double") / 8.0).as("y"),
    (pmod(hash(col("id"), lit(3)), lit(800)).cast("double") / 8.0).as("z"),
    pmod(hash(col("id"), lit(4)), lit(60000)).cast("long").as("intensity"),
    pmod(hash(col("id"), lit(5)), lit(32)).cast("long").as("classification"),
    (col("id").cast("double") * 0.25).as("gps_time"))

  private def key(r: org.apache.spark.sql.Row): (Double, Double, Double, Long, Long, Double) =
    (r.getAs[Double]("x"), r.getAs[Double]("y"), r.getAs[Double]("z"),
      r.getAs[Long]("intensity"), r.getAs[Long]("classification"),
      r.getAs[Double]("gps_time"))

  test("write/read roundtrip across a multi-node octree; LasIO routes COPC") {
    val src = cloud(20000)
    val path = "/tmp/graft_copc_spec/cloud.copc.laz"
    Copc.write(src, path, scale = 0.125, maxPerNode = 1024)
    val back = Copc.read(spark, path)
    assert(back.count() == 20000)
    val a = src.collect().map(key).sorted
    val b = back.collect().map(key).sorted
    assert(a.sameElements(b), "full COPC roundtrip must be value-exact")
    // the generic LAS entry point must detect the copc VLR and route
    val viaLas = LasIO.read(spark, path)
    assert(viaLas.count() == 20000)
    assert(viaLas.collect().map(key).sorted.sameElements(a))
    // the octree genuinely split (multiple >0-point leaves)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val flen = fs.getFileStatus(new org.apache.hadoop.fs.Path(path)).getLen
    val in = fs.open(new org.apache.hadoop.fs.Path(path))
    val (_, info, leaves) = try Copc.meta((off, n) => {
      val buf = new Array[Byte](n); in.readFully(off, buf); buf
    }, flen) finally in.close()
    assert(leaves.count(_.pointCount > 0) > 8, s"only ${leaves.length} leaves")
    assert(leaves.map(_.pointCount.toLong).sum == 20000)
    assert(info.halfsize > 0)
  }

  test("distributed tiled write: multi-file roundtrip value-exact, bbox prunes files") {
    val src = cloud(30000)
    val dir = "/tmp/graft_copc_spec/tiled"
    // small tiles force a real multi-octant split (level >= 1)
    graft.sources.Copc.writeTiled(src, dir, scale = 0.125,
      maxPerNode = 512, targetPerTile = 4000)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val tiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".copc.laz"))
    assert(tiles.length >= 8, s"expected a real octant split, got ${tiles.length} tiles")
    val back = graft.sources.Copc.readTiled(spark, dir)
    assert(back.count() == 30000)
    assert(back.collect().map(key).sorted.sameElements(src.collect().map(key).sorted),
      "tiled roundtrip must be value-exact")
    // bbox query: correct subset, and the header prune visits fewer tiles
    val (bx0, by0, bx1, by1) = (100.0, 100.0, 260.0, 240.0)
    val got = graft.sources.Copc.readTiled(spark, dir, Some((bx0, by0, bx1, by1)))
      .filter(col("x") >= bx0 && col("x") <= bx1 &&
        col("y") >= by0 && col("y") <= by1)
      .collect().map(key).sorted
    val expect = src.filter(col("x") >= bx0 && col("x") <= bx1 &&
        col("y") >= by0 && col("y") <= by1)
      .collect().map(key).sorted
    assert(got.nonEmpty && got.sameElements(expect))
    // empty-intersection query keeps the schema and returns nothing
    assert(graft.sources.Copc.readTiled(spark, dir,
      Some((1e7, 1e7, 1e7 + 1, 1e7 + 1))).count() == 0)
    // generic entry points route the tile directory too
    assert(graft.sources.LasIO.read(spark, dir).count() == 30000)
    assert(graft.sources.Geo.read(spark, dir).count() == 30000)
  }

  test("writer emits the WKT global-encoding bit and an OGC WKT CRS VLR") {
    // LAS 1.4 + point formats 6-8 REQUIRE WKT CRS storage: global
    // encoding bit 4 set and a LASF_Projection/2112 VLR present — strict
    // external readers (PDAL, lastools) reject or warn otherwise
    val path = "/tmp/graft_copc_spec/wkt.copc.laz"
    Copc.write(cloud(500), path, scale = 0.125, maxPerNode = 256)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    val globalEnc = (buf(6) & 0xff) | ((buf(7) & 0xff) << 8)
    assert((globalEnc & 0x0010) != 0, "global-encoding WKT bit must be set")
    val txt = new String(buf, "ISO-8859-1")
    val vlrAt = txt.indexOf("LASF_Projection")
    assert(vlrAt > 0, "OGC WKT CRS VLR (LASF_Projection) must be present")
    // record id 2112 sits right after the 16-byte user id field
    val rid = (buf(vlrAt + 16) & 0xff) | ((buf(vlrAt + 17) & 0xff) << 8)
    assert(rid == 2112, s"projection VLR record id must be 2112, got $rid")
    assert(txt.contains("ENGCRS["), "WKT2 payload present")
    // and the file still roundtrips through the reader
    assert(Copc.read(spark, path).count() == 500)
  }

  test("format 7 (RGB) roundtrip through the octree writer") {
    val src = cloud(5000)
      .withColumn("red", pmod(hash(col("x"), lit(11)), lit(65536)).cast("long"))
      .withColumn("green", pmod(hash(col("y"), lit(12)), lit(65536)).cast("long"))
      .withColumn("blue", pmod(hash(col("z"), lit(13)), lit(65536)).cast("long"))
    val path = "/tmp/graft_copc_spec/rgb.copc.laz"
    Copc.write(src, path, scale = 0.125, maxPerNode = 700)
    val back = Copc.read(spark, path)
    assert(back.columns.contains("red") && back.count() == 5000)
    def rkey(r: org.apache.spark.sql.Row) = (key(r),
      r.getAs[Long]("red"), r.getAs[Long]("green"), r.getAs[Long]("blue"))
    assert(src.collect().map(rkey).sorted.sameElements(
      back.collect().map(rkey).sorted), "fmt7 roundtrip must carry RGB exactly")
  }

  test("bbox read prunes to intersecting nodes and misses no in-box point") {
    val src = cloud(20000)
    val path = "/tmp/graft_copc_spec/cloud2.copc.laz"
    Copc.write(src, path, scale = 0.125, maxPerNode = 1024)
    val bbox = (100.0, 150.0, 300.0, 320.0)
    val pruned = Copc.read(spark, path, Some(bbox)).cache()
    val inBox = pruned.filter(col("x") >= bbox._1 && col("x") <= bbox._3 &&
      col("y") >= bbox._2 && col("y") <= bbox._4)
    val expectInBox = src.filter(col("x") >= bbox._1 && col("x") <= bbox._3 &&
      col("y") >= bbox._2 && col("y") <= bbox._4)
    assert(inBox.count() == expectInBox.count(),
      "every in-box point must be inside some selected node")
    assert(inBox.collect().map(key).sorted
      .sameElements(expectInBox.collect().map(key).sorted))
    // economics: the node selection decoded well under the whole cloud
    val total = 20000L
    val decoded = pruned.count()
    assert(decoded < total / 4,
      s"bbox covering ~4% of the footprint decoded $decoded of $total points")
    pruned.unpersist()
  }

  test("readMulti ≡ per-box read, per query id (single file and tiled)") {
    val src = cloud(20000)
    val path = "/tmp/graft_copc_spec/cloud3.copc.laz"
    Copc.write(src, path, scale = 0.125, maxPerNode = 1024)
    // overlapping boxes (a node can serve several qids) + one empty box
    val boxes: Seq[(Long, (Double, Double, Double, Double))] = Seq(
      0L -> (100.0, 150.0, 300.0, 320.0),
      1L -> (250.0, 200.0, 500.0, 400.0),
      2L -> (2000.0, 2000.0, 2100.0, 2100.0)) // outside the footprint
    val multi = Copc.readMulti(spark, path, boxes).cache()
    boxes.foreach { case (qid, b) =>
      val single = Copc.read(spark, path, Some(b)).collect().map(key).sorted
      val tagged = multi.filter(col("qid") === qid).drop("qid")
        .collect().map(key).sorted
      assert(tagged.sameElements(single), s"qid=$qid candidate set diverged")
    }
    multi.unpersist()

    val dirT = "/tmp/graft_copc_spec/tiled_multi"
    Copc.writeTiled(src, dirT, scale = 0.125, maxPerNode = 1024,
      targetPerTile = 5000)
    val multiT = Copc.readTiledMulti(spark, dirT, boxes).cache()
    boxes.foreach { case (qid, b) =>
      val single = Copc.readTiled(spark, dirT, Some(b)).collect().map(key).sorted
      val tagged = multiT.filter(col("qid") === qid).drop("qid")
        .collect().map(key).sorted
      assert(tagged.sameElements(single), s"tiled qid=$qid candidate set diverged")
    }
    multiT.unpersist()
  }

  test("gate aggregate shape: an empty box still emits one row (npts=0, null aggs)") {
    // the pc06/pc07 shape (opt r18, ADVICE r17): grouped aggregate over
    // the tagged scan LEFT-joined back to the static box list — output
    // arity must be invariant to box emptiness, matching the old
    // per-box global-aggregate contract (count=0 row with null min/max)
    val src = cloud(20000)
    val path = "/tmp/graft_copc_spec/cloud4.copc.laz"
    Copc.write(src, path, scale = 0.125, maxPerNode = 1024)
    val boxes: Seq[(Long, (Double, Double, Double, Double))] = Seq(
      0L -> (100.0, 150.0, 300.0, 320.0),
      1L -> (2000.0, 2000.0, 2100.0, 2100.0)) // intentionally empty
    val agged = Copc.readMulti(spark, path, boxes)
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("npts"), sum(col("intensity")).as("sum_int"),
        min(col("gps_time")).as("min_gps"), max(col("gps_time")).as("max_gps"))
    val out = spark.range(0, 2).select(col("id").as("qid"))
      .join(agged, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("npts"), lit(0L)).as("npts"),
        col("sum_int"), col("min_gps"), col("max_gps"))
      .collect().sortBy(_.getLong(0))
    assert(out.length == 2, "one row per box regardless of emptiness")
    assert(out(0).getLong(1) > 0L)
    val empty = out(1)
    assert(empty.getLong(1) == 0L, "empty box emits npts=0")
    assert(empty.isNullAt(2) && empty.isNullAt(3) && empty.isNullAt(4),
      "empty box emits null sum/min/max")
  }
}
