package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.st
import graft.operators.SpatialJoins

/** Scratch profiling entry (not part of the driver contract).
  * Current shape: gs01 DBSCAN m=N stage attribution — eps-pair grid
  * join vs core/CC vs full chain. */
object DebugProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val m = args.headOption.map(_.toInt).getOrElse(100)
    val sq = math.sqrt(m.toDouble)
    val w = 200.0 * sq; val hh = 120.0 * sq
    val n = 20000L * m
    def u(c: org.apache.spark.sql.Column, salt: Int) =
      pmod(hash(c * 31 + salt), lit(1000000)).cast("double") / 1000000.0
    val pts = spark.range(n).select(col("id"),
      st.point(
        (u(col("id"), 301) * (w * 2).toLong.toDouble).cast("long")
          .cast("double") / 2.0,
        (u(col("id"), 302) * (hh * 2).toLong.toDouble).cast("long")
          .cast("double") / 2.0).as("pt"))
    val nx = math.max(16, (80 * sq).toInt)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gs01-prof m=$m] $name rows=$r sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // stage 1: eps-pair grid join alone (materialized via count)
    val l = pts.select(col("id").as("__ida"), col("pt").as("__ga"))
    val r = pts.select(col("id").as("__idb"), col("pt").as("__gb"))
    val pairs = SpatialJoins.gridJoin(l, r, col("__ga"), col("__gb"),
        "st_dwithin", Some((0.0, 0.0, w, hh)), nx, nx,
        distance = Some(lit(1.5)))
      .filter(col("__ida") =!= col("__idb"))
      .select(col("__ida"), col("__idb"))
      .persist()
    t("eps-pairs")(pairs.count())
    // stage 2: degree filter + core-core CC on the materialized pairs
    val cores = pairs.groupBy(col("__ida")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") + 1 >= 4).select(col("__ida").as("__pid")).persist()
    t("cores")(cores.count())
    val coreEdges = pairs
      .join(cores.select(col("__pid").as("__ida")), Seq("__ida"), "left_semi")
      .join(cores.select(col("__pid").as("__idb")), Seq("__idb"), "left_semi")
    t("core-cc") {
      graft.pipeline.PipelineOps
        .connectedComponents(coreEdges, col("__ida"), col("__idb")).count()
    }
    println(s"[gs01-prof] cc rounds = ${graft.pipeline.PipelineOps.lastCcRounds.get()}")
    pairs.unpersist(); cores.unpersist()
    // full chain for the same data (fresh, its own persists)
    t("full-dbscan") {
      graft.operators.Dbscan.dbscan(pts, col("id"), col("pt"),
        eps = 1.5, minPts = 4, bounds = Some((0.0, 0.0, w, hh)),
        nx = nx, ny = nx).count()
    }
    spark.stop()
  }
}
