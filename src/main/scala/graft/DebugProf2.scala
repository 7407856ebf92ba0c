package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling entry (not part of the driver contract): pc07
  * distributed-COPC gate stage attribution — writeTiled vs the 25
  * pruned readTiled queries. */
object DebugProf2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pc07-prof] $name rows=$r sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val base = "/tmp/graft_copc_prof"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val src = spark.range(60000).select(
      ((col("id") * 41) % 9600).cast("double")./(8.0).as("x"),
      ((col("id") * 67) % 7200).cast("double")./(8.0).as("y"),
      ((col("id") * 19) % 960).cast("double")./(8.0).as("z"),
      (col("id") % 60000).as("intensity"),
      (col("id") % 32).as("classification"),
      (col("id").cast("double") * 0.25).as("gps_time"))
    t("writeTiled") {
      graft.sources.Copc.writeTiled(src, base, scale = 0.125,
        maxPerNode = 1024, targetPerTile = 8000); 0L
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    t("writeTiled-warm") {
      graft.sources.Copc.writeTiled(src, base, scale = 0.125,
        maxPerNode = 1024, targetPerTile = 8000); 0L
    }
    t("reads-25") {
      (0 until 25).map { n =>
        val bx = (n * 83 % 1000).toDouble
        val by = (n * 61 % 800).toDouble
        graft.sources.Copc.readTiled(spark, base, Some((bx, by, bx + 120, by + 90)))
          .filter(col("x") >= bx && col("x") <= bx + 120 &&
            col("y") >= by && col("y") <= by + 90)
          .agg(count(lit(1)).as("npts"))
          .select(lit(n).cast("long").as("n"), col("npts"))
      }.reduce(_ unionAll _).count()
    }
    t("reads-25-again") {
      (0 until 25).map { n =>
        val bx = (n * 83 % 1000).toDouble
        val by = (n * 61 % 800).toDouble
        graft.sources.Copc.readTiled(spark, base, Some((bx, by, bx + 120, by + 90)))
          .filter(col("x") >= bx && col("x") <= bx + 120 &&
            col("y") >= by && col("y") <= by + 90)
          .agg(count(lit(1)).as("npts"))
          .select(lit(n).cast("long").as("n"), col("npts"))
      }.reduce(_ unionAll _).count()
    }
    spark.stop()
  }
}
