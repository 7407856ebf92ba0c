package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.st
import graft.operators.SpatialJoins

/** Scratch profiling entry (not part of the driver contract). */
object DebugProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val m = args.headOption.map(_.toInt).getOrElse(10)
    def sqrtM = math.sqrt(m.toDouble)
    val w = 2000.0 * sqrtM; val h = 1000.0 * sqrtM
    val nx = math.max(8, (32 * sqrtM).toInt)
    def u(c: org.apache.spark.sql.Column, salt: Int) =
      pmod(hash(c * 31 + salt), lit(1000000)).cast("double") / 1000000.0
    val o = spark.range(0, 20000L * m).toDF("id")
      .select(col("id").as("oid"),
        st.point(u(col("id"), 61) * (w * 0.4), u(col("id"), 62) * h).as("opt"))
    val q = spark.range(0, 1500L * m).toDF("id")
      .withColumn("iso", pmod(col("id"), lit(10)) < 3)
      .select(col("id").as("qid"), st.point(
        when(col("iso"), lit(0.8) * w + u(col("id"), 63) * (w * 0.15))
          .otherwise(u(col("id"), 63) * (w * 0.38)),
        u(col("id"), 64) * h).as("qpt"))
    val j = SpatialJoins.knnJoinGrid(q, o, col("qpt"), col("opt"), 3,
      col("oid"), nx = nx, ny = nx, bounds = Some((0.0, 0.0, w, h)))
    val t0 = System.nanoTime()
    println("rows=" + j.count() + " sec=" + (System.nanoTime() - t0) / 1e9)
    println(j.queryExecution.executedPlan.treeString.take(20000))
    spark.stop()
  }
}
