package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.st
import graft.operators.SpatialJoins

/** Scratch debug entry point (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    import spark.implicits._
    val q = Seq((1L, 0.0, 0.0), (2L, 5.0, 5.0)).toDF("qid", "x", "y")
      .withColumn("qpt", st.point(col("x"), col("y"))).select("qid", "qpt")
    val o = Seq((10L, 1.0, 1.0), (11L, 2.0, 2.0), (12L, 9.0, 9.0)).toDF("oid", "x", "y")
      .withColumn("opt", st.point(col("x"), col("y"))).select("oid", "opt")
    try {
      val dir = "/root/testdata/sf0.1"
      def audit(name: String, df: org.apache.spark.sql.DataFrame, needles: Seq[String]): Unit = {
        val plan = df.queryExecution.executedPlan.toString
        needles.foreach { n =>
          println(s"AUDIT $name [${if (plan.contains(n)) "OK " else "MISS"}] $n")
        }
      }
      audit("q01", SparkEntry.queries("q01_pricing_summary")(spark, dir),
        Seq("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate",
          "WholeStageCodegen", "partial_sum"))
      audit("sj01", SparkEntry.queries("sj01_intersects_join")(spark, dir),
        Seq("BroadcastIndexSpatialJoin", "BroadcastExchange"))
      audit("q02", SparkEntry.queries("q02_top_revenue")(spark, dir),
        Seq("BroadcastHashJoin", "TakeOrderedAndProject"))
      audit("sj05", SparkEntry.queries("sj05_grid_join")(spark, dir),
        Seq("ShuffledHashJoin", "SortMergeJoin"))
      audit("pl04", SparkEntry.queries("pl04_minhash_pairs")(spark, dir),
        Seq("InMemoryTableScan", "HashAggregate"))
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(s"TIMER $name: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
      }
      time("pl01-first")(SparkEntry.queries("pl01_text_stats")(spark, dir).count())
      time("pl01-second")(SparkEntry.queries("pl01_text_stats")(spark, dir).count())
    } catch {
      case e: Throwable =>
        var t: Throwable = e
        while (t != null) { println(s"CAUSE: ${t.getClass.getName}: ${t.getMessage}"); t = t.getCause }
    }
    spark.stop()
  }
}
