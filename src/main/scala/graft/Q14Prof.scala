package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q14Prof {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q14-prof] $name rows=$r sec=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val l = Tables.t(spark, dir, "lineitem")
    (0 until 3).foreach { rep =>
      t(s"ntile-half rep$rep") {
        graft.operators.ScalableRank.globalNtile(
          l.select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")), 4, "tile")
        .groupBy(col("tile")).agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty")).count()
      }
      t(s"pct-half rep$rep") {
        l.groupBy(col("l_returnflag"))
          .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("m"),
            round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
            round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75")).count()
      }
    }
    spark.stop()
  }
}
