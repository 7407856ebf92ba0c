package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.st

/** Scratch profiling entry (not part of the driver contract): sj14/sj13
  * sphere-join stage attribution — dwithin leg vs intersects leg vs the
  * cover/refine kernels in isolation. */
object DebugProf3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sj14-prof] $name rows=$r sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    def tbl(n: String) = Tables.t(spark, dir, n)
    tbl("customer")
      .withColumn("cpt", st.point((col("c_custkey") % 720).cast("double") / 2.0 - 180.0,
        (col("c_custkey") % 356).cast("double") / 2.0 - 89.0))
      .select(col("c_custkey").cast("long").as("c_custkey"), col("cpt"))
      .createOrReplaceTempView("sj14_c")
    tbl("supplier")
      .withColumn("spt", st.point((col("s_suppkey") % 720).cast("double") / 2.0 - 179.75,
        (col("s_suppkey") % 356).cast("double") / 2.0 - 88.75))
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("spt"))
      .createOrReplaceTempView("sj14_s")
    tbl("part")
      .withColumn("qxmin", (col("p_partkey") % 60).cast("double") * 6.0 - 180.0)
      .withColumn("qymin", (col("p_size") % 28).cast("double") * 6.0 - 84.0)
      .withColumn("quad", st.makeEnvelope(col("qxmin"), col("qymin"),
        col("qxmin") + 2.0, col("qymin") + 2.0))
      .select(col("p_partkey").cast("long").as("p_partkey"), col("quad"))
      .createOrReplaceTempView("sj14_q")
    tbl("orders")
      .withColumn("pt", st.point((col("o_orderkey") % 120).cast("double") * 3.0 - 179.75,
        (col("o_custkey") % 56).cast("double") * 3.0 - 83.75))
      .select(col("o_orderkey").cast("long").as("o_orderkey"), col("pt"))
      .createOrReplaceTempView("sj14_p")
    (0 until 2).foreach { rep =>
      t(s"dwithin leg rep$rep") {
        spark.sql("""SELECT c_custkey AS ka, s_suppkey AS kb
          FROM sj14_c JOIN sj14_s ON st_dwithinsphere(cpt, spt, 250000.0D)""").count()
      }
      t(s"intersects leg rep$rep") {
        spark.sql("""SELECT p_partkey AS ka, o_orderkey AS kb
          FROM sj14_q JOIN sj14_p ON st_intersectssphere(quad, pt)""").count()
      }
      t(s"point env4+dualcells rep$rep") {
        spark.table("sj14_p")
          .withColumn("__r4", st.f("sd_envelopesphere4", col("pt")))
          .withColumn("__cell", explode(st.f("sd_gridcells_sphere4_dual",
            col("__r4"), lit(0.0), lit(360), lit(180))))
          .select(col("__cell")).count()
      }
      t(s"quad env4+adaptivecells rep$rep") {
        spark.table("sj14_q")
          .withColumn("__l4", st.f("sd_envelopesphere4", col("quad")))
          .withColumn("__cell", explode(st.f("sd_gridcells_sphere4_adaptive",
            col("__l4"), lit(0.0), lit(360), lit(180), lit(256))))
          .select(col("__cell")).count()
      }
    }
    spark.stop()
  }
}
