package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.st

/** Scratch profiling entry (not part of the driver contract): gs01
  * DBSCAN gate-scale stage attribution — pair build, degree, CC,
  * assembly — plus Spark job count/time via a listener. */
object DebugProf5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(e.jobId, e.time)
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(starts.remove(e.jobId)).foreach(s => jobMs.addAndGet(e.time - s))
      }
    })
    def t(name: String)(f: => Long): Unit = {
      val j0 = jobs.get(); val m0 = jobMs.get()
      val t0 = System.nanoTime()
      val r = f
      println(f"[gs01-prof] $name rows=$r sec=${(System.nanoTime() - t0) / 1e9}%.2f " +
        s"jobs=${jobs.get() - j0} jobMs=${jobMs.get() - m0}")
    }
    def pts0(s: SparkSession) = Tables.t(s, sfDir, "orders")
      .filter(col("o_orderkey") % 7 === 3 && col("o_orderkey") < 15000)
      .withColumn("x", ((col("o_orderkey") * 7) % 200).cast("double"))
      .withColumn("y", ((col("o_custkey") * 11) % 120).cast("double"))
      .select(col("o_orderkey").cast("long").as("oid"),
        st.point(col("x"), col("y")).as("pt"))
    (0 until 3).foreach { rep =>
      t(s"full gate rep$rep") {
        graft.operators.Dbscan.dbscan(pts0(spark), col("oid"), col("pt"),
          eps = 2.5, minPts = 4,
          bounds = Some((0.0, 0.0, 200.0, 120.0)), nx = 80, ny = 48).count()
      }
    }
    // stage pieces
    val pts = pts0(spark)
    val l = pts.select(col("oid").as("__ida"), col("pt").as("__ga"))
    val r = pts.select(col("oid").as("__idb"), col("pt").as("__gb"))
    (0 until 2).foreach { rep =>
      t(s"pairs-only rep$rep") {
        graft.operators.SpatialJoins.gridJoin(l, r, col("__ga"), col("__gb"),
            "st_dwithin", Some((0.0, 0.0, 200.0, 120.0)), 80, 48,
            distance = Some(lit(2.5)))
          .filter(col("__ida") =!= col("__idb")).count()
      }
    }
    spark.stop()
  }
}
