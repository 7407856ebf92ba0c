package graft
import org.apache.spark.sql.SparkSession
/** Scratch profiling entry (not part of the driver contract): per-gate
  * Spark job count + summed job wall, bench-identical timing. */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    args.foreach { n =>
      (0 until 3).foreach { rep =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val r = try SparkEntry.queries(n)(spark, sfDir).count() catch { case _: Throwable => -1L }
        println(f"[jobprof] $n rep=$rep rows=$r sec=${(System.nanoTime() - t0) / 1e9}%.2f jobs=${jobs.get() - j0}")
      }
    }
    spark.stop()
  }
}
