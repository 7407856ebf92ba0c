package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch profiling entry (not part of the driver contract): streaming
  * gate micro-batch attribution — prints every StreamingQueryProgress
  * JSON (durationMs breakdown: addBatch / getBatch / queryPlanning /
  * walCommit / commitOffsets, per-operator state commit times) around
  * the wall-clock of each gate run. Usage:
  *   run_main.sh graft.DebugProf4 st03_stream_stream_spatial_join ...
  */
object DebugProf4 {
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
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream-start] ${e.name} wall=${System.nanoTime() / 1e9}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        println("[stream-progress] " + e.progress.json)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream-end] wall=${System.nanoTime() / 1e9}")
    })
    val names = if (args.nonEmpty) args.toSeq
      else Seq("st03_stream_stream_spatial_join")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    names.foreach { n =>
      (0 until reps).foreach { i =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[gate] $n rep=$i rows=$rows sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
