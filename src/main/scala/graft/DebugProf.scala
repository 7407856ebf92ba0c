package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{PipelineOps, TextOps}

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
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.t(spark, dir, "documents")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    (0 until 3).foreach { _ =>
      time("sig-only") {
        docs.select(col("doc_id"),
          TextOps.minhashSignatureTok(TextOps.tokens(col("text")), 3, 12).as("mh")).count()
      }
      time("minhashPairs") {
        PipelineOps.minhashPairs(docs, col("doc_id"), col("text"), 12, 4).count()
      }
      time("dedupGroups-full") {
        val pairs = PipelineOps.minhashPairs(docs, col("doc_id"), col("text"), 12, 4)
        PipelineOps.dedupGroups(pairs, col("doc_a"), col("doc_b")).count()
      }
    }
    spark.stop()
  }
}
