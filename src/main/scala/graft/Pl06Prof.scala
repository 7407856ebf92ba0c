package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Pl06Prof {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    import graft.pipeline.{PipelineOps, TextOps}
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pl06-prof] $name rows=$r sec=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val docs = Tables.t(spark, dir, "documents")
    (0 until 3).foreach { rep =>
      t(s"shingle-build rep$rep") {
        docs.select(col("source").as("__blk"), col("doc_id"),
          array_sort(array_distinct(TextOps.shingleHashes(TextOps.tokens(col("text")), 3))).as("sh"))
          .write.format("noop").mode("overwrite").save(); 0L
      }
      t(s"full rep$rep") {
        PipelineOps.ngramJaccardPairs(docs, col("doc_id"), col("text"),
          col("source"), k = 3, minJaccard = 0.03).count()
      }
    }
    spark.stop()
  }
}
