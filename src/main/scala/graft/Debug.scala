package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.st
import graft.operators.SpatialJoins

/** Scratch debug entry point (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
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
      SpatialJoins.knnJoin(q, o, col("qpt"), col("opt"), 2, col("oid")).show()
      val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents").limit(5)
        .withColumn("blob", col("text").cast("binary"))
      graft.pipeline.MultimodalOps.decodeBatch(docs, "blob", "img")
        .select("doc_id", "media_meta.*", "features.*").show(truncate = false)
    } catch {
      case e: Throwable =>
        var t: Throwable = e
        while (t != null) { println(s"CAUSE: ${t.getClass.getName}: ${t.getMessage}"); t = t.getCause }
    }
    spark.stop()
  }
}
