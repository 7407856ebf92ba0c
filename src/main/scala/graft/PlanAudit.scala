package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("sj07_planner_grid_join", "sj08_sphere_join", "pl13_stratified_sample", "pl14_embed_quantize", "q15_grouping_sets", "rs02_zonal_stats")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      println(s"=== $q ===")
      println("  BNLJ: " + p.contains("BroadcastNestedLoopJoin"))
      println("  SMJ/SHJ: " + (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")))
      println("  BHJ: " + p.contains("BroadcastHashJoin"))
      println("  WholeStageCodegen spans: " + "WholeStageCodegen".r.findAllIn(p).length)
      println("  partial agg: " + p.contains("partial"))
    }
    spark.stop()
  }
}
