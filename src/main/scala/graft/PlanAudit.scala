package graft
import org.apache.spark.sql.SparkSession

/** Plan guardrail: sweeps every gate query's physical plan for
  * scale-hostile operators (BroadcastNestedLoopJoin on a non-broadcastable
  * pattern, CartesianProduct) and prints per-query join strategy. Run after
  * operator changes — a silent fallback to BNLJ is a perf regression long
  * before it's a correctness one. */
object PlanAudit {
  // pl08 brute-force cosine is an intentional broadcast NLJ (exact
  // baseline over a broadcast corpus); everything else must avoid it
  private val allowedBnlj = Set("pl08_cosine_topk", "pl11_ivf_ann")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val bnlj = p.contains("BroadcastNestedLoopJoin")
        val cart = p.contains("CartesianProduct")
        val tags = Seq(
          if (p.contains("BroadcastIndexSpatialJoin")) Some("spatial-idx") else None,
          if (p.contains("KnnJoin ")) Some("knn") else None,
          if (p.contains("SortMergeJoin")) Some("smj") else None,
          if (p.contains("ShuffledHashJoin")) Some("shj") else None,
          if (p.contains("BroadcastHashJoin")) Some("bhj") else None,
          if (bnlj) Some("BNLJ") else None,
          if (cart) Some("CARTESIAN") else None).flatten
        val flag = (bnlj && !allowedBnlj(name)) || cart
        if (flag) bad += 1
        println(f"[audit] $name%-28s ${tags.mkString(",")}${if (flag) "  <-- FLAG" else ""}")
      } catch {
        case e: Exception => println(s"[audit] $name ERROR ${e.getMessage}"); bad += 1
      }
    }
    println(s"[audit] flagged=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
