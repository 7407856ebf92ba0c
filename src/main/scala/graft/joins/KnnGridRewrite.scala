package graft.joins

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DatasetBridge
import graft.plans.KnnJoinPlan
import graft.operators.SpatialJoins

/** Plans a KNN join whose OBJECT side is too large to broadcast as the
  * partitioned two-round grid KNN (SpatialJoins.knnJoinGrid) — the SQL
  * analog of the reference's out-of-core kNN
  * (probe/knn_results_merger.rs): nothing broadcast, three shuffles,
  * exact top-k. The rewrite wraps the logical children in DataFrames,
  * composes the grid algorithm, and projects the result back onto the
  * original join output (exprIds preserved).
  *
  * This MUST happen at logical-optimization time, not in the strategy:
  * AQE re-plans the remaining logical plan after every stage, and a
  * strategy-level rewrite would rebuild the whole composition (including
  * its bounds pre-pass jobs) on every re-plan. One-shot here, AQE then
  * only ever sees the composed relational plan. (The reference makes the
  * same placement choice for its KNN rewrite, optimizer.rs:140-195.)
  *
  * Ties at the kth distance break on xxhash64 of the object WKB
  * (deterministic), which may order exact ties differently than the
  * broadcast exec's tie rule — both are valid kNN sets.
  */
object KnnGridRewrite {

  /** Rewrite applies only when query/object column names are disjoint and
    * don't collide with the helper columns. Both metrics qualify: planar
    * goes through the euclidean grid, spheroid through the geodesic
    * (st_gridcells_sphere) grid — no KNN shape is broadcast-only. */
  def applicable(p: KnnJoinPlan): Boolean = {
    val (q, o) = if (p.objectIsLeft) (p.right, p.left) else (p.left, p.right)
    val qn = q.output.map(_.name).toSet
    val on = o.output.map(_.name).toSet
    qn.intersect(on).isEmpty &&
      !(qn ++ on).exists(n => n == "knn_distance" || n == "knn_rank")
  }

  def plan(spark: SparkSession, p: KnnJoinPlan): LogicalPlan = {
    val (queryChild, objectChild) = if (p.objectIsLeft) (p.right, p.left) else (p.left, p.right)
    val qDF = DatasetBridge.ofRows(spark, queryChild)
    val oDF = DatasetBridge.ofRows(spark, objectChild)
    val tie = xxhash64(call_function("st_asbinary", DatasetBridge.column(p.objectGeom)))
      .cast("double")
    // grid resolution is a deployment knob (cells should track object
    // density so a round-1 neighbourhood holds ~k candidates); read at
    // RULE level — plan-time confs belong to rules, never gate bodies
    def conf(key: String, dflt: Int): Int =
      spark.conf.getOption(key).map(_.toInt).getOrElse(dflt)
    val joined = (if (p.spheroid)
        SpatialJoins.knnJoinGridSphere(
          qDF, oDF, DatasetBridge.column(p.queryGeom), DatasetBridge.column(p.objectGeom),
          p.k, tie,
          nx = conf("spark.graft.knn.sphere.nx", 90),
          ny = conf("spark.graft.knn.sphere.ny", 45))
      else SpatialJoins.knnJoinGrid(
        qDF, oDF, DatasetBridge.column(p.queryGeom), DatasetBridge.column(p.objectGeom),
        p.k, tie,
        nx = conf("spark.graft.knn.grid.nx", 32),
        ny = conf("spark.graft.knn.grid.ny", 32)))
      .drop("knn_distance", "knn_rank")
    // use the OPTIMIZED inner plan (planLater skips optimization of
    // handed-in subtrees), then remap the output onto the original join
    // attributes by name — knnJoinGrid's internal self-joins renumber the
    // query-side exprIds
    val inner = joined.queryExecution.optimizedPlan
    val byName = inner.output.map(a => a.name -> a).toMap
    val projList = p.output.map { orig: Attribute =>
      Alias(byName(orig.name), orig.name)(exprId = orig.exprId)
    }
    Project(projList, inner)
  }
}

/** Optimizer rule: rewrite large-object KNN joins (captured KnnJoinPlan
  * nodes, or raw `Join ON st_knn(...)` when the analyzer capture isn't
  * installed) into the partitioned grid KNN plan.
  * `spark.graft.knn.broadcastThreshold` bytes gates the switch
  * (default 256 MB; -1 = always broadcast). */
case class KnnGridJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def threshold: Long =
    session.conf.getOption("spark.graft.knn.broadcastThreshold")
      .map(_.toLong).getOrElse(256L * 1024 * 1024)

  private def objBig(p: KnnJoinPlan): Boolean = {
    val t = threshold
    val obj = if (p.objectIsLeft) p.left else p.right
    t >= 0 && obj.stats.sizeInBytes > t
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p: KnnJoinPlan if objBig(p) && KnnGridRewrite.applicable(p) =>
      KnnGridRewrite.plan(session, p)
    case j @ Join(left, right, jt, Some(
        graft.functions.GeomScalar("st_knn", args, _, _, _)), _)
        if (jt == Inner || jt == Cross)
          && args.length >= 2 && args.length <= 4 && args.drop(2).forall(_.foldable) =>
      val Seq(a, b) = args.take(2)
      val k = if (args.length < 3) 1 else args(2).eval() match { // default k = 1
        case n: java.lang.Number => n.intValue()
        case d: org.apache.spark.sql.types.Decimal => d.toInt
      }
      val sph = args.length == 4 && args(3).eval() == true
      val pOpt =
        if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
          Some(KnnJoinPlan(left, right, a, b, k, objectIsLeft = false, spheroid = sph))
        else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          Some(KnnJoinPlan(left, right, a, b, k, objectIsLeft = true, spheroid = sph))
        else None
      pOpt match {
        case Some(p) if objBig(p) && KnnGridRewrite.applicable(p) =>
          KnnGridRewrite.plan(session, p)
        case _ => j
      }
  }
}
