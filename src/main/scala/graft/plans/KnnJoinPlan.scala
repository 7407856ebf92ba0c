package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.GeomScalar

/** Logical KNN-join node. Captured at ANALYSIS time (post-hoc resolution)
  * so that Catalyst's predicate pushdown never sees a plain Join: filters
  * written above the join stay above it, i.e. they apply to the kNN
  * *result*, not to the object set the neighbours are drawn from.
  *
  * This replicates the reference's KnnJoinEarlyRewrite placement *before*
  * PushDownFilter (rust/sedona-query-planner/src/optimizer.rs:140-195) —
  * the pushdown barrier falls out of the node being opaque to the
  * optimizer's Join/Filter rules.
  */
case class KnnJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    queryGeom: Expression,
    objectGeom: Expression,
    k: Int,
    objectIsLeft: Boolean,
    spheroid: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Analyzer-stage rule: Join ON st_knn(q, o, k[, use_spheroid]) ->
  * KnnJoinPlan. */
object KnnJoinCaptureRule extends Rule[LogicalPlan] {
  private def intOf(e: Expression): Int = e.eval() match {
    case n: java.lang.Number => n.intValue()
    case d: org.apache.spark.sql.types.Decimal => d.toInt
  }
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _, Some(
        GeomScalar("st_knn", args, _, _, _)), _)
        if j.resolved && args.length >= 2 && args.length <= 4
          && args.drop(2).forall(_.foldable) =>
      val Seq(a, b) = args.take(2)
      val k = if (args.length >= 3) intOf(args(2)) else 1 // default k = 1
      val sph = args.length == 4 && args(3).eval() == true
      if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        KnnJoinPlan(left, right, a, b, k, objectIsLeft = false, spheroid = sph)
      else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        KnnJoinPlan(left, right, a, b, k, objectIsLeft = true, spheroid = sph)
      else j
  }
}
