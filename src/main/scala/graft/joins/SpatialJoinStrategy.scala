package graft.joins

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans joins whose condition carries a spatial predicate into
  * BroadcastIndexSpatialJoinExec. Mirrors the reference's
  * SpatialJoinLogicalRewrite + physical planner chain
  * (rust/sedona-query-planner/src/optimizer.rs:197-260,
  * spatial_join_physical_planner.rs:45-97), collapsed into one Catalyst
  * Strategy: Catalyst's PushPredicateThroughJoin already folds
  * Filter-over-cross-join into the join condition (the reference needed
  * MergeSpatialFilterIntoJoin for this, optimizer.rs:313-339).
  *
  * Build-side choice by plan statistics (reference spatial_join_reordering,
  * option.rs:105-108). Joins with an equi-conjunct are left to Spark's
  * hash joins, matching the reference (optimizer.rs:253-257): a hash join
  * on the equi key beats an index join that ignores it.
  *
  * Falls back (Nil) when no side fits the broadcast threshold — Spark plans
  * BNLJ; for large-large use graft.operators.SpatialJoins.gridJoin, the
  * shuffle-partitioned path.
  */
case class SpatialJoinStrategy(spark: SparkSession) extends SparkStrategy {

  private def hasEquiConjunct(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, And}
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    split(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }
  }

  /** Broadcast-indexed KNN exec. Large object sides never reach here —
    * KnnGridJoinRule rewrites them at logical-optimization time (a
    * strategy-level rewrite would be rebuilt by every AQE re-plan). */
  private def planKnn(p: graft.plans.KnnJoinPlan): Seq[SparkPlan] = {
    val (queryChild, objectChild) =
      if (p.objectIsLeft) (p.right, p.left) else (p.left, p.right)
    KnnJoinExec(planLater(queryChild), planLater(objectChild),
      p.queryGeom, p.objectGeom, p.k, p.objectIsLeft, p.spheroid) :: Nil
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // KNN join captured at analysis time (pushdown-barrier node)
    case p: graft.plans.KnnJoinPlan => planKnn(p)

    // KNN join: ST_KNN(query_geom, object_geom[, k[, use_spheroid]]);
    // omitted k defaults to 1 (test_knnjoin.py test_knn_join_default_k)
    case Join(left, right, joinType, Some(
        graft.functions.GeomScalar("st_knn", args, _, _, _)), _)
        if (joinType == Inner || joinType == Cross)
          && args.length >= 2 && args.length <= 4 && args.drop(2).forall(_.foldable) =>
      val Seq(a, b) = args.take(2)
      val k = if (args.length < 3) 1 else args(2).eval() match {
        case n: java.lang.Number => n.intValue()
        case d: org.apache.spark.sql.types.Decimal => d.toInt
      }
      val sph = args.length == 4 && args(3).eval() == true
      if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        planKnn(graft.plans.KnnJoinPlan(left, right, a, b, k,
          objectIsLeft = false, spheroid = sph))
      else if (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        planKnn(graft.plans.KnnJoinPlan(left, right, a, b, k,
          objectIsLeft = true, spheroid = sph))
      else Nil

    case Join(left, right, joinType, Some(cond), _)
        if (joinType match {
          case Inner | Cross | LeftOuter | RightOuter |
               LeftSemi | LeftAnti | _: ExistenceJoin => true
          case _ => false
        }) && !hasEquiConjunct(cond, left, right) =>
      SpatialPredicate.extract(cond, left, right) match {
        case Some(ex) =>
          val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
          val leftSize = left.stats.sizeInBytes
          val rightSize = right.stats.sizeInBytes
          // the preserved side must stream: it can never be the
          // broadcast build (a broadcast of the preserved side would
          // need cross-partition match bookkeeping to pad/emit/suppress)
          val leftPreserved = joinType match {
            case LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin => true
            case _ => false
          }
          val rightPreserved = joinType == RightOuter
          val canBroadcastLeft = leftSize >= 0 && leftSize <= threshold && !leftPreserved
          val canBroadcastRight = rightSize >= 0 && rightSize <= threshold && !rightPreserved
          // prefer the smaller broadcastable side as build
          val buildLeft =
            if (canBroadcastLeft && canBroadcastRight) leftSize <= rightSize
            else canBroadcastLeft
          if (!canBroadcastLeft && !canBroadcastRight) Nil
          else {
            // distance must be evaluable on the stream side
            val streamSide = if (buildLeft) right else left
            val distOk = ex.distance.forall(_.references.subsetOf(streamSide.outputSet))
            if (!distOk) Nil
            else {
              // orient predicate as pred(streamG, buildG)
              val (streamGeom, buildGeom, streamPred) =
                if (buildLeft) (ex.rightGeom, ex.leftGeom, SpatialPredicate.invert(ex.predName))
                else (ex.leftGeom, ex.rightGeom, ex.predName)
              BroadcastIndexSpatialJoinExec(
                buildPlan = planLater(if (buildLeft) left else right),
                streamPlan = planLater(streamSide),
                buildGeom = buildGeom,
                streamGeom = streamGeom,
                predName = streamPred,
                distance = ex.distance,
                buildIsLeft = buildLeft,
                joinType = joinType,
                extraCondition = ex.remainder) :: Nil
            }
          }
        case None => Nil
      }
    case _ => Nil
  }
}
