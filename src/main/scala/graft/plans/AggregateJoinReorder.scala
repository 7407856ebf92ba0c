package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Rotates `Join(Join(a, b, k), agg, a.x = agg.keys…)` into
  * `Join(Join(a, agg), b)` when the top condition's equalities bind ALL
  * of the aggregate's grouping outputs to one inner-join side.
  *
  * This is the shape Catalyst's decorrelation gives the classic SQL
  * as-of idiom
  *
  *   FROM l JOIN r ON l.k = r.k
  *   WHERE r.ts = (SELECT max(ts) FROM r r2 WHERE r2.k = l.k AND ts <= l.ts)
  *
  * — `Join(Join(l, r, l.k = r.k), Agg[k, d](max), r.ts = max AND l.k = k'
  * AND l.ts <=> d)`. Joining l to r first on the bare correlation key is
  * the quadratic intermediate the subquery was written to avoid (|l|·|r|
  * / |keys| rows); the aggregate's output is UNIQUE per grouping tuple,
  * so once the top condition equates every grouping output to l-side
  * expressions, `l ⨝ agg` holds at most |l| rows — a bound that needs no
  * statistics. Catalyst's own CostBasedJoinReorder only fires with
  * ANALYZE-collected stats, which ad-hoc queries don't have.
  *
  * Safety: all joins are INNER, so this is pure conjunct re-association;
  * every condition still references only attributes available at its
  * join. A `Project` restores the original output order. The rotation
  * declines when any conjunct spans all three inputs, when the sibling
  * side is itself a key-unique aggregate (no ping-pong), or when the
  * aggregate hides part of its grouping key (output no longer unique).
  *
  * `spark.graft.join.aggreorder.enabled=false` disables the rule.
  */
case class AggregateJoinReorderRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean = session.conf
    .get("spark.graft.join.aggreorder.enabled", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j @ Join(InnerEquiJoin(a, b, c1), g, Inner,
          Some(c2), JoinHint.NONE) if !j.isStreaming =>
        rotate(j, a, b, c1, g, c2).getOrElse(j)
    }

  /** An inner join with a condition, possibly under the column-pruning
    * attribute-only Project the main optimizer batch leaves on top —
    * rotation drops the Project (the final restore-Project re-prunes). */
  private object InnerEquiJoin {
    def unapply(p: LogicalPlan): Option[(LogicalPlan, LogicalPlan, Expression)] =
      p match {
        case Join(a, b, Inner, Some(c1), JoinHint.NONE) => Some((a, b, c1))
        case Project(pl, Join(a, b, Inner, Some(c1), JoinHint.NONE))
            if pl.forall(_.isInstanceOf[AttributeReference]) =>
          Some((a, b, c1))
        case _ => None
      }
  }

  /** The aggregate's grouping-derived output attrs, seen through Filter
    * and attribute-only Project wrappers — or Nil when the plan is not
    * an aggregate / does not surface its FULL grouping key (partial keys
    * do not make the output unique). */
  private def keyAttrs(p: LogicalPlan): Seq[Attribute] = p match {
    case f: Filter => keyAttrs(f.child)
    case pr: Project
        if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      val ks = keyAttrs(pr.child)
      if (ks.nonEmpty && ks.forall(pr.outputSet.contains)) ks else Nil
    case ag: Aggregate if ag.groupingExpressions.nonEmpty =>
      val surfaced: Seq[(Expression, Attribute)] =
        ag.aggregateExpressions.collect {
          case at: Attribute => (at: Expression, at)
          case al @ Alias(c, _) => (c, al.toAttribute)
        }
      val ks = ag.groupingExpressions.map(gk =>
        surfaced.find(_._1.semanticEquals(gk)).map(_._2))
      if (ks.forall(_.isDefined)) ks.flatten else Nil
    case _ => Nil
  }

  private def rotate(j: Join, a: LogicalPlan, b: LogicalPlan,
      c1: Expression, g: LogicalPlan, c2: Expression): Option[LogicalPlan] = {
    val gKeys = keyAttrs(g)
    if (gKeys.isEmpty) return None
    val gSet = g.outputSet
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val conj = split(c2)

    // partner p joins the aggregate first; sibling o joins after
    def attempt(p: LogicalPlan, o: LogicalPlan): Option[LogicalPlan] = {
      if (keyAttrs(o).nonEmpty) return None // both sides unique: leave it
      val pSet = p.outputSet
      val oSet = o.outputSet
      val innerConds = scala.collection.mutable.ArrayBuffer[Expression]()
      val outerConds = scala.collection.mutable.ArrayBuffer[Expression]()
      val bound = scala.collection.mutable.HashSet[ExprId]()
      conj.foreach { e =>
        val rO = e.references.exists(oSet.contains)
        val rP = e.references.exists(pSet.contains)
        val rG = e.references.exists(gSet.contains)
        if (rO && rP && rG) return None // spans all three: not separable
        else if (rO) outerConds += e
        else {
          innerConds += e
          // a grouping output equated to a p-side (or constant) expr
          e match {
            case EqualTo(x: Attribute, y)
                if gSet.contains(x) && y.references.forall(pSet.contains) =>
              bound += x.exprId
            case EqualTo(y, x: Attribute)
                if gSet.contains(x) && y.references.forall(pSet.contains) =>
              bound += x.exprId
            case EqualNullSafe(x: Attribute, y)
                if gSet.contains(x) && y.references.forall(pSet.contains) =>
              bound += x.exprId
            case EqualNullSafe(y, x: Attribute)
                if gSet.contains(x) && y.references.forall(pSet.contains) =>
              bound += x.exprId
            case _ => ()
          }
        }
      }
      if (!gKeys.forall(k => bound.contains(k.exprId))) return None
      val innerJoin = Join(p, g, Inner,
        innerConds.reduceOption(And), JoinHint.NONE)
      val outerCond = (c1 +: outerConds.toSeq).reduce(And)
      val rotated = Join(innerJoin, o, Inner, Some(outerCond), JoinHint.NONE)
      Some(Project(j.output, rotated))
    }

    attempt(a, b).orElse(attempt(b, a))
  }
}
