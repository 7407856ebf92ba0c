package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{GeomScalar, RasterFunctions}

/** Raster-geometry join support (reference:
  * rust/sedona-spatial-join-raster/src/physical_planner.rs —
  * RS_Intersects/RS_Contains/RS_Within with one raster and one geometry
  * operand are planned onto the spatial-join machinery, with the raster
  * operand pinned to the probe side).
  *
  * Our RS_ relation predicates are envelope-based by definition
  * (rs_intersects = raster extent envelope vs geometry, RasterFunctions),
  * so a join-condition rewrite is exact, not approximate:
  *
  *   RS_Intersects(r, g)  =>  ST_Intersects(RS_Envelope(r), g)
  *   RS_Contains(r, g)    =>  ST_Contains(RS_Envelope(r), g)
  *   RS_Within(r, g)      =>  ST_Within(RS_Envelope(r), g)
  *
  * after which every ordinary spatial-join path applies unchanged: the
  * broadcast index join when the geometry side fits the threshold (the
  * geometry side builds the index, raster envelopes probe — the
  * reference's probe-side pinning falls out for free), or the
  * grid-partitioned shuffle join for large-large. Raster/raster joins are
  * left alone (the reference declines them too — no fixed common CRS).
  */
object RasterJoinRule extends Rule[LogicalPlan] {

  private val preds = Map(
    "rs_intersects" -> "st_intersects",
    "rs_contains" -> "st_contains",
    "rs_within" -> "st_within")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, _, Some(cond), _) =>
      var changed = false
      val newCond = cond.transform {
        case GeomScalar(name, Seq(r, g), _, _, _)
            if preds.contains(name) && crossSides(r, g, left, right) =>
          changed = true
          val env = RasterFunctions.registry("rs_envelope")(Seq(r))
          graft.functions.GeomScalars.registry(preds(name))(Seq(env, g))
      }
      if (changed) j.copy(condition = Some(newCond)) else j
  }

  /** Both operands resolve to a single (opposite) join side — the only
    * shape the join machinery can index; same-side usages stay scalar. */
  private def crossSides(r: Expression, g: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean = {
    val ls = left.outputSet
    val rs = right.outputSet
    (r.references.subsetOf(ls) && g.references.subsetOf(rs) &&
      r.references.nonEmpty && g.references.nonEmpty) ||
    (r.references.subsetOf(rs) && g.references.subsetOf(ls) &&
      r.references.nonEmpty && g.references.nonEmpty)
  }
}
