package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{GeomScalar, RasterFunctions}

/** Wraps the raster argument of every pixel-reading function in
  * rs_ensureloaded, making byte materialization an explicit expression
  * the engine can deduplicate (whole-stage codegen's subexpression
  * elimination collapses repeated rs_ensureloaded of the same raster in a
  * projection). The Spark re-expression of the reference's `needs_pixels`
  * planner pass (rust/sedona-query-planner/src/ensure_loaded.rs:18-36):
  * metadata-only functions keep reading the outdb ref for free; only
  * pixel access pays the load.
  */
object RasterLoadRule extends Rule[LogicalPlan] {

  private val ensure = graft.functions.RasterFunctions.registry("rs_ensureloaded")

  private def alreadyWrapped(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e match {
      case GeomScalar("rs_ensureloaded", _, _, _, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case gs @ GeomScalar(name, children, _, _, _)
        if RasterFunctions.needsPixels(name) &&
          !RasterFunctions.windowedAccess(name) && !alreadyWrapped(children.head) =>
      // windowedAccess kernels stay UNwrapped: they fetch only the
      // cached pixel blocks their geometry touches (the out-db scale
      // path) instead of materializing the whole scene
      gs.copy(children = ensure(Seq(children.head)) +: children.tail)
  }
}
