package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions`-style registration (reference analog:
  * SedonaContext::new_local_interactive wiring the planner chain,
  * rust/sedona/src/context.rs:110-269).
  *
  * Builds on what `GraftExtensions.install` cannot do post-session: the
  * KNN capture runs at ANALYSIS time, before predicate pushdown — the
  * pushdown barrier of SURVEY §2.4. Use:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftSparkSessionExtensions")
  *
  * Function registration still happens via GraftExtensions.install (the
  * registry is session-state-scoped either way).
  */
class GraftSparkSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(_ => graft.plans.KnnJoinCaptureRule)
    ext.injectOptimizerRule(_ => graft.plans.GeoPruneRule)
    ext.injectOptimizerRule(_ => graft.plans.RasterJoinRule)
    ext.injectOptimizerRule(spark => graft.plans.GridSpatialJoinRule(spark))
    ext.injectOptimizerRule(spark => graft.joins.KnnGridJoinRule(spark))
    ext.injectOptimizerRule(_ => graft.plans.RasterLoadRule)
    ext.injectPlannerStrategy(spark => graft.joins.SpatialJoinStrategy(spark))
  }
}
