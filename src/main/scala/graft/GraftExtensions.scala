package graft

import org.apache.spark.sql.SparkSession

/** Central registration point for everything the engine adds to a stock
  * SparkSession: spatial functions, spatial-join strategy, optimizer rules.
  * Idempotent — safe to call on every entry point.
  */
object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    // default the streaming state store to RocksDB (spilled to local
    // disk, bounded executor heap) unless the user chose a provider.
    // Measured (ScaleBench r12, m=1 vs m=10): RocksDB costs a constant
    // at toy scale (st03 10.9s vs heap 5.6s at m=1) but is the only
    // provider that stays near-linear as state grows — st03 at 10x
    // events: RocksDB 51.6s (4.8x) vs heap 89.7s (15.9x, super-linear);
    // st08 a wash. The at-scale provider is the right default; gate-
    // scale microbenchmarks should pin the heap store explicitly.
    // NB: conf.getOption is the wrong probe here — the key has a
    // built-in default (HDFSBackedStateStoreProvider), so getOption is
    // always Some(...). Only the explicitly-set maps (session settings
    // + SparkConf from spark-submit) tell us whether the USER chose one.
    val ssProviderKey = "spark.sql.streaming.stateStore.providerClass"
    val userChoseProvider =
      spark.sessionState.conf.contains(ssProviderKey) ||
        spark.sparkContext.getConf.contains(ssProviderKey)
    if (!userChoseProvider) {
      // CAVEAT: Spark cannot change state-store providers across restarts
      // of the SAME checkpoint. A streaming query resuming from a
      // checkpoint written under the default HDFSBackedStateStoreProvider
      // must pin spark.sql.streaming.stateStore.providerClass explicitly
      // (either provider) — this default only intends to cover fresh
      // checkpoints. Warn loudly so the switch is never silent.
      org.apache.log4j.Logger.getLogger(getClass.getName).warn(
        s"graft: defaulting $ssProviderKey to RocksDBStateStoreProvider. " +
          "Streaming queries resuming from checkpoints written under a " +
          "different provider must set this key explicitly — Spark does " +
          "not support changing the state store provider of an existing " +
          "checkpoint.")
      spark.conf.set(ssProviderKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing: per-commit cost becomes the delta
      // upload, not a full snapshot — matters for REMOTE checkpoint
      // storage; measured a wash on local disk (st03 m=10: 51.6s on
      // vs 54.0s off). Same explicitly-set-only guard.
      val clKey =
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
      if (!spark.sessionState.conf.contains(clKey) &&
          !spark.sparkContext.getConf.contains(clKey))
        spark.conf.set(clKey, "true")
    }
    graft.functions.GraftFunctions.register(spark)
    graft.sources.RandomGeometry.registerTable(spark)
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[graft.joins.SpatialJoinStrategy]))
      spark.experimental.extraStrategies =
        cur :+ graft.joins.SpatialJoinStrategy(spark)
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(graft.plans.GeoPruneRule))
      spark.experimental.extraOptimizations = opts :+ graft.plans.GeoPruneRule
    val optsR = spark.experimental.extraOptimizations
    if (!optsR.contains(graft.plans.RasterJoinRule))
      spark.experimental.extraOptimizations = optsR :+ graft.plans.RasterJoinRule
    val opts2 = spark.experimental.extraOptimizations
    if (!opts2.exists(_.isInstanceOf[graft.plans.GridSpatialJoinRule]))
      spark.experimental.extraOptimizations =
        opts2 :+ graft.plans.GridSpatialJoinRule(spark)
    val opts3 = spark.experimental.extraOptimizations
    if (!opts3.exists(_.isInstanceOf[graft.joins.KnnGridJoinRule]))
      spark.experimental.extraOptimizations =
        opts3 :+ graft.joins.KnnGridJoinRule(spark)
    val opts4 = spark.experimental.extraOptimizations
    if (!opts4.contains(graft.plans.RasterLoadRule))
      spark.experimental.extraOptimizations = opts4 :+ graft.plans.RasterLoadRule
    val opts5 = spark.experimental.extraOptimizations
    if (!opts5.exists(_.isInstanceOf[graft.plans.BandedRangeJoinRule]))
      spark.experimental.extraOptimizations =
        opts5 :+ graft.plans.BandedRangeJoinRule(spark)
    val opts5a = spark.experimental.extraOptimizations
    if (!opts5a.exists(_.isInstanceOf[graft.plans.SemiUnderDistinctRule]))
      spark.experimental.extraOptimizations =
        opts5a :+ graft.plans.SemiUnderDistinctRule(spark)
    // must precede AsOfAggregateRule within the batch: the rotation
    // matches the Aggregate node the as-of rewrite then replaces
    val opts5b = spark.experimental.extraOptimizations
    if (!opts5b.exists(_.isInstanceOf[graft.plans.AggregateJoinReorderRule]))
      spark.experimental.extraOptimizations =
        opts5b :+ graft.plans.AggregateJoinReorderRule(spark)
    // between the rotation (which creates the Join(probe, agg) shape)
    // and the bare-aggregate rewrite (which would consume the Aggregate)
    val opts5c = spark.experimental.extraOptimizations
    if (!opts5c.exists(_.isInstanceOf[graft.plans.AsOfProbeJoinRule]))
      spark.experimental.extraOptimizations =
        opts5c :+ graft.plans.AsOfProbeJoinRule(spark)
    val opts6 = spark.experimental.extraOptimizations
    if (!opts6.exists(_.isInstanceOf[graft.plans.AsOfAggregateRule]))
      spark.experimental.extraOptimizations =
        opts6 :+ graft.plans.AsOfAggregateRule(spark)
    val opts7 = spark.experimental.extraOptimizations
    if (!opts7.exists(_.isInstanceOf[graft.plans.SphereJoinRule]))
      spark.experimental.extraOptimizations =
        opts7 :+ graft.plans.SphereJoinRule(spark)
  }
}
