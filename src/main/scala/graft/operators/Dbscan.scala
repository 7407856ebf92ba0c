package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed DBSCAN (Ester et al., KDD'96), composed from the engine's
  * own scale primitives instead of a bespoke clusterer:
  *
  *   1. eps-neighbor pairs from the partitioned GRID join — one cell
  *      equi-shuffle, reference-cell dedup, never an all-pairs product;
  *   2. core points from one degree aggregation
  *      (|N_eps(p)| >= minPts, N including p itself);
  *   3. cluster ids from the size-adaptive connected components of the
  *      core-core subgraph (`PipelineOps.connectedComponents` — local
  *      union-find when the edge list is small, pointer-jumping label
  *      propagation at scale), min core id per component;
  *   4. border points (non-core with a core neighbor) attach to the
  *      MINIMUM cluster id among their core neighbors — a deterministic
  *      restatement of DBSCAN's order-dependent border assignment that
  *      an oracle can reproduce; everything else is noise.
  *
  * Output: (id, role 'core'|'border'|'noise', cluster — null for noise).
  * Every stage is a shuffle-bounded DataFrame op, so the operator
  * inherits AQE sizing and scales with the neighbor-graph size, not the
  * point-pair product.
  */
object Dbscan {

  def dbscan(df: DataFrame, id: Column, geom: Column, eps: Double,
      minPts: Int, bounds: Option[(Double, Double, Double, Double)] = None,
      nx: Int = 64, ny: Int = 64): DataFrame = {
    require(eps > 0 && minPts >= 1, s"dbscan: bad eps=$eps minPts=$minPts")
    import org.apache.spark.sql.graft.DatasetBridge
    val spark = df.sparkSession
    // lineage barrier: `pts` and `pairs` fan into many downstream
    // branches (degree, core-core semi joins, border assignment, final
    // join); leaving the full subtree in each branch makes the
    // analyzer's DeduplicateRelations pass traverse an exponentially
    // shared DAG (minutes of driver CPU at planning time). Re-entering
    // through an InternalRow RDD leaf keeps each branch's plan O(1)
    // while the persist serves the actual recomputation.
    def barrier(d: DataFrame): DataFrame =
      DatasetBridge.internalDf(spark,
        graft.CacheRegistry.register(
          d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          .queryExecution.toRdd,
        d.schema)
    val pts = barrier(df.select(id.cast("long").as("__pid"), geom.as("__pg")))
    val l = pts.select(col("__pid").as("__ida"), col("__pg").as("__ga"))
    val r = pts.select(col("__pid").as("__idb"), col("__pg").as("__gb"))
    val pairs = barrier(
      SpatialJoins.gridJoin(l, r, col("__ga"), col("__gb"), "st_dwithin",
          bounds, nx, ny, distance = Some(lit(eps)))
        .filter(col("__ida") =!= col("__idb"))
        .select(col("__ida"), col("__idb")))
    val cores = pairs.groupBy(col("__ida")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") + 1 >= minPts)
      .select(col("__ida").as("__pid"))
    // core-core subgraph -> components; a core with no core neighbor is
    // its own singleton cluster
    val coreEdges = pairs
      .join(cores.select(col("__pid").as("__ida")), Seq("__ida"), "left_semi")
      .join(cores.select(col("__pid").as("__idb")), Seq("__idb"), "left_semi")
    val cc = graft.pipeline.PipelineOps
      .connectedComponents(coreEdges, col("__ida"), col("__idb"))
    val coreCl = cores.join(cc, cores("__pid") === cc("id"), "left_outer")
      .select(cores("__pid"), coalesce(col("group_id"), cores("__pid")).as("__ccl"))
    // border = non-core with >= 1 core neighbor, min cluster among them
    val bAssign = pairs
      .join(coreCl.select(col("__pid").as("__idb"), col("__ccl")), Seq("__idb"))
      .join(coreCl.select(col("__pid").as("__ida")), Seq("__ida"), "left_anti")
      .groupBy(col("__ida"))
      .agg(min(col("__ccl")).as("__bcl"))
      .select(col("__ida").as("__pid"), col("__bcl"))
    pts
      .join(coreCl, Seq("__pid"), "left_outer")
      .join(bAssign, Seq("__pid"), "left_outer")
      .select(col("__pid").as("id"),
        when(col("__ccl").isNotNull, lit("core"))
          .when(col("__bcl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("__ccl"), col("__bcl")).as("cluster"))
  }
}
