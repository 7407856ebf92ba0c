package graft.joins

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.physical._
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.index.strtree.{ItemBoundable, ItemDistance, STRtree}
import graft.geom.GeomIO

/** SQL-level KNN join: `q JOIN o ON st_knn(q.geom, o.geom, k)` — for every
  * query-side row, the k nearest object rows. Object side is broadcast and
  * indexed (STRtree) once per executor; ties at the kth distance are
  * resolved by a radius re-search ordered by (distance, object WKB), so
  * results are deterministic.
  *
  * Reference: ST_KNN stub + SpatialJoinPlanNode rewrite
  * (rust/sedona-functions/src/st_knn.rs:30-44,
  * rust/sedona-query-planner/src/optimizer.rs:140-195) and the tie
  * re-search of index/default_spatial_index.rs:359-430. The reference's
  * pushdown barrier caveat applies: place object-side filters in a
  * subquery if they must run BEFORE the kNN (Catalyst pushdown happens
  * before this strategy sees the plan).
  */
case class KnnJoinExec(
    queryPlan: SparkPlan,
    objectPlan: SparkPlan,
    queryGeom: Expression,
    objectGeom: Expression,
    k: Int,
    objectIsLeft: Boolean,
    spheroid: Boolean = false)
  extends BinaryExecNode {

  override def left: SparkPlan = if (objectIsLeft) objectPlan else queryPlan
  override def right: SparkPlan = if (objectIsLeft) queryPlan else objectPlan
  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] = {
    val b = BroadcastDistribution(IdentityBroadcastMode)
    if (objectIsLeft) Seq(b, UnspecifiedDistribution) else Seq(UnspecifiedDistribution, b)
  }

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  private class GeomDist extends ItemDistance with Serializable {
    override def distance(a: ItemBoundable, b: ItemBoundable): Double =
      a.getItem.asInstanceOf[(Geometry, Any)]._1
        .distance(b.getItem.asInstanceOf[(Geometry, Any)]._1)
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val broadcastRows = objectPlan.executeBroadcast[Array[InternalRow]]()
    val boundObjGeom = BindReferences.bindReference(objectGeom, objectPlan.output)
    val boundQueryGeom = BindReferences.bindReference(queryGeom, queryPlan.output)
    val kk = k
    val objLeft = objectIsLeft

    queryPlan.execute().mapPartitions { queryIter =>
      val objs = broadcastRows.value.flatMap { row =>
        val bytes = boundObjGeom.eval(row)
        if (bytes == null) None
        else Some((GeomIO.read(bytes.asInstanceOf[Array[Byte]]), row))
      }
      val tree = new STRtree()
      objs.foreach { case item @ (g, _) => tree.insert(g.getEnvelopeInternal, item) }
      if (objs.nonEmpty) tree.build()
      val itemDist = new GeomDist
      val joined = new JoinedRow()
      val sph = spheroid
      // spheroid + all-point object side (the typical KNN workload):
      // 3D unit-vector kd-tree, chord distance branch-and-bound — exact,
      // because chord is strictly monotone in great-circle distance.
      // Non-point objects (or query rows) fall back to the full rank.
      val chordTree: ChordKdTree =
        if (sph && objs.nonEmpty &&
            objs.forall(_._1.isInstanceOf[org.locationtech.jts.geom.Point])) {
          val t = new ChordKdTree(objs.length)
          objs.foreach { case (g, _) =>
            val c = g.getCoordinate; t.add(c.x, c.y)
          }
          t.build()
          t
        } else null
      queryIter.flatMap { qRow =>
        val bytes = boundQueryGeom.eval(qRow)
        if (bytes == null || objs.isEmpty) Iterator.empty
        else {
          val qg = GeomIO.read(bytes.asInstanceOf[Array[Byte]])
          val n = math.min(kk, objs.length)
          val cands =
            if (sph && chordTree != null &&
                qg.isInstanceOf[org.locationtech.jts.geom.Point]) {
              // exact chord-space branch-and-bound: kth chord distance,
              // then a chord-range sweep so kth-distance ties are all
              // present before the deterministic (distance, WKB-hash)
              // tie-break — same result set as the full rank
              val c = qg.getCoordinate
              val qv = chordTree.embed(c.x, c.y)
              val k2 = chordTree.kthDist2(qv, n)
              chordTree.range(qv, k2)
                .map { i =>
                  val (g, row) = objs(i)
                  (KnnJoinExec.geodesicDistance(qg, g), g, row)
                }
                .sortBy { case (d, g, _) =>
                  (d, java.util.Arrays.hashCode(GeomIO.write(g)).toLong)
                }
                .take(n)
            } else if (sph) {
              // geodesic metric with non-point geometries: planar
              // envelope distance is not a valid lower bound for meters —
              // rank the broadcast object set by great-circle distance
              // (closest planar point pair, haversine).
              objs
                .map { case (g, row) => (KnnJoinExec.geodesicDistance(qg, g), g, row) }
                .sortBy { case (d, g, _) =>
                  (d, java.util.Arrays.hashCode(GeomIO.write(g)).toLong)
                }
                .take(n)
            } else {
              val nearest =
                tree.nearestNeighbour(qg.getEnvelopeInternal, (qg, null), itemDist, n)
              val dk = nearest
                .map(o => qg.distance(o.asInstanceOf[(Geometry, InternalRow)]._1)).max
              val env = new Envelope(qg.getEnvelopeInternal)
              env.expandBy(dk)
              tree.query(env).toArray
                .map(_.asInstanceOf[(Geometry, InternalRow)])
                .map { case (g, row) => (qg.distance(g), g, row) }
                .filter(_._1 <= dk)
                .sortBy { case (d, g, _) =>
                  (d, java.util.Arrays.hashCode(GeomIO.write(g)).toLong)
                }
                .take(n)
            }
          numOutputRows += cands.length
          cands.iterator.map { case (_, _, oRow) =>
            if (objLeft) joined(oRow, qRow) else joined(qRow, oRow)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    if (objectIsLeft) copy(objectPlan = newLeft, queryPlan = newRight)
    else copy(queryPlan = newLeft, objectPlan = newRight)
}

object KnnJoinExec {
  /** Great-circle distance in meters between the planar-nearest points of
    * two lon/lat geometries (exact for point-point). */
  def geodesicDistance(a: Geometry, b: Geometry): Double = {
    val pts = org.locationtech.jts.operation.distance.DistanceOp.nearestPoints(a, b)
    graft.functions.Spherical.haversine(pts(0).x, pts(0).y, pts(1).x, pts(1).y)
  }
}
