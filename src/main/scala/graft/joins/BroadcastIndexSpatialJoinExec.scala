package graft.joins

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.physical._
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.index.strtree.STRtree
import graft.geom.GeomIO

/** Broadcast index spatial join: build side is broadcast, an STRtree over
  * its geometries is built once per executor (soft-cached by broadcast id),
  * and each streamed row probes the tree and refines candidates with a
  * prepared geometry.
  *
  * This is the Spark-native analog of the reference's build/probe/refine
  * SpatialJoinExec (rust/sedona-spatial-join/src/exec.rs:80-88) with its
  * Hilbert-packed R-tree (index/default_spatial_index.rs:36) and prepared-
  * geometry refinement (refine/exec_mode_selector.rs). Broadcast replaces
  * the OnceAsync build-side collection; at cluster scale the build side
  * ships once per executor, the probe side never moves — zero shuffle.
  *
  * Join types (reference SpatialJoinExec covers the same set,
  * test_sjoin.py): Inner/Cross either orientation; LeftOuter, LeftSemi,
  * LeftAnti, ExistenceJoin (mark join, the EXISTS-in-OR rewrite) with the
  * stream on the left; RightOuter with the stream on the right. The
  * preserved side always streams — only the non-preserved side is
  * broadcast, so no match is ever lost to broadcasting.
  */
case class BroadcastIndexSpatialJoinExec(
    buildPlan: SparkPlan,
    streamPlan: SparkPlan,
    buildGeom: Expression,
    streamGeom: Expression,
    /** predicate oriented as pred(streamG, buildG) */
    predName: String,
    distance: Option[Expression], // bound to stream side; st_dwithin only
    buildIsLeft: Boolean,
    joinType: JoinType,
    extraCondition: Option[Expression])
  extends BinaryExecNode {

  override def left: SparkPlan = if (buildIsLeft) buildPlan else streamPlan
  override def right: SparkPlan = if (buildIsLeft) streamPlan else buildPlan

  override def output: Seq[Attribute] = joinType match {
    case Inner | Cross => left.output ++ right.output
    case LeftOuter =>
      require(!buildIsLeft, "left-outer requires the stream on the left")
      left.output ++ right.output.map(_.withNullability(true))
    case RightOuter =>
      require(buildIsLeft, "right-outer requires the stream on the right")
      left.output.map(_.withNullability(true)) ++ right.output
    case LeftSemi | LeftAnti =>
      require(!buildIsLeft, "semi/anti joins stream the left side")
      left.output
    case ExistenceJoin(exists) =>
      require(!buildIsLeft, "existence join streams the left side")
      left.output :+ exists
    case t => throw new IllegalStateException(s"unsupported spatial join type $t")
  }

  override def requiredChildDistribution: Seq[Distribution] = {
    val b = BroadcastDistribution(IdentityBroadcastMode)
    if (buildIsLeft) Seq(b, UnspecifiedDistribution) else Seq(UnspecifiedDistribution, b)
  }

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "candidatePairs" -> SQLMetrics.createMetric(sparkContext, "index candidate pairs"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val candidatePairs = longMetric("candidatePairs")
    val broadcastRows = buildPlan.executeBroadcast[Array[InternalRow]]()
    val boundBuildGeom = BindReferences.bindReference(buildGeom, buildPlan.output)
    val boundStreamGeom = BindReferences.bindReference(streamGeom, streamPlan.output)
    val boundDistance = distance.map(BindReferences.bindReference(_, streamPlan.output))
    // the extra condition sees the full (left ++ right) pair row, even for
    // join types whose OUTPUT omits the build side
    val pairAttrs = left.output ++ right.output
    val boundExtra = extraCondition.map(BindReferences.bindReference(_, pairAttrs))
    val pred = predName
    val bIsLeft = buildIsLeft
    val jt = joinType
    val buildWidth = buildPlan.output.size
    val appId = sparkContext.applicationId

    streamPlan.execute().mapPartitions { streamIter =>
      val tree = BroadcastIndexSpatialJoinExec.treeFor(appId, broadcastRows, boundBuildGeom)
      val joined = new JoinedRow()
      val nullBuild = new GenericInternalRow(buildWidth)
      val existsTrue = new GenericInternalRow(Array[Any](true))
      val existsFalse = new GenericInternalRow(Array[Any](false))
      streamIter.flatMap { streamRow =>
        val gBytes = boundStreamGeom.eval(streamRow)
        val matches: Iterator[InternalRow] =
          if (gBytes == null) Iterator.empty
          else {
            val sg = GeomIO.read(gBytes.asInstanceOf[Array[Byte]])
            val env = new Envelope(sg.getEnvelopeInternal)
            val dist = boundDistance.map(_.eval(streamRow) match {
              // SQL `st_dwithin(a, b, 2.0)` carries a DECIMAL literal
              case d: org.apache.spark.sql.types.Decimal => d.toDouble
              case n: Number => n.doubleValue()
            })
            dist.foreach(d => env.expandBy(d))
            val candidates = tree.query(env)
            if (candidates.isEmpty) Iterator.empty
            else {
              val nCand = candidates.size()
              candidatePairs += nCand
              // Speculative prepare (reference option.rs:276-301 /
              // exec_mode_selector.rs): building the prepared geometry's
              // edge index costs more than one or two plain relate ops, so
              // only prepare when enough index hits will amortize it.
              val prepared: PreparedGeometry =
                if (dist.isEmpty && nCand >= BroadcastIndexSpatialJoinExec.prepareThreshold)
                  PreparedGeometryFactory.prepare(sg)
                else null
              val it = candidates.iterator()
              new Iterator[(Geometry, InternalRow)] {
                override def hasNext: Boolean = it.hasNext
                override def next(): (Geometry, InternalRow) =
                  it.next().asInstanceOf[(Geometry, InternalRow)]
              }.filter { case (bg, _) =>
                dist match {
                  case Some(d) => sg.isWithinDistance(bg, d)
                  case None =>
                    if (prepared != null)
                      BroadcastIndexSpatialJoinExec.refine(prepared, pred, bg)
                    else BroadcastIndexSpatialJoinExec.refineDirect(sg, pred, bg)
                }
              }.map { case (_, buildRow) =>
                if (bIsLeft) joined(buildRow, streamRow) else joined(streamRow, buildRow)
              }
            }
          }
        val filtered = boundExtra match {
          case Some(c) => matches.filter(r => java.lang.Boolean.TRUE == c.eval(r))
          case None => matches
        }
        jt match {
          case Inner | Cross =>
            filtered.map { r => numOutputRows += 1; r }
          case LeftOuter | RightOuter =>
            var any = false
            val out = filtered.map { r => any = true; numOutputRows += 1; r }
            // emit the null-padded row lazily after the matches are exhausted
            new Iterator[InternalRow] {
              private var doneExtra = false
              override def hasNext: Boolean = out.hasNext || (!any && !doneExtra)
              override def next(): InternalRow =
                if (out.hasNext) out.next()
                else {
                  doneExtra = true; numOutputRows += 1
                  if (bIsLeft) joined(nullBuild, streamRow)
                  else joined(streamRow, nullBuild)
                }
            }
          case LeftSemi =>
            if (filtered.hasNext) { numOutputRows += 1; Iterator.single(streamRow) }
            else Iterator.empty
          case LeftAnti =>
            if (filtered.hasNext) Iterator.empty
            else { numOutputRows += 1; Iterator.single(streamRow) }
          case ExistenceJoin(_) =>
            numOutputRows += 1
            Iterator.single(new JoinedRow(streamRow,
              if (filtered.hasNext) existsTrue else existsFalse))
          case t => throw new IllegalStateException(s"unsupported spatial join type $t")
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    if (buildIsLeft) copy(buildPlan = newLeft, streamPlan = newRight)
    else copy(streamPlan = newLeft, buildPlan = newRight)
}

object BroadcastIndexSpatialJoinExec {
  /** Executor-local soft cache: one STRtree per broadcast build side, not
    * one per task (the reference builds its index once per join via
    * OnceAsync, exec.rs:44-46). Keyed by (applicationId, broadcast id):
    * broadcast ids restart at 0 with every new SparkContext, and a local
    * JVM can host several contexts over its lifetime — a bare-id key
    * serves stale trees across contexts. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.ref.SoftReference[STRtree]]()

  def treeFor(appId: String, b: Broadcast[Array[InternalRow]],
      geomExpr: Expression): STRtree = {
    val key = (appId, b.id)
    val ref = cache.get(key)
    val cached = if (ref != null) ref.get() else null
    if (cached != null) return cached
    synchronized {
      val again = cache.get(key)
      val c2 = if (again != null) again.get() else null
      if (c2 != null) return c2
      val tree = new STRtree()
      b.value.foreach { row =>
        val bytes = geomExpr.eval(row)
        if (bytes != null) {
          val g = GeomIO.read(bytes.asInstanceOf[Array[Byte]])
          if (!g.isEmpty) tree.insert(g.getEnvelopeInternal, (g, row))
        }
      }
      tree.build()
      cache.put(key, new java.lang.ref.SoftReference[STRtree](tree))
      tree
    }
  }

  /** Candidate count at which preparing the stream geometry pays for
    * itself (the reference's speculative threshold, option.rs:276-301). */
  val prepareThreshold = 3

  /** pred(streamG, buildG) without preparation — cheaper for rows with
    * fewer than [[prepareThreshold]] index hits. */
  def refineDirect(sg: Geometry, pred: String, bg: Geometry): Boolean = pred match {
    case "st_intersects" => sg.intersects(bg)
    case "st_contains" => sg.contains(bg)
    case "st_within" => sg.within(bg)
    case "st_covers" => sg.covers(bg)
    case "st_coveredby" => sg.coveredBy(bg)
    case "st_touches" => sg.touches(bg)
    case "st_crosses" => sg.crosses(bg)
    case "st_overlaps" => sg.overlaps(bg)
    case "st_equals" => sg.equalsTopo(bg)
  }

  /** pred(streamG, buildG) via the stream-side prepared geometry. */
  def refine(prepared: PreparedGeometry, pred: String, bg: Geometry): Boolean = pred match {
    case "st_intersects" => prepared.intersects(bg)
    case "st_contains" => prepared.contains(bg)
    case "st_within" => prepared.within(bg)
    case "st_covers" => prepared.covers(bg)
    case "st_coveredby" => prepared.coveredBy(bg)
    case "st_touches" => prepared.touches(bg)
    case "st_crosses" => prepared.crosses(bg)
    case "st_overlaps" => prepared.overlaps(bg)
    case "st_equals" => prepared.getGeometry.equalsTopo(bg)
  }
}
