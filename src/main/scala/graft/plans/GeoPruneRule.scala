package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.locationtech.jts.geom.Envelope
import graft.functions.GeomScalar
import graft.geom.GeomIO

/** Rewrites spatial filters against a geometry column that has a sibling
  * `<name>_bbox` covering column into additional bbox range conjuncts:
  *
  *   st_intersects(geom, <const>) ∧ ...
  *     ⇒ st_intersects(geom, <const>) ∧ geom_bbox.xmin <= env.xmax ∧ ...
  *
  * The range predicates are plain comparisons on struct fields, which
  * Spark's parquet source pushes down to row-group min/max pruning — this
  * one rewrite buys the reference's covering-column skip
  * (rust/sedona-geoparquet/src/file_opener.rs:315-340 and the ST-predicate
  * → bbox extraction of rust/sedona-expr/src/spatial_filter.rs:50-199).
  * The original ST predicate stays for exact refinement.
  */
object GeoPruneRule extends Rule[LogicalPlan] {

  /** Predicates whose true-set is contained in envelope intersection. */
  private val prunable = Set("st_intersects", "st_within", "st_contains",
    "st_covers", "st_coveredby", "st_equals", "st_touches", "st_overlaps",
    "st_crosses")

  private def constEnvelope(e: Expression): Option[Envelope] =
    if (e.foldable) {
      e.eval() match {
        case b: Array[Byte] => Some(GeomIO.read(b).getEnvelopeInternal)
        case _ => None
      }
    } else None

  private def bboxFor(child: LogicalPlan, geom: Expression): Option[Attribute] =
    geom match {
      case a: Attribute => child.output.find(_.name == a.name + "_bbox")
      case _ => None
    }

  private def rangePreds(bbox: Attribute, env: Envelope): Expression = {
    def f(name: String) = GetStructField(bbox,
      bbox.dataType.asInstanceOf[org.apache.spark.sql.types.StructType].fieldIndex(name),
      Some(name))
    And(And(
      LessThanOrEqual(f("xmin"), Literal(env.getMaxX)),
      GreaterThanOrEqual(f("xmax"), Literal(env.getMinX))),
      And(
        LessThanOrEqual(f("ymin"), Literal(env.getMaxY)),
        GreaterThanOrEqual(f("ymax"), Literal(env.getMinY))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case fl @ Filter(cond, child) =>
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case o => Seq(o)
      }
      val conjuncts = split(cond)
      val bboxRefs = conjuncts.flatMap(_.references).filter(_.name.endsWith("_bbox")).toSet
      val added = conjuncts.flatMap {
        case GeomScalar(name, Seq(a, b), _, _, _) if prunable(name) =>
          val fromA = for {
            env <- constEnvelope(b); bbox <- bboxFor(child, a)
            if !bboxRefs.contains(bbox)
          } yield rangePreds(bbox, env)
          val fromB = for {
            env <- constEnvelope(a); bbox <- bboxFor(child, b)
            if !bboxRefs.contains(bbox)
          } yield rangePreds(bbox, env)
          fromA.toSeq ++ fromB.toSeq
        case GeomScalar("st_dwithin", Seq(a, b, d), _, _, _) if d.foldable =>
          val dist = d.eval() match {
            case n: java.lang.Number => n.doubleValue()
            case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
            case _ => 0.0
          }
          def expanded(c: Expression): Option[Envelope] = constEnvelope(c).map { env =>
            val e2 = new Envelope(env); e2.expandBy(dist); e2
          }
          val fromA = for {
            env <- expanded(b); bbox <- bboxFor(child, a)
            if !bboxRefs.contains(bbox)
          } yield rangePreds(bbox, env)
          val fromB = for {
            env <- expanded(a); bbox <- bboxFor(child, b)
            if !bboxRefs.contains(bbox)
          } yield rangePreds(bbox, env)
          fromA.toSeq ++ fromB.toSeq
        case _ => Nil
      }
      if (added.isEmpty) fl
      else Filter(added.foldLeft(cond)(And), child)
  }
}
