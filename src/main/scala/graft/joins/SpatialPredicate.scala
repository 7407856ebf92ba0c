package graft.joins

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import graft.functions.GeomScalar

/** Recognition of spatial predicates inside join conditions — the analog of
  * the reference's SpatialPredicate / SpatialRelationType::from_name
  * (rust/sedona-query-planner/src/spatial_predicate.rs:201-221) and its
  * DistancePredicate (spatial_predicate.rs:62-86).
  */
object SpatialPredicate {

  /** Predicates usable for index lookup via envelope intersection. */
  val relationPreds: Set[String] = Set(
    "st_intersects", "st_contains", "st_within", "st_covers", "st_coveredby",
    "st_covered_by",
    "st_touches", "st_crosses", "st_overlaps", "st_equals")

  /** p'(b, a) == p(a, b) (reference invert table,
    * spatial_predicate.rs:223-240). */
  def invert(name: String): String = name match {
    case "st_contains" => "st_within"
    case "st_within" => "st_contains"
    case "st_covers" => "st_coveredby"
    case "st_coveredby" => "st_covers"
    case "st_covered_by" => "st_covers"
    case other => other // symmetric
  }

  /** A spatial conjunct: `pred(leftGeom, rightGeom)` with geometry args
    * resolved to the join's left/right children; `distance` set for
    * ST_DWithin / ST_Distance < d forms. `remainder` carries the other
    * conjuncts for post-join evaluation. */
  case class Extracted(
      predName: String,
      leftGeom: Expression,
      rightGeom: Expression,
      distance: Option[Expression],
      remainder: Option[Expression])

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  def extract(cond: Expression, left: LogicalPlan, right: LogicalPlan): Option[Extracted] = {
    val conjuncts = split(cond)
    val lset = left.outputSet
    val rset = right.outputSet

    def sides(a: Expression, b: Expression): Option[(Expression, Expression, Boolean)] = {
      if (a.references.subsetOf(lset) && b.references.subsetOf(rset)) Some((a, b, false))
      else if (a.references.subsetOf(rset) && b.references.subsetOf(lset)) Some((b, a, true))
      else None
    }

    val found = conjuncts.iterator.map {
      case p @ GeomScalar(rawName, Seq(a, b), _, _, _) if relationPreds(rawName) =>
        // canonicalize snake aliases so every downstream refine/plan path
        // sees one spelling
        val name = if (rawName == "st_covered_by") "st_coveredby" else rawName
        sides(a, b).map { case (lg, rg, swapped) =>
          (p: Expression, Extracted(if (swapped) invert(name) else name, lg, rg, None, None))
        }
      case p @ GeomScalar("st_dwithin", Seq(a, b, d), _, _, _) =>
        sides(a, b).map { case (lg, rg, _) =>
          (p: Expression, Extracted("st_dwithin", lg, rg, Some(d), None))
        }
      case p @ LessThan(GeomScalar("st_distance", Seq(a, b), _, _, _), d) =>
        sides(a, b).map { case (lg, rg, _) =>
          (p: Expression, Extracted("st_dwithin", lg, rg, Some(d), None))
        }
      case p @ LessThanOrEqual(GeomScalar("st_distance", Seq(a, b), _, _, _), d) =>
        sides(a, b).map { case (lg, rg, _) =>
          (p: Expression, Extracted("st_dwithin", lg, rg, Some(d), None))
        }
      case _ => None
    }.collectFirst { case Some(x) => x }

    found.map { case (predExpr, ex) =>
      val rest = conjuncts.filterNot(_ eq predExpr)
      ex.copy(remainder = rest.reduceOption(And))
    }
  }
}
