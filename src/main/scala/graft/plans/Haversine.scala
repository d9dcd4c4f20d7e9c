package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Great-circle distance as a NAMED Catalyst expression (the
  * `RuntimeReplaceable` form SURVEY §2.9 sketches): execution inlines the
  * identical composed-built-in tree `Exprs.haversineMeters` builds (same
  * IEEE op order, R=6371000, the reference's `min(1, sqrt(a))` clamp from
  * `main.py:75-86`), so no custom eval/codegen is carried — but the
  * predicate keeps a matchable name in the analyzed plan, which is what
  * lets [[HaversineBoundingBox]] recognize radius filters and derive
  * scan-pushable bounds. (The composed form alone is an anonymous trig
  * tree no rule can safely match.)
  */
case class HaversineDistance(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression) extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(lat1, lon1, lat2, lon2)

  override lazy val replacement: Expression = {
    def d(e: Expression): Expression =
      if (e.dataType == DoubleType) e else Cast(e, DoubleType)
    val two = Literal(2.0)
    val dLat = Divide(ToRadians(Subtract(d(lat2), d(lat1))), two)
    val dLon = Divide(ToRadians(Subtract(d(lon2), d(lon1))), two)
    val a = Add(Pow(Sin(dLat), two),
      Multiply(Multiply(Cos(ToRadians(d(lat1))), Cos(ToRadians(d(lat2)))),
        Pow(Sin(dLon), two)))
    Multiply(Literal(2.0 * 6371000.0),
      Asin(Least(Seq(Literal(1.0), Sqrt(a)))))
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_distance"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lat1 = newChildren(0), lon1 = newChildren(1),
      lat2 = newChildren(2), lon2 = newChildren(3))
}

object HaversineDistance {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.bridge

  /** Column wrapper for the Scala DataFrame API. */
  def haversineDistance(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column =
    bridge.column(HaversineDistance(bridge.expression(lat1),
      bridge.expression(lon1), bridge.expression(lat2),
      bridge.expression(lon2)))
}

/** Injected analyzer rule (post-hoc resolution, runs Once): a radius
  * predicate `haversine_distance(cLat, cLon, lat, lon) <= r` with a literal
  * center and radius gains a CONSERVATIVE bounding-box conjunct on the raw
  * lat/lon columns. The box is a strict superset of the circle (margins
  * widened by 1e-4 relative + the pole-safe longitude expansion), so
  * results never change — but the derived `lat >= … AND lat <= … AND
  * lon >= … AND lon <= …` conjuncts are plain column comparisons that
  * Catalyst pushes into the parquet scan (`PushedFilters`), where row-group
  * min/max stats skip data BEFORE any trig runs. At 100 TB this turns the
  * geo scan from "evaluate 12 trig calls per row of the planet" into "read
  * the row groups near the city".
  *
  * Runs before the optimizer's `ReplaceExpressions` (which rewrites the
  * RuntimeReplaceable into raw trig, erasing the matchable name), and is
  * guarded idempotent: a filter already carrying the derived lat bound is
  * left untouched.
  */
object HaversineBoundingBox extends Rule[LogicalPlan] {

  // degrees of latitude per meter under the SAME sphere model as the
  // distance itself (R=6371000) — the bound and the predicate can't drift
  private val MetersPerDeg = 6371000.0 * math.Pi / 180.0

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) =>
      val rewritten = cond.transformUp {
        case le @ LessThanOrEqual(
              HaversineDistance(Literal(clat: Double, DoubleType),
                Literal(clon: Double, DoubleType), latE, lonE),
              Literal(r: Double, DoubleType)) if r >= 0 =>
          val margin = r / MetersPerDeg * 1.0001 + 1e-9
          val latLo = Literal(clat - margin)
          val latPred = And(GreaterThanOrEqual(latE, latLo),
            LessThanOrEqual(latE, Literal(clat + margin)))
          // idempotency guard: the derived lower lat bound already present
          // means this predicate was rewritten in an earlier pass
          if (cond.exists(_.semanticEquals(GreaterThanOrEqual(latE, latLo)))) le
          else {
            // longitude shrinks by cos(lat); bound it at the band's extreme
            // latitude (conservative), and skip the lon bound entirely in
            // polar bands where the expansion stops being meaningful
            val maxAbsLat =
              math.max(math.abs(clat - margin), math.abs(clat + margin))
            val bbox =
              if (maxAbsLat < 89.0) {
                val lonMargin = margin / math.cos(math.toRadians(maxAbsLat))
                And(latPred,
                  And(GreaterThanOrEqual(lonE, Literal(clon - lonMargin)),
                    LessThanOrEqual(lonE, Literal(clon + lonMargin))))
              } else latPred
            And(bbox, le)
          }
      }
      if (rewritten.fastEquals(cond)) f else f.copy(condition = rewritten)
  }
}
