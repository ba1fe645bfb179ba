package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule (SURVEY.md §4 "extension candidate a"): rewrite a naive
  * cross/theta join whose condition bounds the planar euclidean distance
  * `sqrt((lat1-lat2)² + (lon1-lon2)²) < r` into a grid-bucketed EQUI join:
  *
  *   left × right ON dist < r
  *     ⇒ explode(left, its 3×3 neighbor cells of size r)
  *        ⋈ right ON cell = right.cell AND dist < r
  *
  * |Δlat| < r ⇒ the floor(·/r) cell indices differ by ≤ 1, so every
  * qualifying pair co-locates in one of the 9 neighbor cells — the rewrite
  * is exactly result-preserving (the original predicate is kept; a pair
  * meets at most one cell, so no duplicates). What changes is the physical
  * strategy: a shuffled cartesian/BNLJ over |L|·|R| pairs becomes one
  * hash-partitioned equi join on the cell key.
  *
  * Guarded to fire only when NEITHER side fits the broadcast threshold —
  * a broadcastable side makes BNLJ the better plan, and AQE can still pick
  * it. Activate via `spark.experimental.extraOptimizations` or
  * `GraftSparkExtensions` (spark.sql.extensions).
  */
object DistanceJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (lat1, lon1, lat2, lon2, radius) with 1=left-side, 2=right-side. */
  private def matchDistance(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Expression, Double)] = {
    def fromLeft(e: Expression) = e.references.nonEmpty &&
      e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) = e.references.nonEmpty &&
      e.references.subsetOf(right.outputSet)
    def sides(d: Expression): Option[(Expression, Expression)] = d match {
      case Subtract(a, b, _) if fromLeft(a) && fromRight(b) => Some((a, b))
      case Subtract(a, b, _) if fromRight(a) && fromLeft(b) => Some((b, a))
      case _ => None
    }
    cond match {
      case LessThan(
          Sqrt(Add(Pow(d1, Literal(2.0, DoubleType)),
                   Pow(d2, Literal(2.0, DoubleType)), _)),
          Literal(r: Double, DoubleType)) =>
        for ((la1, la2) <- sides(d1); (lo1, lo2) <- sides(d2))
          yield (la1, lo1, la2, lo2, r)
      case _ => None
    }
  }

  private def cellId(lat: Expression, lon: Expression, r: Double,
      dLat: Int = 0, dLon: Int = 0): Expression = {
    def idx(e: Expression, d: Int): Expression = Add(
      Cast(Floor(Divide(e, Literal(r))), LongType), Literal(d.toLong))
    Add(Multiply(idx(lat, dLat), Literal(1L << 32)), idx(lon, dLon))
  }

  private def tooBigToBroadcast(p: LogicalPlan): Boolean =
    p.stats.sizeInBytes > conf.autoBroadcastJoinThreshold

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint)
        if hint.leftHint.isEmpty && hint.rightHint.isEmpty &&
          tooBigToBroadcast(left) && tooBigToBroadcast(right) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // idempotence guard: our own rewrite carries a __cell equi conjunct
      val alreadyRewritten = conjuncts.exists(_.references.exists(
        _.name.startsWith("__cell")))
      val hit = if (alreadyRewritten) None
      else conjuncts.flatMap(c =>
        matchDistance(c, left, right).map(c -> _)).headOption
      hit match {
        case Some((_, (la1, lo1, la2, lo2, r))) if r > 0 =>
          // left: explode the 9 neighbor cells
          val cellArr = CreateArray(for {
            dy <- Seq(-1, 0, 1); dx <- Seq(-1, 0, 1)
          } yield cellId(la1, lo1, r, dy, dx))
          val lcell = AttributeReference("__cell_l", LongType)()
          val gen = Generate(Explode(cellArr), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(lcell), child = left)
          // right: its own cell as a projected column
          val rcell = Alias(cellId(la2, lo2, r), "__cell_r")()
          val proj = Project(right.output :+ rcell, right)
          val newCond = And(EqualTo(lcell, rcell.toAttribute), cond)
          // keep ONLY the original output columns
          Project(j.output,
            Join(gen, proj, Inner, Some(newCond), JoinHint.NONE))
        case _ => j
      }
  }
}
