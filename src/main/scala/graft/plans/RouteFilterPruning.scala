package graft.plans

import graft.functions.{JsonPathExists, JsonPathRoutes}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Explode, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a consumer of ONE routed topic should not pay for the
  * multicast.
  *
  * `Filter(route = i)` directly above the dispatch engine's
  * `Generate(explode(json_path_routes(...)))` is rewritten to a plain
  * `Filter(json_path_exists(json, predᵢ))` with `route` re-attached as the
  * literal `i` — the explode disappears, only rule i's predicate is
  * evaluated, and the plan is a simple codegen-able filter. Semantically
  * exact: rows with route = i are precisely the rows whose document
  * matches rule i, once each (multicast duplicates differ only in
  * `route`). Sentinel routes (< 0) are left untouched — their semantics
  * involve decode state, not one rule.
  *
  * This is the engine's `Rule[LogicalPlan]` + `SparkSessionExtensions`
  * face (build brief preference (c)); enable with
  * `.withExtensions(new graft.plans.GraftExtensions)`.
  */
object RouteFilterPruning extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, g: Generate) =>
      rewrite(cond, g).getOrElse(f)
  }

  private def rewrite(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      g: Generate): Option[LogicalPlan] = {
    // only the non-outer join=either shapes: an outer Generate would keep a
    // null-route row for an empty array (routes is never empty, but stay
    // semantics-preserving by construction)
    if (g.outer) return None
    val routeAttr: Option[Attribute] = g.generatorOutput match {
      case Seq(a) => Some(a)
      case _ => None
    }
    (cond, g.generator) match {
      case (EqualTo(a: Attribute, Literal(i: Int, IntegerType)),
            Explode(jr: JsonPathRoutes))
          if routeAttr.exists(_.exprId == a.exprId) && i >= 0 && i < jr.paths.length =>
        Some(pruned(g, jr, i))
      case (EqualTo(Literal(i: Int, IntegerType), a: Attribute),
            Explode(jr: JsonPathRoutes))
          if routeAttr.exists(_.exprId == a.exprId) && i >= 0 && i < jr.paths.length =>
        Some(pruned(g, jr, i))
      case _ => None
    }
  }

  private def pruned(g: Generate, jr: JsonPathRoutes, i: Int): LogicalPlan = {
    val route = g.generatorOutput.head
    val filtered = Filter(JsonPathExists(jr.child, jr.paths(i)), g.child)
    // Reproduce Generate's EXACT output (requiredChildOutput ++ generator
    // output — child columns may have been pruned via unrequiredChildIndex),
    // swapping only the route attribute for literal i under its original
    // exprId so parents resolve unchanged.
    Project(
      g.output.map {
        case a if a.exprId == route.exprId =>
          Alias(Literal(i, IntegerType), route.name)(exprId = route.exprId)
        case a => a
      },
      filtered)
  }
}

/** Session extensions: inject the engine's optimizer rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RouteFilterPruning)
}
