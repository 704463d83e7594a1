package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst rule deriving scan-pushable `IsNotNull(attribute)` conjuncts
  * from `IsNotNull(expr)` filters over null-propagating expression chains.
  *
  * The BFL prefilter emits receiver-not-null conditions on BACKED columns
  * (e.g. `IsNotNull(body)` where `body = concat('<r><k>', get_json_object(
  * props, '$.k'), '</k></r>')`). After Catalyst collapses the projection the
  * filter is `IsNotNull(concat(...))` — a non-attribute predicate the V1
  * Parquet pushdown cannot use, so the scan reads every row group even
  * though `props IS NULL` (or a missing `$.k`) makes the whole concat null.
  * Spark's own `InferFiltersFromConstraints` only walks expressions marked
  * `nullIntolerant`, and `Concat`/`GetJsonObject` are not.
  *
  * For each Filter conjunct `IsNotNull(e)` this rule collects every
  * attribute `a` with the property "a is null ⇒ e is null" — through a
  * whitelist of null-propagating constructors (any-null-child-propagates:
  * `Concat`, `Cast`/`TryCast`-like unary wrappers, arithmetic, plus
  * everything Spark itself marks `nullIntolerant`; first-argument-
  * propagates: `GetJsonObject`) — and conjoins the missing `IsNotNull(a)`
  * terms. The added conjuncts are implied by the existing ones (rows they
  * drop were already dropped), so results are unchanged; but as bare
  * attribute predicates they reach `PushedFilters` and prune row groups at
  * the scan. Runs in the operator-optimization fixed point ahead of
  * PushDownPredicates, like [[TimestampPushdown]]; a second pass adds
  * nothing (the derived attributes are already present), so the fixed point
  * terminates.
  */
object NotNullDerivation extends Rule[LogicalPlan] with PredicateHelper {

  /** Attributes whose null value forces `e` to null. */
  private def nullRequiredAttrs(e: Expression): Seq[Attribute] = e match {
    case a: Attribute     => Seq(a)
    case c: Concat        => c.children.flatMap(nullRequiredAttrs)
    case g: GetJsonObject => nullRequiredAttrs(g.left)
    case c: Cast          => nullRequiredAttrs(c.child)
    case _ if e.nullIntolerant => e.children.flatMap(nullRequiredAttrs)
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val existing = conjuncts.collect { case IsNotNull(a: Attribute) => a.exprId }.toSet
      val derived = conjuncts
        .collect { case IsNotNull(e) if !e.isInstanceOf[Attribute] => nullRequiredAttrs(e) }
        .flatten
        .filter(a => !existing.contains(a.exprId))
        .groupBy(_.exprId).map(_._2.head).toSeq // distinct by exprId
        .sortBy(_.name)
      if (derived.isEmpty) f
      else Filter((derived.map(IsNotNull(_)) ++ conjuncts).reduceLeft(And), child)
  }
}
