package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule materializing repeated parse-bearing subtrees of a Filter
  * condition as shared projections, so each is evaluated once per row
  * instead of once per reference.
  *
  * The BFL interpreter-tier prefilter models `body.json().k >= 95` as a
  * coercion cascade over a parsed VARIANT; composing that cascade from
  * `Column`s re-inlines the whole `try_parse_json(...)` subtree at every
  * reference — the compiled condition for `bfl_json_helper` carries ~18
  * copies of the parse, and `FilterExec` (unlike ProjectExec) performs no
  * subexpression elimination across a predicate, so every copy runs per row.
  *
  * Why not Catalyst `With`: refs need the def's dataType, so `With` can't be
  * built over unresolved Columns at query-construction time, and
  * `RewriteWithExpression` runs in optimizer batch 1 — before any
  * injectable-rule position — so a `With` introduced by an injected rule is
  * never rewritten and fails at execution. And a Project sandwich built
  * inside the operator-optimization fixed point is immediately undone by
  * `PushDownPredicates`, which substitutes aliases back into pushed
  * conditions. This rule therefore runs in the "User Provided Optimizers"
  * batch (`spark.experimental.extraOptimizations`, wired by
  * [[graft.Sessions]]), AFTER every pushdown/pruning batch; at physical
  * planning `ScanOperation` refuses to collapse non-cheap aliases referenced
  * more than once, so the sharing survives into the executed plan.
  *
  * Shape: scan-pushable bare-attribute conjuncts (`IsNotNull(props)`) drop
  * into a bottom Filter adjacent to the relation, keeping `PushedFilters`
  * intact; duplicated subtrees are extracted innermost-first into stacked
  * Projects (`let parsed = … in let iv = get(parsed) in …`); the remaining
  * conjuncts — in their original cheap-prefilter-before-interpreter order —
  * filter above the stack.
  *
  * Soundness of hoisting out of `when()` branches: a projected def is
  * evaluated eagerly on rows where the original branch might not have
  * evaluated it, so only subtrees that cannot throw are extracted —
  * try-mode variant get / parse, `get_json_object`, regexp — and any
  * candidate containing an ANSI-mode cast or a lambda variable is excluded.
  */
object FilterCseBinding extends Rule[LogicalPlan] with PredicateHelper {

  /** expensive-to-recompute node worth sharing */
  private def isParse(e: Expression): Boolean = e match {
    case _: VariantGet | _: GetJsonObject | _: RegExpReplace | _: JsonToStructs => true
    // the compiled `..` descent walk parses the whole doc per evaluation;
    // a descent predicate references it twice (collapse IsNotNull/IsNull +
    // the compare) — without hoisting, two parses per row
    case _: graft.functions.BflDescentExpr    => true
    case _: graft.functions.BflDescentCmpExpr => true
    case s: StaticInvoke => s.staticObject.getName.contains("Variant")
    // to_json lowers to Invoke(StructsToJsonEvaluator) in ReplaceExpressions;
    // a constructed-doc query references the whole serialization per
    // prefilter conjunct (never throws: input is already a typed struct)
    case i: org.apache.spark.sql.catalyst.expressions.objects.Invoke =>
      i.targetObject.dataType match {
        case org.apache.spark.sql.types.ObjectType(cls) =>
          cls.getName.contains("StructsToJsonEvaluator")
        case _ => false
      }
    case _ => false
  }

  /** eager (hoisted) evaluation could raise where lazy evaluation didn't */
  private def mayThrow(e: Expression): Boolean = e.exists {
    case v: VariantGet => v.failOnError
    case s: StaticInvoke
        if s.staticObject.getName.contains("VariantExpressionEvalUtils")
          && s.functionName == "parseJson" =>
      s.arguments.lift(1) match {
        case Some(Literal(false, org.apache.spark.sql.types.BooleanType)) => false
        case _ => true
      }
    case c: Cast => c.evalMode == EvalMode.ANSI
    // from_json throws per row in FAILFAST mode; the mode rides in an
    // options map this rule can't safely introspect — never hoist it
    case _: JsonToStructs => true
    // a literal bad regex fails on every row identically (hoisting changes
    // nothing), but a NON-foldable pattern can be guarded per row
    case r: RegExpReplace => !(r.regexp.foldable && r.rep.foldable)
    case _ => false
  }

  private def hoistable(e: Expression): Boolean =
    e.deterministic && !mayThrow(e) &&
      !e.exists(_.isInstanceOf[NamedLambdaVariable])

  /** Duplicated (canonically, ≥2 occurrences) parse-bearing hoistable
    * subtrees of `e` that contain no OTHER candidate — the innermost layer.
    */
  private def innermostDups(e: Expression): Seq[Expression] = {
    val counts = scala.collection.mutable.LinkedHashMap.empty[Expression, (Expression, Int)]
    e.foreach { x =>
      if (x.children.nonEmpty && x.exists(isParse) && hoistable(x)) {
        counts.updateWith(x.canonicalized) {
          case Some((repr, n)) => Some((repr, n + 1))
          case None            => Some((x, 1))
        }
      }
    }
    val dups = counts.collect { case (_, (repr, n)) if n >= 2 => repr }.toSeq
    val canons = dups.map(_.canonicalized).toSet
    dups.filter(d => !d.children.exists(_.exists(c => canons.contains(c.canonicalized))))
  }

  /** Innermost-first layers of shared defs + the condition rewritten over
    * their attributes. Later layers' defs may reference earlier layers.
    */
  private def extractLayers(cond: Expression): (Seq[Seq[Alias]], Expression) = {
    val layers = Seq.newBuilder[Seq[Alias]]
    var current = cond
    var n = 0
    var round = 0
    var progressing = true
    while (round < 8 && progressing) {
      progressing = false
      val cands = innermostDups(current)
      if (cands.nonEmpty) {
        val aliases = cands.map { c => n += 1; Alias(c, s"_graft_cse_$n")() }
        val m = cands.map(_.canonicalized).zip(aliases.map(_.toAttribute)).toMap
        val sub = current.transformUp {
          case x if m.contains(x.canonicalized) => m(x.canonicalized)
        }
        if (!sub.fastEquals(current)) {
          layers += aliases
          current = sub
          progressing = true
        }
      }
      round += 1
    }
    (layers.result(), current)
  }

  /** conjuncts safe and useful to keep adjacent to the relation (V1 source
    * pushdown translates bare-attribute predicates only)
    */
  private def scanPushable(e: Expression): Boolean = e match {
    case IsNotNull(_: Attribute) | IsNull(_: Attribute)       => true
    case b: BinaryComparison =>
      (b.left.isInstanceOf[Attribute] && b.right.foldable) ||
        (b.right.isInstanceOf[Attribute] && b.left.foldable)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(plist, Filter(cond, child))
        if cond.resolved && cond.deterministic && plist.forall(_.deterministic) &&
          cond.exists(isParse) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (below, above) = conjuncts.partition(scanPushable)
      val (layers, topCond0) = extractLayers(
        if (above.isEmpty) Literal.TrueLiteral else above.reduceLeft(And))
      if (layers.isEmpty) p
      else {
        val bottom: LogicalPlan =
          if (below.isEmpty) child else Filter(below.reduceLeft(And), child)
        val aliasAttrs = AttributeSet(layers.flatten.map(_.toAttribute))
        val needed = (AttributeSet(plist.flatMap(_.references)) ++
          topCond0.references ++
          AttributeSet(layers.flatten.flatMap(_.child.references))) -- aliasAttrs
        val keep = child.output.filter(needed.contains)
        val base: LogicalPlan = Project(keep ++ layers.head, bottom)
        val stacked = layers.tail.foldLeft(base)((acc, layer) =>
          Project(acc.output ++ layer, acc))
        Project(plist, Filter(topCond0, stacked))
      }
  }
}
