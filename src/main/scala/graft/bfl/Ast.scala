package graft.bfl

/** BFL (Basenine Filter Language) abstract syntax.
  *
  * Two layers:
  *   - Raw parse tree ([[Raw]]) mirroring the reference grammar
  *     (reference: server/lib/parser.go:15-77).
  *   - Normalized expression tree ([[Expr]]) produced by [[Normalize]] — the
  *     equivalent of the reference's compile-time pass
  *     (reference: server/lib/precompute.go), with identifier chains flattened
  *     to JSONPath segment lists, time helpers constant-folded, and `limit(N)`
  *     extracted.
  */
object Ast {

  /** A single JSONPath step (reference models these as ojg `jp.Expr` frags). */
  sealed trait Seg
  final case class Field(name: String) extends Seg // `.name`
  final case class Index(i: Int) extends Seg // `[0]`
  final case class Key(k: String) extends Seg // `["k"]`
  case object Wildcard extends Seg // `.*` / `[*]`
  final case class Descent(name: String) extends Seg // `..name`

  // ----- normalized expression tree -----
  sealed trait Expr

  /** `and` / `or`; right-nested chains, short-circuiting left-to-right
    * (reference: server/lib/eval.go:744-776).
    */
  final case class Logical(op: String, lhs: Expr, rhs: Expr) extends Expr

  /** `==` / `!=` — string-coerced equality (reference: server/lib/eval.go:104-174). */
  final case class Equality(op: String, lhs: Expr, rhs: Expr) extends Expr

  /** `>` `<` `>=` `<=` — numeric-coerced (reference: server/lib/eval.go:176-326). */
  final case class Comparison(op: String, lhs: Expr, rhs: Expr) extends Expr

  /** `!` / unary `-` (reference: server/lib/eval.go:667-691). */
  final case class Unary(op: String, operand: Expr) extends Expr

  /** Parenthesized sub-expression — a COLLAPSE BOUNDARY: the reference's
    * evalPrimary routes `( … )` through evalExpression, which converts an
    * inner collapse to plain false instead of propagating it
    * (reference: server/lib/eval.go:649-651, 786-790). `(a.missing) or b`
    * therefore still evaluates `b`.
    */
  final case class SubExpr(e: Expr) extends Expr

  final case class NumLit(v: Double) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class RegexLit(pattern: String) extends Expr
  final case class BoolLit(v: Boolean) extends Expr
  case object NilLit extends Expr

  /** Epoch-millis instant produced by compile-time folding of
    * `now()/seconds(n)/…/years(n)` (reference: server/lib/precompute.go:146-186).
    * Carried as Long so string coercion matches Go's FormatInt, not `%g`.
    */
  final case class TimeLit(millis: Long) extends Expr

  /** Bare JSONPath get; zero matches collapse the whole expression
    * (reference: server/lib/eval.go:613-624).
    */
  final case class PathGet(path: List[Seg]) extends Expr

  /** Helper invocation `recv.helper(args…)` — e.g. `a.b.startsWith("x")`,
    * `datetime("…")`, `redact("p", …)`. An undefined helper name collapses
    * (reference: server/lib/eval.go:634-644). `limit` returns true at runtime
    * (its N is extracted into [[Query.limit]]).
    */
  final case class HelperCall(name: String, recv: List[Seg], args: List[Expr])
      extends Expr

  /** `outer.json().inner` / `outer.xml().inner`: parse the string at `outer`
    * (transparently base64-decoding) and navigate `inner`
    * (reference: server/lib/eval.go:358-404, precompute.go:69-134).
    */
  final case class JsonGet(outer: List[Seg], kind: String, inner: List[Seg])
      extends Expr

  /** Normalized query: `None` expr means the empty query (always true,
    * reference: server/lib/eval.go:782-784). `limit` is the extracted
    * `limit(N)` (reference: server/lib/precompute.go:146-155).
    */
  final case class Query(expr: Option[Expr], limit: Option[Long])

  /** Does the query use record-ALTERING helpers (redact), i.e. does matching
    * it mutate the document (reference: server/lib/eval.go:406-470)?
    */
  def usesAlteringHelpers(q: Query): Boolean = {
    def walk(e: Expr): Boolean = e match {
      case HelperCall("redact", _, _) => true
      case HelperCall(_, _, args)     => args.exists(walk)
      case Logical(_, a, b)           => walk(a) || walk(b)
      case Equality(_, a, b)          => walk(a) || walk(b)
      case Comparison(_, a, b)        => walk(a) || walk(b)
      case Unary(_, a)                => walk(a)
      case SubExpr(a)                 => walk(a) // macro expansions are paren-wrapped
      case _                          => false
    }
    q.expr.exists(walk)
  }

  // ----- raw parse tree (mirrors the participle grammar) -----
  object Raw {
    final case class RExpression(logical: RLogical)
    final case class RLogical(eq: REquality, next: Option[(String, RLogical)])
    final case class REquality(cmp: RComparison, next: Option[(String, REquality)])
    final case class RComparison(un: RUnary, next: Option[(String, RComparison)])
    sealed trait RUnary
    final case class RUnaryOp(op: String, operand: RUnary) extends RUnary
    final case class RPrimaryU(p: RPrimary) extends RUnary
    sealed trait RPrimary
    final case class RNumber(v: Double) extends RPrimary
    final case class RString(raw: String) extends RPrimary
    final case class RRegex(raw: String) extends RPrimary
    final case class RBool(v: Boolean) extends RPrimary
    case object RNil extends RPrimary
    final case class RSub(e: RExpression) extends RPrimary
    final case class RCall(
        // identifier chain already segmented; empty-name fields encode `..`
        segs: List[Seg],
        // Some(args) when a parenthesized non-empty arg list is present.
        // `()` with zero args parses as None — the reference then treats the
        // whole thing as a bare path (participle leaves Parameters nil).
        params: Option[List[RParam]],
        select: Option[RSelect]
    ) extends RPrimary
    final case class RParam(tag: Option[String], expr: RExpression)
    final case class RSelect(
        index: Option[Int],
        key: Option[String], // "*" encodes bracket wildcard
        descent: Option[String],
        cont: Option[RExpression]
    )
  }
}
