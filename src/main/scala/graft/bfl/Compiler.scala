package graft.bfl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Ast._
import graft.functions.BflExpressions

/** Schema-aware BFL → Catalyst Column compiler — the Spark-first fast path.
  *
  * Compiles the common BFL subset (paths, literals, logical/equality/
  * comparison chains, string helpers, regex, folded time helpers, limit)
  * straight to native Column expressions so Catalyst can push predicates to
  * the Parquet scan and keep everything inside whole-stage codegen. Queries
  * using redact / json() / xml() / recursive descent raise
  * [[Compiler.Unsupported]]; callers fall back to the exact interpreter
  * expression ([[graft.functions.BflMatchExpr]]).
  *
  * Reference semantics are encoded algebraically: every node compiles to a
  * (value, collapse) Column pair. Collapse (missing bare path / undefined
  * helper) wins over everything except left-to-right short-circuiting
  * (reference: server/lib/eval.go:613-624, 744-776): `false and missing` is
  * false, `missing or true` collapses the whole expression. The compiled
  * subset is pure, so evaluation ORDER doesn't matter — only outcomes, which
  * the when/otherwise cascades reproduce exactly.
  *
  * Scan-friendliness: comparisons against literals keep the column's native
  * type whenever the coercion semantics are provably equivalent —
  * `l_quantity > 30` compiles to `l_quantity > 30.0d` (pushable Parquet
  * filter), `ts >= datetime(...)` compiles to a native timestamp compare
  * (row-group pruning), instead of the generic
  * `cast-to-double`/`GoFmt-string` forms.
  */
object Compiler {

  final case class Unsupported(reason: String) extends RuntimeException(reason)

  /** Compiled plan: `pred` filters, `limit` caps matched rows. */
  final case class BflPlan(pred: Column, limit: Option[Long])

  /** Static BFL operand type, tracked through compilation so §1.2's dynamic
    * coercions can be applied with zero runtime dispatch.
    */
  sealed trait BT
  case object TStr extends BT
  case object TLong extends BT
  case object TDouble extends BT
  case object TBool extends BT
  case object TNull extends BT
  /** a raw TimestampType column; coerces as epoch millis (the reference's
    * `timestamp` fields are epoch-millis int64, native.go:1024)
    */
  case object TTimestamp extends BT
  /** a Spark 4 VARIANT value extracted from a JSON document column —
    * dynamically typed with the runtime type PRESERVED (long vs double vs
    * bool vs string vs null), so the reference's dynamic coercions compile
    * exactly: `schema_of_variant` dispatches per row. A missing path is SQL
    * NULL (collapse) while a JSON null is a VOID variant — the distinction
    * text extraction could never make. */
  case object TVar extends BT
  final case class TArr(elem: BT) extends BT
  /** `..name` descent over a schema-free document, compiled through
    * [[BflExpressions.bflDescent]]: a struct of (`single`, `els`) where
    * `single` marks the interpreter's one-scalar-match case and each
    * element carries every Coerce view (s/n/b) of a matched node — so
    * equality/comparison/truthiness compile to native exists/getField
    * Columns with zero per-row query interpretation. NULL = zero matches
    * (collapse), exactly the interpreter's jp.Get len<1 rule. */
  case object TDescent extends BT

  /** value+type+collapse triple for one compiled node; `litNum`/`litRegex`
    * capture literal operands for the pushdown fast paths.
    */
  private final case class CV(
      value: Column,
      t: BT,
      collapse: Column,
      litNum: Option[Double] = None,
      litMillis: Option[Long] = None,
      litRegex: Option[String] = None,
      litStr: Option[String] = None,
      // static: can `collapse` ever be true? (false for literals/helpers,
      // used by the SubExpr boundary to pass through unchanged)
      mayCollapse: Boolean = true
  )
  private val noCollapse = lit(false)

  def compile(df: DataFrame, queryStr: String, docCol: Option[String] = None): BflPlan = {
    val q = Parser.parse(queryStr).fold(e => throw Unsupported(s"parse: $e"), identity)
    compileQuery(df.schema, q, docCol)
  }

  /** `docCol` names a JSON-string document column: paths that don't resolve
    * against the schema route into it via get_json_object (the schema-free
    * engine-log case) instead of collapsing.
    */
  def compileQuery(schema: StructType, q: Query, docCol: Option[String] = None): BflPlan =
    q.expr match {
      case None => BflPlan(lit(true), q.limit)
      case Some(e) =>
        val ctx = Ctx(schema, docCol)
        val cv = comp(e, ctx)
        // NULL in a Filter is dropped like false, so no coalesce wrapper is
        // needed — keeping the predicate a plain conjunction lets Catalyst
        // split it and push the pieces into the Parquet scan.
        val base = !cv.collapse && truthy(cv)
        // Derived pushable conjuncts: a match requires ¬collapse, and every
        // root column in `matchReq` must be non-null for the expression not
        // to collapse (all path chains — getField / try_element_at /
        // try_parse_json / try_variant_get — propagate null). The conjuncts
        // are implied (results unchanged) but ride as split IsNotNull
        // attribute filters Parquet can prune on — e.g. `props.missing == "x"
        // or A` scans only row groups where props exists instead of fully.
        val pred = matchReq(e, ctx).toSeq.sorted
          .foldLeft(base)((acc, c) => col(c).isNotNull && acc)
        BflPlan(pred, q.limit)
    }

  // ---------- derived not-null requirements (compiled tier) ----------

  /** Root columns that must be NON-NULL on any row the compiled predicate
    * matches (match ⇒ ¬collapse ∧ truthy — eval.go:786-790). Collapse
    * propagation makes these derivable statically:
    *   - `A and B`: a match makes BOTH arms truthy and non-collapsed
    *     (value true ⇒ ab ∧ bb; ¬collapse ∧ ab ⇒ ¬b.collapse);
    *   - `A or B`: only ¬a.collapse is guaranteed (either arm may be the
    *     true one), so only A's non-collapse requirements carry;
    *   - equality/comparison collapse when EITHER side collapses;
    *   - `(E)` is a collapse boundary, but its TRUTH still implies the inner
    *     expression was truthy and non-collapsed;
    *   - a path's collapse column is null-propagating from its root.
    */
  private def matchReq(e: Expr, ctx: Ctx): Set[String] = e match {
    case Logical("and", l, r) => matchReq(l, ctx) ++ matchReq(r, ctx)
    case Logical("or", l, _)  => ncReq(l, ctx)
    case SubExpr(i)           => matchReq(i, ctx)
    case Unary(_, o)          => ncReq(o, ctx)
    case Equality(_, l, r)    => ncReq(l, ctx) ++ ncReq(r, ctx)
    case Comparison(_, l, r)  => ncReq(l, ctx) ++ ncReq(r, ctx)
    case PathGet(p)           => pathRootCols(p, ctx)
    case _                    => Set.empty // literals, helpers (missing
    // helper receivers coerce to "false" without collapsing — no constraint)
  }

  /** Root columns non-null whenever `e` does NOT collapse (no truthiness
    * assumption — the weaker guarantee `or`-arms and negations provide). */
  private def ncReq(e: Expr, ctx: Ctx): Set[String] = e match {
    case Logical(_, l, _)    => ncReq(l, ctx) // right arm is conditional
    case SubExpr(_)          => Set.empty // boundary never collapses
    case Unary(_, o)         => ncReq(o, ctx)
    case Equality(_, l, r)   => ncReq(l, ctx) ++ ncReq(r, ctx)
    case Comparison(_, l, r) => ncReq(l, ctx) ++ ncReq(r, ctx)
    case PathGet(p)          => pathRootCols(p, ctx)
    case _                   => Set.empty
  }

  /** The df column a path's collapse chains from: its schema root, or the
    * document column for schema-free roots. Unknown roots with no docCol
    * always collapse (predicate is unsatisfiable) — no conjunct needed. */
  private def pathRootCols(path: List[Seg], ctx: Ctx): Set[String] =
    path.headOption.collect { case Field(n) => n; case Key(k) => k } match {
      case Some(head) =>
        if (ctx.schema.fields.exists(_.name == head)) Set(head)
        else ctx.docCol.toSet
      case None => Set.empty
    }

  // ---------- doc-byte key prefilter (interpreter tier) ----------

  /** Keys that must appear IN THE RAW DOCUMENT BYTES (as `"name"`) on any
    * row the query can match — a necessary condition needing NO column
    * backing, so it applies to every interpreter-tier query including the
    * shapes the variant prefilter can't touch (recursive descent,
    * constructed docs).
    *
    * Soundness: a missing path — including an empty recursive descent —
    * COLLAPSES (Interp eval: `JsonTree.get == Nil ⇒ Collapse`,
    * reference eval.go:613-624), so every key on a match-required path
    * must exist in the parsed document, and a parsed key exists only if
    * its quoted name appears in the bytes — except when written as a
    * `\uXXXX` escape (Jackson decodes those), which the caller must OR in
    * as an escape hatch (`contains(doc, "\u")`). Collected only for:
    *   - bare paths (PathGet) in truthy / comparison / equality position —
    *     helper receivers coerce a missing path to a non-collapsing value
    *     (json()'s false-ladder, startsWith's ""), so helpers contribute
    *     nothing;
    *   - names with unambiguous JSON rendering (`[A-Za-z0-9_-]+` — no
    *     in-name escapes possible);
    * with the same and/or/not/paren propagation as [[matchReq]]/[[ncReq]].
    */
  def docKeyPrefilter(q: Query): Seq[String] =
    q.expr.map(keysReq).getOrElse(Set.empty[String])
      .filter(safeKeyRe.matches).toSeq.sorted

  private val safeKeyRe = "[A-Za-z0-9_-]+".r

  private def keyNames(p: List[Seg]): Set[String] =
    p.collect { case Field(n) => n; case Key(k) => k; case Descent(n) => n }.toSet

  /** keys required on a MATCHING row (mirrors [[matchReq]]) */
  private def keysReq(e: Expr): Set[String] = e match {
    case Logical("and", l, r) => keysReq(l) ++ keysReq(r)
    case Logical("or", l, _)  => keysNc(l)
    case SubExpr(i)           => keysReq(i)
    case Unary(_, o)          => keysNc(o)
    case Equality(_, l, r)    => keysNc(l) ++ keysNc(r)
    case Comparison(_, l, r)  => keysNc(l) ++ keysNc(r)
    case PathGet(p)           => keyNames(p)
    case _                    => Set.empty // helpers/literals never collapse
  }

  /** keys required whenever `e` does NOT collapse (mirrors [[ncReq]]) */
  private def keysNc(e: Expr): Set[String] = e match {
    case Logical(_, l, _)    => keysNc(l)
    case SubExpr(_)          => Set.empty // boundary never collapses
    case Unary(_, o)         => keysNc(o)
    case Equality(_, l, r)   => keysNc(l) ++ keysNc(r)
    case Comparison(_, l, r) => keysNc(l) ++ keysNc(r)
    case PathGet(p)          => keyNames(p)
    case _                   => Set.empty
  }

  // ---------- interpreter-tier necessary-condition prefilter ----------

  /** Compile a SOUND necessary condition for an interpreter-tier query: a
    * Column that is true on every row the exact interpreter could match, so
    * `df.where(pre)` ahead of the row-at-a-time evaluator only discards rows
    * that provably cannot match — restoring Parquet pushdown / row-group
    * pruning for scans the interpreter alone would read in full.
    *
    * `backed` maps top-level DOC field names to (df column name, type) pairs
    * the CALLER guarantees hold the same value as the doc field (true by
    * construction for docs built with `to_json(struct(...))` over those
    * columns). Soundness is local to that contract: paths through unbacked
    * roots contribute no constraint, and shapes whose compiled semantics
    * could diverge from the interpreter (xml(), descent, wildcards,
    * timestamp-typed backings, possible-base64 receivers) escape to `true`
    * rather than guess. Returns None when nothing non-trivial is derivable.
    *
    * Per-node derivation (match ⟹ condition, by the collapse algebra of
    * reference server/lib/eval.go:744-776):
    *   - fully-compilable subtree → its exact standalone predicate;
    *   - `A and B` → nec(A) && nec(B) (a match implies BOTH standalone);
    *   - `A or B`  → nec(A) || nec(B);
    *   - `(A)`     → nec(A);
    *   - comparisons/equalities over `path.json()....` → an exact VARIANT
    *     model of the interpreter's json() helper (eval.go:358-404): missing
    *     receiver / parse failure / missing inner path all yield the value
    *     `false` — NOT collapse — so e.g. `body.json().k != 95` MATCHES rows
    *     without a body (the naive `body IS NOT NULL` prefilter would be
    *     unsound there; `body IS NOT NULL` is emitted only when
    *     `op(false, literal)` is statically false);
    *   - anything else → no constraint.
    */
  def necessaryPrefilter(q: Query, backed: Map[String, (String, DataType)]): Option[Column] =
    if (backed.isEmpty) None
    else q.expr.flatMap(e => nec(e, Ctx(StructType(Nil), None, Some(backed))))

  /** Exact match predicate of a lone compiled subtree (the root rule:
    * collapse ⇒ false, else truthiness — eval.go:786-790).
    */
  private def standalone(cv: CV): Column =
    if (cv.mayCollapse) !cv.collapse && truthy(cv) else truthy(cv)

  private def nec(e: Expr, ctx: Ctx): Option[Column] =
    try Some(standalone(comp(e, ctx)))
    catch {
      case _: Unsupported =>
        e match {
          case Logical("and", l, r) =>
            (nec(l, ctx), nec(r, ctx)) match {
              case (Some(a), Some(b)) => Some(a && b)
              case (a, b)             => a.orElse(b)
            }
          case Logical("or", l, r) =>
            for { a <- nec(l, ctx); b <- nec(r, ctx) } yield a || b
          case SubExpr(i)           => nec(i, ctx)
          case Comparison(op, l, r) => necCmp(isEq = false, op, l, r, ctx)
          case Equality(op, l, r)   => necCmp(isEq = true, op, l, r, ctx)
          case _                    => None
        }
    }

  /** One side of a json()-bearing comparison: the modeled value CV, an
    * escape condition (true ⇒ this row must pass unexamined), and the
    * receiver column for the optional pushable IsNotNull conjunct.
    */
  private final case class JsonSide(cv: CV, escape: Column, recv: Option[Column])

  private def necCmp(isEq: Boolean, op: String, l: Expr, r: Expr, ctx: Ctx): Option[Column] =
    try {
      // shared with the xml() path below: when the OTHER side is a literal
      // and the interpreter's own coercions (Coerce) say `op(false, lit)` is
      // false, a receiver that evaluated to the value `false` can never
      // match — so IsNotNull(recv) becomes a sound necessary condition
      def falseSideMatches(jsonOnLeft: Boolean, other: Expr): Option[Boolean] =
        litAny(other).map { lv =>
          if (isEq) {
            val eq =
              if (jsonOnLeft) Coerce.eql(false, lv, p => compilePattern(p))
              else Coerce.eql(lv, false, p => compilePattern(p))
            if (op == "==") eq else !eq
          } else if (jsonOnLeft) Coerce.cmp(op, false, lv)
          else Coerce.cmp(op, lv, false)
        }
      // xml(): the VALUE is not statically modelable (mxj parse + #text
      // extraction + entity decoding), but the reference's failure ladder
      // still yields value `false` for a MISSING receiver (stringOperand of
      // the missing path is "false": not base64-decodable, not XML —
      // eval.go:379-404), so when `op(false, lit)` is statically false the
      // receiver must be non-null on every matching row. Value-level
      // prefiltering (incl. base64-wrapped XML) is deliberately never
      // attempted — IsNotNull is the whole (scan-pushable) constraint.
      def xmlRecv(e: Expr): Option[Column] = e match {
        case JsonGet(outer, "xml", _) =>
          val rr = resolve(outer, ctx) // strict-roots: unbacked ⇒ Unsupported
          if (rr.t != TStr || rr.emptyCollapses)
            throw Unsupported("prefilter: xml() receiver must be a backed string scalar")
          Some(rr.value)
        case _ => None
      }
      val (xl, xr) = (xmlRecv(l), xmlRecv(r))
      if (xl.isDefined || xr.isDefined) {
        val xmlNotNulls = List(
          xl.filter(_ => falseSideMatches(jsonOnLeft = true, r).contains(false)),
          xr.filter(_ => falseSideMatches(jsonOnLeft = false, l).contains(false))
        ).flatten.map(_.isNotNull)
        return if (xmlNotNulls.isEmpty) None else Some(xmlNotNulls.reduce(_ && _))
      }
      def side(e: Expr): Option[JsonSide] = e match {
        case JsonGet(outer, "json", inner) => Some(jsonGetSide(outer, inner, ctx))
        case _                             => None
      }
      val (sl, sr) = (side(l), side(r))
      if (sl.isEmpty && sr.isEmpty) return None // not a json() comparison
      val a = sl.map(_.cv).getOrElse(comp(l, ctx))
      val b = sr.map(_.cv).getOrElse(comp(r, ctx))
      val cmp =
        if (isEq) { val c = equalityCol(a, b); if (op == "==") c else !c }
        else comparisonCol(op, a, b)
      val mayCollapse = a.mayCollapse || b.mayCollapse
      val pred0 = if (mayCollapse) !(a.collapse || b.collapse) && cmp else cmp
      val escape = (sl.toList ++ sr.toList).map(_.escape).reduce(_ || _)
      val pred = escape || pred0
      // pushable extra conjunct (json() tier): see falseSideMatches above
      val notNulls = List(
        sl.flatMap(s => s.recv.filter(_ => falseSideMatches(jsonOnLeft = true, r).contains(false))),
        sr.flatMap(s => s.recv.filter(_ => falseSideMatches(jsonOnLeft = false, l).contains(false)))
      ).flatten.map(_.isNotNull)
      Some(notNulls.foldLeft(pred)((acc, nn) => nn && acc))
    } catch { case _: Unsupported => None }

  /** Literal operand as the interpreter's runtime value, for static
    * `op(false, lit)` evaluation with the REAL Coerce (no re-implementation).
    */
  private def litAny(e: Expr): Option[Any] = e match {
    case NumLit(v)   => Some(v)
    case StrLit(v)   => Some(v)
    case BoolLit(v)  => Some(v)
    case NilLit      => Some(null)
    case TimeLit(ms) => Some(ms)
    case RegexLit(p) => Some(RegexVal(compilePattern(p)))
    case SubExpr(i)  => litAny(i)
    case _           => None
  }

  private def compilePattern(p: String): java.util.regex.Pattern =
    java.util.regex.Pattern.compile(Interp.re2ToJava(p))

  /** VARIANT model of `outer.json().inner` (eval.go:358-404): receiver
    * stringified, base64-sniffed (escape — decode output is unknowable
    * statically), JSON-parsed (failure ⇒ value false), inner navigated
    * (missing ⇒ value false). JSON-null inner values surface as VOID
    * variants, which the TVar coercions already treat like the
    * interpreter's null (toStr "null" / toNum 0 / falsy).
    */
  private def jsonGetSide(outer: List[Seg], inner: List[Seg], ctx: Ctx): JsonSide = {
    val r = resolve(outer, ctx) // strict-roots: unbacked ⇒ Unsupported
    if (r.t != TStr || r.emptyCollapses)
      throw Unsupported("prefilter: json() receiver must be a backed string scalar")
    val s = r.value
    val parsed = try_parse_json(s)
    val iv = try_variant_get(parsed, variantPath(inner, allowNegIndex = false), "variant")
    val falseVar = try_parse_json(lit("false"))
    val value =
      when(s.isNull || parsed.isNull || iv.isNull, falseVar).otherwise(iv)
    // Go tryBase64 runs BEFORE the plain parse (eval.go:362-365), so any
    // receiver that COULD decode must escape: superset sniff of
    // Interp.tryBase64 (strip \r\n; non-empty, length % 4 == 0, std alphabet)
    val stripped = regexp_replace(s, "[\\r\\n]", "")
    val b64maybe = length(stripped) > 0 && length(stripped) % 4 === 0 &&
      stripped.rlike("^[A-Za-z0-9+/=]*$")
    JsonSide(
      CV(value, TVar, noCollapse, mayCollapse = false),
      escape = s.isNotNull && b64maybe,
      recv = Some(s)
    )
  }

  /** `roots` switches resolution into PREFILTER mode: doc-root names resolve
    * through the caller-supplied backing map (doc field → (df column, type))
    * and an unbacked root throws [[Unsupported]] instead of collapsing — the
    * prefilter must never invent a verdict for a path it cannot see.
    */
  private final case class Ctx(schema: StructType, docCol: Option[String],
      roots: Option[Map[String, (String, DataType)]] = None)

  // ---------- recursive compilation ----------

  private def comp(e: Expr, ctx: Ctx): CV = e match {
    case NumLit(v)   => CV(lit(v), TDouble, noCollapse, litNum = Some(v), mayCollapse = false)
    case StrLit(v)   => CV(lit(v), TStr, noCollapse, litStr = Some(v), mayCollapse = false)
    case BoolLit(v)  => CV(lit(v), TBool, noCollapse, mayCollapse = false)
    case NilLit      => CV(lit(null).cast(StringType), TNull, noCollapse, mayCollapse = false)
    case TimeLit(ms) => CV(lit(ms), TLong, noCollapse, litMillis = Some(ms), mayCollapse = false)
    case RegexLit(p) => CV(lit(p), TStr, noCollapse, litRegex = Some(p), mayCollapse = false)

    case PathGet(path) =>
      val r = resolve(path, ctx)
      val collapse =
        if (r.emptyCollapses) r.value.isNull || size(r.value) === 0
        else r.value.isNull
      CV(r.value, r.t, collapse)

    case Logical(op, l, r) =>
      val a = comp(l, ctx)
      val b = comp(r, ctx)
      val ab = truthy(a)
      val bb = truthy(b)
      // `value` may assume ¬collapse (a collapsed node's value is never
      // consulted — ancestors propagate collapse and the root returns false),
      // so logical nodes compile to PLAIN conjunctions/disjunctions that
      // Catalyst can split and push down. Collapse itself still encodes the
      // short-circuit precedence: `false and missing` doesn't collapse,
      // `missing or true` does (reference: server/lib/eval.go:744-776).
      val (value, collapse) = op match {
        case "and" => (ab && bb, a.collapse || (ab && b.collapse))
        case "or"  => (ab || bb, a.collapse || (!ab && b.collapse))
      }
      CV(value, TBool, collapse, mayCollapse = a.mayCollapse || b.mayCollapse)

    case Equality(op, l, r) =>
      val a = comp(l, ctx)
      val b = comp(r, ctx)
      fusedDescentCmp(a, b, eq = true, op)
        .getOrElse {
          val eq = equalityCol(a, b)
          CV(if (op == "==") eq else !eq, TBool, a.collapse || b.collapse,
            mayCollapse = a.mayCollapse || b.mayCollapse)
        }

    case Comparison(op, l, r) =>
      val a = comp(l, ctx)
      val b = comp(r, ctx)
      fusedDescentCmp(a, b, eq = false, op)
        .getOrElse(CV(comparisonCol(op, a, b), TBool, a.collapse || b.collapse,
          mayCollapse = a.mayCollapse || b.mayCollapse))

    case Unary(op, operand) =>
      val a = comp(operand, ctx)
      (op, a.t) match {
        case ("!", TBool)   => CV(!a.value, TBool, a.collapse, mayCollapse = a.mayCollapse)
        case ("-", TDouble) =>
          CV(-a.value, TDouble, a.collapse, litNum = a.litNum.map(-_), mayCollapse = a.mayCollapse)
        // Go's unary minus negates only float64; int64 passes through
        // unchanged (eval.go:681-683 switch has no int64 case)
        case ("-", TLong) => a
        case ("!", TVar) | ("-", TVar) | ("!", TDescent) | ("-", TDescent) =>
          // Go's unary ops mutate only bool/float64 and pass other types
          // through unchanged — a mixed-type result; use the interpreter
          throw Unsupported("unary op on dynamically-typed value")
        case _ => a
      }

    case SubExpr(inner) =>
      // collapse boundary (reference: eval.go:649-651): a collapsed inner
      // expression becomes plain false
      val cv = comp(inner, ctx)
      if (!cv.mayCollapse) cv
      else cv.t match {
        case TBool => CV(!cv.collapse && truthy(cv), TBool, noCollapse, mayCollapse = false)
        case _ =>
          throw Unsupported("non-boolean parenthesized sub-expression that may collapse")
      }

    case HelperCall(name, recv, args) =>
      name match {
        case "startsWith" | "endsWith" | "contains" =>
          if (args.isEmpty) CV(lit(false), TBool, noCollapse)
          else {
            val r = resolve(recv, ctx)
            val a = comp(args.head, ctx)
            // a missing receiver is coerced to boolean false, which
            // stringifies to "false" before the helper runs (reference:
            // eval.go:622-624 + stringOperand); a VARIANT receiver
            // distinguishes JSON null ("null") from missing ("false")
            val s = r.t match {
              case TNull => lit("false")
              case TArr(et) =>
                // singleton wildcard results unwrap before stringification
                when(size(r.value) === 1,
                  elStr(try_element_at(r.value, lit(1)), et))
                  .otherwise(when(r.value.isNull, lit("false")).otherwise(lit("")))
              case _ => coalesce(toStr(r.value, r.t), lit("false"))
            }
            val arg = toStr(a.value, a.t)
            val res = name match {
              case "startsWith" => s.startsWith(arg)
              case "endsWith"   => s.endsWith(arg)
              case _            => s.contains(arg)
            }
            CV(coalesce(res, lit(false)), TBool, a.collapse, mayCollapse = a.mayCollapse)
          }
        case "datetime" =>
          args.headOption.map {
            case SubExpr(inner) => inner // paren-wrapped literal
            case other          => other
          } match {
            case Some(StrLit(s)) =>
              Interp.parseDatetime(s) match {
                case Some(ms) =>
                  CV(lit(ms), TLong, noCollapse, litMillis = Some(ms))
                case None => CV(lit(false), TBool, noCollapse)
              }
            case _ => CV(lit(false), TBool, noCollapse)
          }
        case "limit" => CV(lit(true), TBool, noCollapse)
        case "redact" =>
          throw Unsupported("redact requires the transform path")
        case other => throw Unsupported(s"helper $other")
      }

    case JsonGet(_, _, _) =>
      throw Unsupported("json()/xml() over typed schema — use document fallback")
  }

  // ---------- coercions (reference: server/lib/eval.go:27-88) ----------

  private def truthy(cv: CV): Column = cv.t match {
    case TStr            => cv.value.isNotNull && cv.value =!= ""
    case TVar            => truthyVar(cv.value)
    case TLong | TDouble => cv.value > 0
    case TTimestamp      => unix_millis(cv.value) > 0
    // TBool values are never null under the ¬collapse contract (literals,
    // logical/equality/comparison outputs, coalesced helpers; null bool
    // path-columns are covered by their collapse term) — no coalesce, which
    // would block Catalyst's conjunct splitting + Parquet pushdown.
    case TBool           => cv.value
    case TNull           => lit(false)
    case TArr(et) =>
      // a 1-element wildcard result unwraps to the scalar in the reference
      // (eval.go:627-630), so [0] is falsy while [0,1] (array, len>0) is not
      val v = cv.value
      when(size(v) === 1, truthyScalar(try_element_at(v, lit(1)), et))
        .otherwise(size(v) > 0)
    case TDescent =>
      // single scalar match → its own toBool; array-valued results (single
      // array match or multi-match wrap) → nonEmpty (Coerce.toBool on Arr)
      when(cv.value.getField("single"), descentEl(cv.value).getField("b"))
        .otherwise(size(cv.value.getField("els")) > 0)
  }

  /** First coerced element of a TDescent value (the `single` scalar case). */
  private def descentEl(c: Column): Column =
    try_element_at(c.getField("els"), lit(1))

  private def truthyScalar(c: Column, t: BT): Column = t match {
    case TStr    => coalesce(c =!= "", lit(false))
    case TBool   => coalesce(c, lit(false))
    case TVar    => truthyVar(c)
    case TNull   => lit(false)
    case _       => coalesce(c.try_cast(DoubleType) > 0, lit(false))
  }

  private def toStr(c: Column, t: BT): Column = t match {
    case TStr         => c
    case TVar         => toStrVar(c)
    case TLong        => c.cast(StringType)
    case TTimestamp   => unix_millis(c).cast(StringType)
    case TDouble      => BflExpressions.goFmt(c)
    case TBool        => c.cast(StringType)
    case TNull        => lit("null")
    case TArr(_)      => lit("")
    // single scalar match stringifies itself; array-valued results are ""
    case TDescent     =>
      when(c.getField("single"), descentEl(c).getField("s")).otherwise(lit(""))
  }

  private def toNum(c: Column, t: BT): Column = t match {
    case TLong | TDouble => c.cast(DoubleType)
    case TTimestamp      => unix_millis(c).cast(DoubleType)
    // Go ParseFloat-exact, shared with the interpreter's Coerce.toNum — a
    // try_cast would accept Java forms ('1.5f', whitespace) Go rejects and
    // reject Inf/Infinity/NaN forms Go accepts
    case TStr            => coalesce(BflExpressions.goParseFloat(c), lit(0.0))
    case TVar => toNumVar(c)
    case TBool           => when(coalesce(c, lit(false)), 1.0).otherwise(0.0)
    case TNull           => lit(0.0)
    case TArr(_)         => lit(0.0)
    case TDescent        =>
      when(c.getField("single"), descentEl(c).getField("n")).otherwise(lit(0.0))
  }

  /** Is `%g`-string equality on this double literal equivalent to native
    * numeric equality against an integral column? True when the literal
    * formats to its exact integer digits (6-significant-digit window).
    */
  private def longExact(v: Double): Option[Long] =
    if (v == math.rint(v) && math.abs(v) < 1e15 &&
      GoFmt.format(v) == v.toLong.toString) Some(v.toLong)
    else None

  /** Compile-time (toStr, toNum) views of a provably-static literal operand
    * — the build-time mirror of the toStr/toNum Column forms, gated on the
    * CV actually carrying literal evidence (litStr/litNum/litMillis; TNull
    * is only ever the nil literal).
    */
  private def staticOperand(cv: CV): Option[(String, Double)] =
    if (cv.litRegex.isDefined) None
    else (cv.t, cv.litStr, cv.litNum, cv.litMillis) match {
      case (TStr, Some(s), _, _)    => Some((s, GoFloat.toNum(s)))
      case (TDouble, _, Some(v), _) => Some((GoFmt.format(v), v))
      case (TLong, _, _, Some(ms))  => Some((ms.toString, ms.toDouble))
      case (TNull, _, _, _)         => Some(("null", 0.0))
      case _                        => None
    }

  /** `..name OP static-literal` fuses path walk + existential compare into
    * ONE boolean expression per row ([[BflExpressions.bflDescentCmp]]) —
    * semantics identical to the generic (TDescent, static) existential
    * below, minus the per-row struct building the predicate never reads.
    * NULL from the fused expression IS the descent CV's collapse
    * (value.isNull — the descent Resolved never sets emptyCollapses), so
    * the (value, collapse) pair derives from the one expression and
    * [[graft.plans.FilterCseBinding]] shares its evaluation.
    */
  private def fusedDescentCmp(a: CV, b: CV, eq: Boolean, op: String): Option[CV] = {
    def build(descent: CV, operand: CV, flipped: Boolean): Option[CV] =
      staticOperand(operand).flatMap { case (s, n) =>
        val fusedOp =
          if (eq) "=="
          else if (flipped) "l" + op
          else op
        BflExpressions.bflDescentCmp(descent.value, fusedOp, s, n).map { cmp =>
          val value = if (eq && op == "!=") !cmp else cmp
          CV(value, TBool, cmp.isNull)
        }
      }
    (a.t, b.t) match {
      case (TDescent, TDescent) => None // dynamic-vs-dynamic: interp tier
      case (TDescent, _)        => build(a, b, flipped = false)
      case (_, TDescent)        => build(b, a, flipped = true)
      case _                    => None
    }
  }

  private def equalityCol(a: CV, b: CV): Column = (a, b) match {
    // regex operand ⇒ unanchored match (Go MatchString ≡ rlike). A regex
    // LEFT of a descent matches toStr(value) (single → its string, arrays →
    // "") — the toStr(TDescent) case covers it. A regex RIGHT of an
    // array-valued descent hits Go's (Arr, y) dispatch FIRST: existential
    // string-compare against stringOperand(regex) = "" (eval.go:104-135),
    // NOT a regex match — mirror that exactly.
    case _ if a.litRegex.isDefined => toStr(b.value, b.t).rlike(a.litRegex.get)
    case _ if b.litRegex.isDefined && a.t == TDescent =>
      when(a.value.getField("single"),
        descentEl(a.value).getField("s").rlike(b.litRegex.get))
        .otherwise(coalesce(
          exists(a.value.getField("els"), e => e.getField("s") === ""), lit(false)))
    case _ if b.litRegex.isDefined => toStr(a.value, a.t).rlike(b.litRegex.get)
    case _ =>
      (a.t, b.t) match {
        // descent operands: dynamic-vs-dynamic shapes stay on the interp
        // tier; vs a static operand, the existential over coerced strings
        // (a singleton element IS the scalar compare)
        case (TDescent, TDescent) | (TDescent, TVar) | (TVar, TDescent) |
            (TDescent, TArr(_)) | (TArr(_), TDescent) =>
          throw Unsupported("descent vs dynamic operand")
        case (TDescent, _) =>
          coalesce(exists(a.value.getField("els"),
            e => e.getField("s") === toStr(b.value, b.t)), lit(false))
        case (_, TDescent) =>
          coalesce(exists(b.value.getField("els"),
            e => toStr(a.value, a.t) === e.getField("s")), lit(false))
        // dynamic VARIANT operands: array-ness decided per row
        case (TVar, TVar) =>
          when(isVarArr(a.value) && isVarArr(b.value),
            to_json(a.value) === to_json(b.value)) // deep-equal
            .when(isVarArr(a.value),
              coalesce(exists(varArr(a.value), e => toStrVar(e) === toStrVar(b.value)), lit(false)))
            .when(isVarArr(b.value),
              coalesce(exists(varArr(b.value), e => toStrVar(a.value) === toStrVar(e)), lit(false)))
            .otherwise(toStrVar(a.value) === toStrVar(b.value))
        case (TVar, _) =>
          when(isVarArr(a.value),
            coalesce(exists(varArr(a.value), e => toStrVar(e) === toStr(b.value, b.t)), lit(false)))
            .otherwise(toStrVar(a.value) === toStr(b.value, b.t))
        case (_, TVar) =>
          when(isVarArr(b.value),
            coalesce(exists(varArr(b.value), e => toStr(a.value, a.t) === toStrVar(e)), lit(false)))
            .otherwise(toStr(a.value, a.t) === toStrVar(b.value))
        case (TArr(ea), TArr(eb)) =>
          // single-match wildcard results unwrap to scalars (eval.go:627-630)
          val a1 = elStr(try_element_at(a.value, lit(1)), ea)
          val b1 = elStr(try_element_at(b.value, lit(1)), eb)
          when(size(a.value) === 1 && size(b.value) === 1, a1 === b1)
            .when(size(a.value) === 1,
              coalesce(exists(b.value, e => a1 === elStr(e, eb)), lit(false)))
            .when(size(b.value) === 1,
              coalesce(exists(a.value, e => elStr(e, ea) === b1), lit(false)))
            .otherwise(a.value === b.value) // array-vs-array deep equal
        case (TArr(ea), _) =>
          coalesce(exists(a.value, e => elStr(e, ea) === toStr(b.value, b.t)), lit(false))
        case (_, TArr(eb)) =>
          coalesce(exists(b.value, e => toStr(a.value, a.t) === elStr(e, eb)), lit(false))
        // pushdown fast paths: native typed compare when provably equivalent
        case (TLong, _) if b.litNum.flatMap(longExact).isDefined =>
          a.value === lit(b.litNum.flatMap(longExact).get)
        case (_, TLong) if a.litNum.flatMap(longExact).isDefined =>
          b.value === lit(a.litNum.flatMap(longExact).get)
        case (TTimestamp, _) if b.litMillis.isDefined =>
          val x = b.litMillis.get // floor(ts) == X ⟺ ts ∈ [X, X+1ms)
          a.value >= timestamp_millis(lit(x)) && a.value < timestamp_millis(lit(x + 1))
        case (_, TTimestamp) if a.litMillis.isDefined =>
          val x = a.litMillis.get
          b.value >= timestamp_millis(lit(x)) && b.value < timestamp_millis(lit(x + 1))
        case _ => toStr(a.value, a.t) === toStr(b.value, b.t)
      }
  }

  private def comparisonCol(op: String, a: CV, b: CV): Column = {
    def sc(x: Column, y: Column): Column = op match {
      case ">"  => x > y
      case "<"  => x < y
      case ">=" => x >= y
      case "<=" => x <= y
    }
    // Go: ANY NaN operand makes a comparison false (float64 IEEE semantics),
    // but Spark SQL orders NaN as the LARGEST double and NaN==NaN — so every
    // coerced (double-typed) compare is guarded. NaN reaches here via Go
    // ParseFloat of "nan" strings or NaN values in doc/double data. The
    // typed fast paths below guard only double-typed columns (long/timestamp
    // operands cannot be NaN, and isnan() doesn't type-check on them).
    def scSafe(x: Column, y: Column): Column = sc(x, y) && !isnan(x) && !isnan(y)
    (a.t, b.t) match {
      // descent operands: existential over the coerced numeric view
      // (Coerce.cmp's (Arr, y)/(x, Arr) exists; a singleton element IS the
      // scalar compare); dynamic-vs-dynamic shapes stay on the interp tier
      case (TDescent, TDescent) | (TDescent, TVar) | (TVar, TDescent) |
          (TDescent, TArr(_)) | (TArr(_), TDescent) =>
        throw Unsupported("descent vs dynamic operand")
      case (TDescent, _) =>
        coalesce(exists(a.value.getField("els"),
          i => scSafe(i.getField("n"), toNum(b.value, b.t))), lit(false))
      case (_, TDescent) =>
        coalesce(exists(b.value.getField("els"),
          j => scSafe(toNum(a.value, a.t), j.getField("n"))), lit(false))
      // dynamic VARIANT operands: existential vs scalar, universal vs array
      case (TVar, TVar) =>
        when(isVarArr(a.value) && isVarArr(b.value),
          coalesce(forall(varArr(a.value), i =>
            coalesce(forall(varArr(b.value), j => scSafe(toNumVar(i), toNumVar(j))), lit(true))), lit(true)))
          .when(isVarArr(a.value),
            coalesce(exists(varArr(a.value), i => scSafe(toNumVar(i), toNumVar(b.value))), lit(false)))
          .when(isVarArr(b.value),
            coalesce(exists(varArr(b.value), j => scSafe(toNumVar(a.value), toNumVar(j))), lit(false)))
          .otherwise(scSafe(toNumVar(a.value), toNumVar(b.value)))
      case (TVar, _) =>
        when(isVarArr(a.value),
          coalesce(exists(varArr(a.value), i => scSafe(toNumVar(i), toNum(b.value, b.t))), lit(false)))
          .otherwise(scSafe(toNumVar(a.value), toNum(b.value, b.t)))
      case (_, TVar) =>
        when(isVarArr(b.value),
          coalesce(exists(varArr(b.value), j => scSafe(toNum(a.value, a.t), toNumVar(j))), lit(false)))
          .otherwise(scSafe(toNum(a.value, a.t), toNumVar(b.value)))
      case (TArr(ea), TArr(eb)) =>
        // singleton wildcard results unwrap to scalars first (eval.go:627-630)
        val a1 = elNum(try_element_at(a.value, lit(1)), ea)
        val b1 = elNum(try_element_at(b.value, lit(1)), eb)
        when(size(a.value) === 1 && size(b.value) === 1, scSafe(a1, b1))
          .when(size(a.value) === 1,
            coalesce(exists(b.value, j => scSafe(a1, elNum(j, eb))), lit(false)))
          .when(size(b.value) === 1,
            coalesce(exists(a.value, i => scSafe(elNum(i, ea), b1)), lit(false)))
          .otherwise(coalesce(
            forall(a.value, i => coalesce(forall(b.value, j => scSafe(elNum(i, ea), elNum(j, eb))), lit(true))),
            lit(true)))
      case (TArr(ea), _) =>
        coalesce(exists(a.value, i => scSafe(elNum(i, ea), toNum(b.value, b.t))), lit(false))
      case (_, TArr(eb)) =>
        coalesce(exists(b.value, j => scSafe(toNum(a.value, a.t), elNum(j, eb))), lit(false))
      // pushdown fast paths: numeric compare is identical to the generic
      // double-coerced compare for native numeric columns, but keeps the
      // column uncasted so the filter reaches the Parquet reader. A double
      // COLUMN can hold NaN data, so the isnan guard applies here too — it
      // rides as a separate conjunct, leaving the comparison itself pushable
      case (TDouble, _) if b.litNum.isDefined && a.litNum.isEmpty =>
        sc(a.value, lit(b.litNum.get)) && !isnan(a.value)
      case (_, TDouble) if a.litNum.isDefined && b.litNum.isEmpty =>
        sc(lit(a.litNum.get), b.value) && !isnan(b.value)
      // integral literal vs long column: compare as longs (pushable);
      // equivalent to the double compare for |v| < 2^53
      case (TLong, _) if b.litNum.exists(v => v == math.rint(v) && math.abs(v) < 9e15) =>
        sc(a.value, lit(b.litNum.get.toLong))
      case (_, TLong) if a.litNum.exists(v => v == math.rint(v) && math.abs(v) < 9e15) =>
        sc(lit(a.litNum.get.toLong), b.value)
      case (TLong, _) if b.litNum.isDefined =>
        sc(a.value.cast(DoubleType), lit(b.litNum.get))
      // millis-floor semantics as native boundaries: the reference compares
      // epoch MILLIS (floor), so e.g. floor(ts) > X  ⟺  ts >= X+1ms; these
      // forms stay pushable and agree for sub-millisecond timestamps
      case (TTimestamp, _) if b.litMillis.isDefined =>
        val x = b.litMillis.get
        op match {
          case ">"  => a.value >= timestamp_millis(lit(x + 1))
          case ">=" => a.value >= timestamp_millis(lit(x))
          case "<"  => a.value < timestamp_millis(lit(x))
          case "<=" => a.value < timestamp_millis(lit(x + 1))
        }
      case (_, TTimestamp) if a.litMillis.isDefined =>
        val x = a.litMillis.get
        op match { // X op floor(ts) ⟺ mirrored boundaries
          case "<"  => b.value >= timestamp_millis(lit(x + 1))
          case "<=" => b.value >= timestamp_millis(lit(x))
          case ">"  => b.value < timestamp_millis(lit(x))
          case ">=" => b.value < timestamp_millis(lit(x + 1))
        }
      case _ => scSafe(toNum(a.value, a.t), toNum(b.value, b.t))
    }
  }

  // ---------- schema-aware path resolution ----------

  private final case class Resolved(value: Column, t: BT,
      // wildcard-produced arrays: ZERO matches collapse the expression
      // (jp.Get len<1, eval.go:613-624); a plain array VALUE never does
      emptyCollapses: Boolean = false)
  private def missing: Resolved = Resolved(lit(null).cast(StringType), TNull)

  private def btOf(dt: DataType): BT = dt match {
    case StringType                                    => TStr
    case LongType | IntegerType | ShortType | ByteType => TLong
    case DoubleType | FloatType | _: DecimalType       => TDouble
    case BooleanType                                   => TBool
    case TimestampType | TimestampNTZType              => TTimestamp
    case _                                             => TVar
  }

  private def resolve(path: List[Seg], ctx: Ctx): Resolved = {
    if (path.isEmpty) throw Unsupported("empty path")
    val head = path.head match {
      case Field(n) => n
      case Key(k)   => k
      case other    => throw Unsupported(s"path cannot start with $other")
    }
    ctx.roots match {
      case Some(backed) =>
        backed.get(head) match {
          case Some((cname, dt)) =>
            val r = walk(col(cname), dt, path.tail, strict = true)
            // reject backings the strict contract can't model: a timestamp
            // serializes to ISO-8601 text under to_json while the compiled
            // coercions read epoch millis; TVar here means the leaf is a
            // struct/map/other complex column (strict mode never routes
            // through variantWalk), over which the VARIANT coercion
            // functions would not even analyze
            def badLeaf(t: BT): Boolean = t match {
              case TTimestamp | TVar => true
              case TArr(e)           => badLeaf(e)
              case _                 => false
            }
            if (badLeaf(r.t))
              throw Unsupported(s"prefilter: unmodelable backing type for $head")
            r
          case None => throw Unsupported(s"prefilter: unbacked root $head")
        }
      case None =>
        ctx.schema.fields.find(_.name == head) match {
          case Some(f) => walk(col(f.name), f.dataType, path.tail)
          case None =>
            ctx.docCol match {
              // schema-free document: the whole path goes through the doc
              case Some(dc) => variantWalk(col(dc), path)
              case None     => missing // unknown root field: always collapses
            }
        }
    }
  }

  /** `strict` = prefilter mode: a StringType document boundary is NOT crossed
    * (in the interpreter's doc view the backed field is a JSON *string*
    * scalar, so navigating into it collapses — `missing` models that exactly).
    */
  private def walk(c: Column, dt: DataType, rest: List[Seg], strict: Boolean = false): Resolved =
    rest match {
      case Nil =>
        dt match {
          case ArrayType(et, _) => Resolved(c, TArr(btOf(et)))
          case _                => Resolved(c, btOf(dt))
        }
      case seg :: tail =>
        (dt, seg) match {
          case (st: StructType, Field(n)) =>
            st.fields.find(_.name == n) match {
              case Some(f) => walk(c.getField(n), f.dataType, tail, strict)
              case None    => missing
            }
          case (st: StructType, Key(k)) =>
            st.fields.find(_.name == k) match {
              case Some(f) => walk(c.getField(k), f.dataType, tail, strict)
              case None    => missing
            }
          // try_element_at: ANSI mode makes plain element_at THROW on a
          // missing map key / out-of-range index; BFL semantics collapse
          case (MapType(_, vt, _), Field(n)) => walk(try_element_at(c, lit(n)), vt, tail, strict)
          case (MapType(_, vt, _), Key(k))   => walk(try_element_at(c, lit(k)), vt, tail, strict)
          case (MapType(_, vt, _), Wildcard) if tail.isEmpty =>
            Resolved(map_values(c), TArr(btOf(vt)), emptyCollapses = true)
          case (_: MapType, Wildcard) =>
            throw Unsupported("deep path after map wildcard")
          case (_: StructType, Wildcard) =>
            throw Unsupported("wildcard over struct column")
          case (ArrayType(et, _), Index(i)) =>
            // ojg is 0-based (negative = from end); element_at is 1-based
            val idx = if (i >= 0) i + 1 else i
            walk(try_element_at(c, lit(idx)), et, tail, strict)
          case (ArrayType(et, _), Wildcard) =>
            tail match {
              case Nil => Resolved(c, TArr(btOf(et)), emptyCollapses = true)
              case Field(n) :: Nil =>
                et match {
                  case st: StructType =>
                    st.fields.find(_.name == n) match {
                      case Some(f) =>
                        Resolved(
                          filter(transform(c, e => e.getField(n)), _.isNotNull),
                          TArr(btOf(f.dataType)),
                          emptyCollapses = true
                        )
                      case None => missing
                    }
                  case _ => throw Unsupported("wildcard.field over non-struct array")
                }
              case _ => throw Unsupported("deep path after wildcard")
            }
          case (StringType, _) =>
            if (strict) missing // prefilter: the doc field is a string SCALAR
            else
              // document boundary: remaining path extracts a VARIANT
              variantWalk(c, seg :: tail)
          case (_, Descent(_)) => throw Unsupported("recursive descent")
          case _               => missing
        }
    }

  private val plainKey = "[A-Za-z_][A-Za-z0-9_]*".r

  /** JSONPath string for `try_variant_get`; throws [[Unsupported]] on shapes
    * variant extraction can't mirror (wildcards, descent, and — when
    * `allowNegIndex` is false — ojg's negative from-the-end indexes).
    */
  private def variantPath(rest: List[Seg], allowNegIndex: Boolean = true): String = {
    val sb = new StringBuilder("$")
    def key(k: String): Unit =
      if (plainKey.matches(k)) { sb ++= "."; sb ++= k }
      else if (k.contains("'") || k.contains("\\"))
        throw Unsupported("document key needs quoting the variant path can't express")
      else { sb ++= "['"; sb ++= k; sb ++= "']" } // dotted/spaced keys
    rest.foreach {
      case Field(n) => key(n)
      case Key(k)   => key(k)
      case Index(i) =>
        if (i < 0 && !allowNegIndex)
          throw Unsupported("negative index inside json() prefilter")
        sb ++= s"[$i]"
      case Wildcard =>
        // get_json_object's `[*]` fans out over ARRAYS only, but BFL's
        // wildcard also fans out over object values (ojg semantics) — the
        // document is schema-free so we can't know statically; route to the
        // exact interpreter instead of silently collapsing on objects
        throw Unsupported("wildcard inside JSON document (object-vs-array ambiguity)")
      case Descent(_) =>
        throw Unsupported("recursive descent inside JSON document")
    }
    sb.toString
  }

  private def variantWalk(c: Column, rest: List[Seg]): Resolved =
    // a path with `..name` routes through the dedicated descent expression
    // (JsonTree.get — the interpreter's own walk — evaluated for the PATH
    // only; the predicate around it stays native Columns)
    if (rest.exists(_.isInstanceOf[Descent]))
      Resolved(BflExpressions.bflDescent(c, rest), TDescent)
    else
      // try_parse_json: malformed docs become NULL (collapse), matching the
      // reference's skip-on-parse-error; try_variant_get: missing path NULL
      Resolved(try_variant_get(try_parse_json(c), variantPath(rest), "variant"), TVar)

  // ---------- VARIANT dynamic coercions (exact §1.2 semantics) ----------

  private def sv(c: Column): Column = schema_of_variant(c)
  private def varArr(c: Column): Column =
    c.try_cast(ArrayType(org.apache.spark.sql.types.VariantType))
  private def isVarArr(c: Column): Column = sv(c).startsWith("ARRAY")

  /** stringOperand over a variant: exact digits for int64, Go %g for
    * non-integral numbers, "true"/"false", "null" for JSON null, "" for
    * arrays/objects (no case in Go's switch).
    */
  private def toStrVar(c: Column): Column =
    when(is_variant_null(c), lit("null"))
      .when(sv(c) === "STRING", c.try_cast(StringType))
      .when(sv(c) === "BIGINT", c.try_cast(LongType).cast(StringType))
      .when(sv(c) === "BOOLEAN", c.try_cast(BooleanType).cast(StringType))
      .when(isVarArr(c) || sv(c).startsWith("OBJECT"), lit(""))
      .otherwise(BflExpressions.goFmt(c.try_cast(DoubleType)))

  /** float64Operand over a variant: ParseFloat-else-0 for strings, 1/0 for
    * bools, 0 for null/arrays/objects, numeric value otherwise.
    */
  private def toNumVar(c: Column): Column =
    when(is_variant_null(c), lit(0.0))
      .when(sv(c) === "STRING",
        coalesce(BflExpressions.goParseFloat(c.try_cast(StringType)), lit(0.0)))
      .when(isVarArr(c) || sv(c).startsWith("OBJECT"), lit(0.0))
      .otherwise(coalesce(c.try_cast(DoubleType), lit(0.0)))

  // null elements inside typed arrays coerce like JSON null
  // (stringOperand(nil)="null", float64Operand(nil)=0 — eval.go:58-59,84-85)
  private def elStr(e: Column, t: BT): Column = coalesce(toStr(e, t), lit("null"))
  private def elNum(e: Column, t: BT): Column = coalesce(toNum(e, t), lit(0.0))

  /** boolOperand over a variant. */
  private def truthyVar(c: Column): Column =
    when(c.isNull || is_variant_null(c), lit(false))
      .when(sv(c) === "STRING", c.try_cast(StringType) =!= "")
      .when(sv(c) === "BOOLEAN", c.try_cast(BooleanType))
      .when(isVarArr(c), size(varArr(c)) > 0)
      .when(sv(c).startsWith("OBJECT"), lit(false))
      .otherwise(coalesce(c.try_cast(DoubleType) > 0, lit(false)))
}
