package graft.bfl

import Ast._
import Ast.Raw._

/** Compile-time pass: flattens identifier/select chains into JSONPath segment
  * lists, splits `json()`/`xml()` into (outer, inner) paths, constant-folds the
  * time helpers, and extracts `limit(N)`.
  *
  * Port of the reference's semantics (reference: server/lib/precompute.go),
  * re-expressed as a pure raw-tree → normalized-tree transform instead of
  * in-place AST mutation. Notable preserved quirks:
  *   - `a.b()` (empty parens) degrades to the bare path `a.b` (Parameters stay
  *     nil in the reference grammar).
  *   - Helper-call parameters are never precomputed, so a path used as a
  *     parameter evaluates to `false` (reference: evalPrimary's nil-JsonPath
  *     CallExpression branch, server/lib/eval.go:652-654 + 581-587).
  *   - A select-`..descent` after a non-`json()`/`xml()` chain is dropped from
  *     the path (reference: server/lib/precompute.go:113-118).
  *   - `months(n)` = 30 days, `years(n)` = 365 days, fixed arithmetic
  *     (reference: server/lib/precompute.go:170-175).
  *   - Leftmost `limit(N)` wins (backpropagate keeps the first non-zero,
  *     reference: server/lib/precompute.go:45-54).
  */
object Normalize {

  private val timeUnits: Map[String, Long] = Map(
    "seconds" -> 1000L,
    "minutes" -> 60L * 1000,
    "hours" -> 3600L * 1000,
    "days" -> 24L * 3600 * 1000,
    "weeks" -> 7L * 24 * 3600 * 1000,
    "months" -> 30L * 24 * 3600 * 1000,
    "years" -> 365L * 24 * 3600 * 1000
  )

  private final class Ctx(val nowMillis: Long) {
    var limit: Option[Long] = None
    def setLimit(n: Long): Unit = if (limit.isEmpty && n != 0) limit = Some(n)
  }

  def apply(raw: RExpression): Either[String, Query] =
    apply(raw, System.currentTimeMillis())

  def apply(raw: RExpression, nowMillis: Long): Either[String, Query] = {
    val ctx = new Ctx(nowMillis)
    try {
      val e = normLogical(raw.logical, Nil, None, ctx)
      Right(Query(Some(e), ctx.limit))
    } catch { case ex: IllegalArgumentException => Left(ex.getMessage) }
  }

  private def normLogical(l: RLogical, prepend: List[Seg], jctx: Option[(List[Seg], String)], ctx: Ctx): Expr = {
    val lhs = normEquality(l.eq, prepend, jctx, ctx)
    l.next match {
      case None             => lhs
      case Some((op, rest)) => Logical(op, lhs, normLogical(rest, prepend, jctx, ctx))
    }
  }

  private def normEquality(e: REquality, prepend: List[Seg], jctx: Option[(List[Seg], String)], ctx: Ctx): Expr = {
    val lhs = normComparison(e.cmp, prepend, jctx, ctx)
    e.next match {
      case None             => lhs
      case Some((op, rest)) => Equality(op, lhs, normEquality(rest, prepend, jctx, ctx))
    }
  }

  private def normComparison(c: RComparison, prepend: List[Seg], jctx: Option[(List[Seg], String)], ctx: Ctx): Expr = {
    val lhs = normUnary(c.un, prepend, jctx, ctx)
    c.next match {
      case None             => lhs
      case Some((op, rest)) => Comparison(op, lhs, normComparison(rest, prepend, jctx, ctx))
    }
  }

  private def normUnary(u: RUnary, prepend: List[Seg], jctx: Option[(List[Seg], String)], ctx: Ctx): Expr =
    u match {
      case RUnaryOp(op, operand) => Unary(op, normUnary(operand, prepend, jctx, ctx))
      case RPrimaryU(p)          => normPrimary(p, prepend, jctx, ctx)
    }

  /** strings.Trim(s, "\"") — strip quote CHARS from both ends, no unescaping. */
  private def trimQuotes(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == '"') a += 1
    while (b > a && s.charAt(b - 1) == '"') b -= 1
    s.substring(a, b)
  }

  private def normPrimary(p: RPrimary, prepend: List[Seg], jctx: Option[(List[Seg], String)], ctx: Ctx): Expr =
    p match {
      case RNumber(v)   => NumLit(v)
      case RString(raw) => StrLit(trimQuotes(raw))
      case RRegex(raw)  => RegexLit(trimQuotes(raw))
      case RBool(v)     => BoolLit(v)
      case RNil         => NilLit
      case RSub(e)      => SubExpr(normLogical(e.logical, prepend, jctx, ctx))
      case call: RCall  => normCall(call, prepend, jctx, ctx)
    }

  private def selectionSegs(sel: RSelect): List[Seg] = {
    // Reference handles Index ELSE Key — a key after an index is dropped
    // (reference: server/lib/precompute.go:77-99, else-if chain).
    if (sel.index.isDefined) List(Index(sel.index.get))
    else
      sel.key match {
        case Some("*") => List(Wildcard)
        case Some(k)   => List(Key(trimQuotes(k)))
        case None      => Nil
      }
  }

  private def normCall(call: RCall, prepend: List[Seg], jctx: Option[(List[Seg], String)], ctx: Ctx): Expr = {
    val lastName = call.segs.lastOption match {
      case Some(Field(n)) => n
      case _              => ""
    }

    call.params match {
      case None =>
        // Not a function call (or empty parens).
        val jsonHelper = call.select.isDefined && (lastName == "json" || lastName == "xml")
        if (jsonHelper) {
          val outer = prepend ++ call.segs.init
          val sel = call.select.get
          val base = selectionSegs(sel)
          sel.cont match {
            case Some(contE) =>
              // `json().brand.name …` — the continuation is a full expression
              // evaluated with the json-context set.
              normLogical(contE.logical, Nil, Some((outer, lastName)), ctx)
            case None =>
              val inner = sel.descent match {
                case Some(d) => base :+ Descent(d)
                case None    => base
              }
              JsonGet(outer, lastName, inner)
          }
        } else {
          val withSel = call.select match {
            case None => prepend ++ call.segs
            case Some(sel) =>
              val p0 = prepend ++ call.segs ++ selectionSegs(sel)
              // descent after a non-json chain is dropped (see scaladoc)
              p0
          }
          call.select.flatMap(_.cont) match {
            case Some(contE) =>
              // continuation is evaluated with the accumulated path as the
              // prefix (relative to the json() root when jctx is set)
              normLogical(contE.logical, withSel, jctx, ctx)
            case None =>
              jctx match {
                case Some((outer, kind)) => JsonGet(outer, kind, withSel)
                case None =>
                  // bare `now` / `now()` is the current instant
                  if (lastName == "now" && call.select.isEmpty)
                    TimeLit(ctx.nowMillis)
                  else PathGet(withSel)
              }
          }
        }

      case Some(params) =>
        val full = prepend ++ call.segs
        val helperName = lastName
        jctx match {
          case Some((outer, kind)) =>
            // Reference overwrites the parameters with the inner path here
            // (server/lib/precompute.go:128-133); net effect is a plain get.
            JsonGet(outer, kind, full)
          case None =>
            helperName match {
              case "limit" =>
                ctx.setLimit(constNum(params.head.expr).toLong)
                HelperCall("limit", full.init, Nil)
              case h if timeUnits.contains(h) =>
                val n = constNum(params.head.expr).toLong
                TimeLit(ctx.nowMillis + n * timeUnits(h))
              case _ =>
                HelperCall(helperName, full.init, params.map(p => normParam(p.expr, ctx)))
            }
        }
    }
  }

  /** Parameters are not precomputed in the reference, so any call-expression
    * (bare path or nested call) inside a parameter evaluates to `false`.
    */
  private def normParam(e: RExpression, ctx: Ctx): Expr = {
    def go(l: RLogical): Expr = {
      val lhs = goEq(l.eq)
      l.next match {
        case None             => lhs
        case Some((op, rest)) => Logical(op, lhs, go(rest))
      }
    }
    def goEq(q: REquality): Expr = {
      val lhs = goCmp(q.cmp)
      q.next match {
        case None             => lhs
        case Some((op, rest)) => Equality(op, lhs, goEq(rest))
      }
    }
    def goCmp(c: RComparison): Expr = {
      val lhs = goUn(c.un)
      c.next match {
        case None             => lhs
        case Some((op, rest)) => Comparison(op, lhs, goCmp(rest))
      }
    }
    def goUn(u: RUnary): Expr = u match {
      case RUnaryOp(op, o) => Unary(op, goUn(o))
      case RPrimaryU(p) =>
        p match {
          case RNumber(v)   => NumLit(v)
          case RString(s)   => StrLit(trimQuotes(s))
          case RRegex(s)    => RegexLit(trimQuotes(s))
          case RBool(v)     => BoolLit(v)
          case RNil         => NilLit
          case RSub(e2)     => SubExpr(go(e2.logical))
          case _: RCall     => BoolLit(false)
        }
    }
    go(e.logical)
  }

  /** Constant eval for `limit(N)` / time-helper arguments: the reference
    * runs the FULL evaluator against a nil object (precompute.go:149), so
    * `limit(5 == 5)` folds to float64Operand(true) = 1. Reuses normParam
    * (call-expressions become false, like unprecomputed params) + the
    * interpreter's value evaluation.
    */
  private def constNum(e: RExpression): Double = {
    val dummy = new Ctx(0L)
    val norm = normParam(e, dummy)
    val (v, collapsed) = new Interp(Query(Some(norm), None)).evalValue(null)
    if (collapsed) 0.0 else Coerce.toNum(v)
  }
}
