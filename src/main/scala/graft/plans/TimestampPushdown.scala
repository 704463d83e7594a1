package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalyst rule restoring Parquet pushdown for timestamp predicates over
  * the engine's nanos-backed event logs.
  *
  * `events.parquet` carries TIMESTAMP(NANOS), which Spark reads as a raw
  * Long (`nanosAsLong`); [[graft.Tables]] projects it to a usable timestamp
  * as `timestamp_micros(ts DIV 1000)`. Any predicate on that computed column
  * — e.g. the BFL compiler's `ts >= datetime(...)` fast path — is an
  * expression over a projection, so only `IsNotNull` ever reached
  * `PushedFilters` and every timestamp range query scanned all row groups.
  *
  * Two algebraic rewrites fix it, running inside the operator-optimization
  * fixed point (so PushDownPredicates can then push the result into the
  * scan):
  *
  *   1. `timestamp_micros(x) <op> TIMESTAMP_LITERAL` → `x <op> micros_lit`
  *      (a timestamp literal IS its epoch-micros Long internally; the
  *      conversion is a strictly monotone bijection)
  *   2. `(a div d) <op> m` (d > 0 literal) → a-space bounds using floor
  *      semantics: `a div d >= m ⟺ a >= m*d`, `a div d > m ⟺ a >= (m+1)*d`,
  *      `a div d < m ⟺ a < m*d`, `a div d <= m ⟺ a < (m+1)*d`,
  *      `a div d = m ⟺ a >= m*d && a < (m+1)*d` — restricted to NON-NEGATIVE
  *      `a` domains (epoch nanos): Spark's `div` truncates toward zero,
  *      which equals floor only for non-negative operands, so the rewrite
  *      applies only when the comparison keeps `a` on the non-negative side
  *      (m >= 0), where truncation and floor agree.
  *
  * Composed, `timestamp_micros(ts DIV 1000) >= TIMESTAMP '...'` becomes
  * `ts >= micros*1000` over the raw Parquet Long column — attribute vs
  * literal, pushable, row-group min/max prunable. Applies only inside
  * Filter conditions; overflow-checked before multiplying.
  */
object TimestampPushdown extends Rule[LogicalPlan] {

  private def mulSafe(m: Long, d: Long): Option[Long] = {
    val r = m * d
    if (d != 0 && (r / d == m)) Some(r) else None
  }

  private object DivExpr {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case IntegralDivide(a, Literal(d: Long, LongType), _)
          if d > 0 && a.dataType == LongType => Some((a, d))
      case _ => None
    }
  }
  private object LongLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(m: Long, LongType) => Some(m)
      case _ => None
    }
  }

  /** `cast(ntz AS timestamp)` where the session TZ is UTC: both types store
    * epoch micros and the UTC wall-clock reinterpretation is the identity on
    * that Long, so comparisons may unwrap to the NTZ attribute (making the
    * predicate pushable into the Parquet scan). Current fixtures carry `ts`
    * as TIMESTAMP(MICROS, isAdjustedToUTC=false) which [[graft.Tables]]
    * normalizes with exactly this cast.
    */
  private object UtcNtzCast {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast
          if c.dataType == TimestampType && c.child.dataType == TimestampNTZType &&
            conf.sessionLocalTimeZone == "UTC" =>
        Some(c.child)
      case _ => None
    }
  }

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    // 1. strip the micros→timestamp conversion against timestamp literals
    case GreaterThanOrEqual(MicrosToTimestamp(x), Literal(t: Long, TimestampType)) =>
      GreaterThanOrEqual(x, Literal(t, LongType))
    case GreaterThan(MicrosToTimestamp(x), Literal(t: Long, TimestampType)) =>
      GreaterThan(x, Literal(t, LongType))
    case LessThanOrEqual(MicrosToTimestamp(x), Literal(t: Long, TimestampType)) =>
      LessThanOrEqual(x, Literal(t, LongType))
    case LessThan(MicrosToTimestamp(x), Literal(t: Long, TimestampType)) =>
      LessThan(x, Literal(t, LongType))
    case EqualTo(MicrosToTimestamp(x), Literal(t: Long, TimestampType)) =>
      EqualTo(x, Literal(t, LongType))
    case GreaterThanOrEqual(Literal(t: Long, TimestampType), MicrosToTimestamp(x)) =>
      LessThanOrEqual(x, Literal(t, LongType))
    case GreaterThan(Literal(t: Long, TimestampType), MicrosToTimestamp(x)) =>
      LessThan(x, Literal(t, LongType))
    case LessThanOrEqual(Literal(t: Long, TimestampType), MicrosToTimestamp(x)) =>
      GreaterThanOrEqual(x, Literal(t, LongType))
    case LessThan(Literal(t: Long, TimestampType), MicrosToTimestamp(x)) =>
      GreaterThan(x, Literal(t, LongType))
    case IsNotNull(MicrosToTimestamp(x)) => IsNotNull(x)

    // 1b. strip the NTZ→TZ cast (UTC sessions only — see UtcNtzCast): both
    // orderings compare the same epoch-micros Long, so the literal just
    // re-types to NTZ with an identical value
    case b @ BinaryComparison(UtcNtzCast(x), Literal(t, TimestampType)) =>
      b.withNewChildren(Seq(x, Literal(t, TimestampNTZType)))
    case b @ BinaryComparison(Literal(t, TimestampType), UtcNtzCast(x)) =>
      b.withNewChildren(Seq(Literal(t, TimestampNTZType), x))
    case IsNotNull(UtcNtzCast(x)) => IsNotNull(x)

    // 2. un-divide: (a div d) cmp m  →  a cmp' (m*d | (m+1)*d). Spark's div
    // truncates toward ZERO, which differs from floor on negative a — every
    // case below requires m >= 1, where a-negative rows evaluate false on
    // BOTH sides (original: trunc(a/d) <= 0 < m; rewritten: bound >= d > a),
    // so truncate-vs-floor can never be observed. m == 0 forms are left
    // alone (they'd need a > -d style bounds).
    case cmp @ GreaterThanOrEqual(DivExpr(a, d), LongLit(m)) if m >= 1 =>
      mulSafe(m, d).map(x => GreaterThanOrEqual(a, Literal(x, LongType))).getOrElse(cmp)
    // m+1 forms also need m < Long.MaxValue: the increment would wrap and
    // mulSafe's self-consistency check cannot see the wrap with d == 1
    case cmp @ GreaterThan(DivExpr(a, d), LongLit(m)) if m >= 1 && m < Long.MaxValue =>
      mulSafe(m + 1, d).map(x => GreaterThanOrEqual(a, Literal(x, LongType))).getOrElse(cmp)
    case cmp @ LessThan(DivExpr(a, d), LongLit(m)) if m >= 1 =>
      mulSafe(m, d).map(x => LessThan(a, Literal(x, LongType))).getOrElse(cmp)
    case cmp @ LessThanOrEqual(DivExpr(a, d), LongLit(m)) if m >= 1 && m < Long.MaxValue =>
      mulSafe(m + 1, d).map(x => LessThan(a, Literal(x, LongType))).getOrElse(cmp)
    case cmp @ EqualTo(DivExpr(a, d), LongLit(m)) if m >= 1 && m < Long.MaxValue =>
      (mulSafe(m, d), mulSafe(m + 1, d)) match {
        case (Some(lo), Some(hi)) =>
          And(GreaterThanOrEqual(a, Literal(lo, LongType)), LessThan(a, Literal(hi, LongType)))
        case _ => cmp
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val r = rewrite(cond)
      if (r fastEquals cond) f else Filter(r, child)
  }
}

/** SparkSessionExtensions hook: `injectOptimizerRule` places the rule in the
  * operator-optimization fixed point, so PushDownPredicates sees the
  * rewritten attribute-vs-literal form and pushes it into the scan.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TimestampPushdown)
    ext.injectOptimizerRule(_ => NotNullDerivation)
    // FilterCseBinding is NOT injected here: it must run after the pushdown
    // batches (see its scaladoc) — graft.Sessions wires it into
    // spark.experimental.extraOptimizations at session creation
  }
}
