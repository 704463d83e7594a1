package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.bfl.{GoFmt, Interp, JsonTree, Parser}

/** Go `strconv.FormatFloat(f,'g',6,64)` as a Catalyst expression — used by the
  * BFL Column compiler for string-coerced equality on double operands
  * (reference: server/lib/eval.go:55). Null-propagating unary; interpreted
  * eval is fine here because it only appears in equality residuals, never in
  * scan-pushdown position.
  */
case class GoFormatExpr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(GoFmt.format(v.asInstanceOf[Double]))
  override protected def withNewChildInternal(c: Expression): GoFormatExpr = copy(c)
  override def prettyName: String = "go_fmt"
}

/** Full-fidelity BFL predicate over a JSON-string document column. Fallback
  * for queries outside the Column compiler's subset (redact / json() / xml()
  * / recursive descent / wildcard fan-out over schema-free docs). Evaluates
  * the reference interpreter row-at-a-time; the query is compiled once per
  * executor thread via a transient lazy val.
  */
case class BflMatchExpr(child: Expression, queryStr: String)
    extends UnaryExpression
    with CodegenFallback {

  // parsed EAGERLY on the driver: one Normalize call means one now() fold
  // (time helpers stay consistent across executors/partitions/retries, like
  // the reference's single server-side compile) and malformed queries or
  // regexes fail at submission, not per-row
  private val parsed: graft.bfl.Ast.Query =
    Parser.parse(queryStr) match {
      case Right(q) => q
      case Left(e)  => throw new IllegalArgumentException(s"bad BFL query: $e")
    }

  @transient private lazy val interp: Interp = new Interp(parsed)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val json = v.toString
    JsonTree.tryParse(json) match {
      case Some(root) => interp.eval(root)
      case None       => false
    }
  }

  override protected def withNewChildInternal(c: Expression): BflMatchExpr =
    copy(child = c)
  override def prettyName: String = "bfl_match"
}

/** BFL record transform: evaluates the query (for its record-altering helpers,
  * i.e. redact) and returns the transformed JSON text. Pairs with
  * [[BflMatchExpr]] the way the reference's Eval returns (truth, newJson)
  * (reference: server/lib/eval.go:802-812).
  */
case class BflTransformExpr(child: Expression, queryStr: String)
    extends UnaryExpression
    with CodegenFallback {

  // parsed EAGERLY on the driver: one Normalize call means one now() fold
  // (time helpers stay consistent across executors/partitions/retries, like
  // the reference's single server-side compile) and malformed queries or
  // regexes fail at submission, not per-row
  private val parsed: graft.bfl.Ast.Query =
    Parser.parse(queryStr) match {
      case Right(q) => q
      case Left(e)  => throw new IllegalArgumentException(s"bad BFL query: $e")
    }

  @transient private lazy val interp: Interp = new Interp(parsed)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val json = v.toString
    JsonTree.tryParse(json) match {
      case Some(root) =>
        interp.eval(root)
        UTF8String.fromString(JsonTree.serialize(root))
      case None => null
    }
  }

  override protected def withNewChildInternal(c: Expression): BflTransformExpr =
    copy(child = c)
  override def prettyName: String = "bfl_transform"
}

/** Fused filter+transform: one parse + one eval per row, returning the
  * transformed JSON when the query matches, else NULL — so
  * `withColumn(doc, bfl_eval).where(doc.isNotNull)` does the whole
  * reference query path in a single interpreter pass (the reference's Eval
  * also computes (truth, newJson) in one walk, server/lib/eval.go:802-812).
  */
case class BflEvalExpr(child: Expression, queryStr: String)
    extends UnaryExpression
    with CodegenFallback {

  // parsed EAGERLY on the driver: one Normalize call means one now() fold
  // (time helpers stay consistent across executors/partitions/retries, like
  // the reference's single server-side compile) and malformed queries or
  // regexes fail at submission, not per-row
  private val parsed: graft.bfl.Ast.Query =
    Parser.parse(queryStr) match {
      case Right(q) => q
      case Left(e)  => throw new IllegalArgumentException(s"bad BFL query: $e")
    }

  @transient private lazy val interp: Interp = new Interp(parsed)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    JsonTree.tryParse(v.toString) match {
      case Some(root) if interp.eval(root) =>
        UTF8String.fromString(JsonTree.serialize(root))
      case _ => null
    }

  override protected def withNewChildInternal(c: Expression): BflEvalExpr =
    copy(child = c)
  override def prettyName: String = "bfl_eval"
}

/** Go `strconv.ParseFloat`-exact string→double coercion (errors → 0.0), the
  * compiled tier's twin of the interpreter's Coerce.toNum — both call
  * [[graft.bfl.GoFloat]], so `"Inf"`/`"NaN"`/underscored/hex-float strings
  * evaluate identically whichever tier runs the query (a `try_cast` here
  * would accept Java forms Go rejects and reject Inf/NaN forms Go accepts).
  */
case class GoParseFloatExpr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullSafeEval(v: Any): Any =
    java.lang.Double.valueOf(graft.bfl.GoFloat.toNum(v.toString))
  override protected def withNewChildInternal(c: Expression): GoParseFloatExpr = copy(c)
  override def prettyName: String = "go_parse_float"
}

/** Compiled tier for `..name` recursive descent over a schema-free JSON doc
  * (the one path shape that previously always fell back to the full
  * per-row interpreter). Evaluates ONLY the path — `JsonTree.get`, the same
  * walk the interpreter uses — and emits every Coerce view of the matches so
  * the surrounding predicate stays native Columns:
  *
  *   - `single` TRUE iff exactly one match that is NOT an array (the
  *     interpreter's scalar `Res(v)` case; a single array match and the
  *     multi-match wrap share identical existential semantics, so both
  *     encode as `single = false` + the elements);
  *   - `els[i] = (s, n, b)` — Coerce.toStr / toNum / toBool of each match
  *     (containers: "" / 0 / arr-nonEmpty, exactly eval.go:27-88);
  *   - NULL for zero matches (the collapse signal) or an unparseable doc.
  */
case class BflDescentExpr(child: Expression, segs: List[graft.bfl.Ast.Seg])
    extends UnaryExpression
    with CodegenFallback {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._

  override def dataType: DataType = BflDescentExpr.schema
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    JsonTree.tryParse(v.toString) match {
      case None => null
      case Some(root) =>
        val matches = JsonTree.get(root, segs)
        if (matches.isEmpty) null
        else {
          val (single, els) = matches match {
            case (a: JsonTree.Arr) :: Nil => (false, a.toList)
            case m :: Nil                 => (true, List(m))
            case ms                       => (false, ms)
          }
          val coerced = els.map { e =>
            InternalRow(
              UTF8String.fromString(graft.bfl.Coerce.toStr(e)),
              graft.bfl.Coerce.toNum(e),
              graft.bfl.Coerce.toBool(e))
          }
          InternalRow(single, new GenericArrayData(coerced))
        }
    }

  override protected def withNewChildInternal(c: Expression): BflDescentExpr =
    copy(child = c)
  override def prettyName: String = "bfl_descent"
}

object BflDescentExpr {
  import org.apache.spark.sql.types._
  val elSchema: StructType = StructType(Seq(
    StructField("s", StringType, nullable = false),
    StructField("n", DoubleType, nullable = false),
    StructField("b", BooleanType, nullable = false)))
  val schema: StructType = StructType(Seq(
    StructField("single", BooleanType, nullable = false),
    StructField("els", ArrayType(elSchema, containsNull = false), nullable = false)))
}

/** Fused `..name OP static-literal` — the boolean fast path of
  * [[BflDescentExpr]] for the dominant descent shape (a comparison against
  * an operand known at compile time): ONE JsonTree parse + walk per row,
  * the existential compare evaluated inline over the raw match values — no
  * per-match struct/array building, no UTF8String conversion of views the
  * predicate never reads. Exactly [[BflDescentExpr]]'s semantics composed
  * with the compiled existential tier:
  *
  *   - equality (`op` "=="): ∃ element whose Coerce.toStr equals
  *     `strOperand` (Compiler.equalityCol's (TDescent, static) case);
  *   - ordering (`op` ">" "<" ">=" "<=", literal RIGHT; "l"-prefixed forms
  *     for literal LEFT): ∃ element whose Coerce.toNum satisfies the
  *     NaN-guarded compare against `numOperand` (comparisonCol's case);
  *   - NULL for zero matches or an unparseable doc — the collapse signal
  *     the surrounding (value, collapse) algebra reads via IsNull.
  *
  * `!=` is `Not` over this expression at the CV layer (three-valued Not
  * preserves the NULL collapse channel). Both predicate references (value +
  * IsNull collapse) share one evaluation via [[graft.plans.FilterCseBinding]].
  */
case class BflDescentCmpExpr(child: Expression, segs: List[graft.bfl.Ast.Seg],
    op: String, strOperand: String, numOperand: Double)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    JsonTree.tryParse(v.toString) match {
      case None => null
      case Some(root) =>
        val matches = JsonTree.get(root, segs)
        if (matches.isEmpty) null
        else {
          val els = matches match {
            case (a: JsonTree.Arr) :: Nil => a.toList
            case m :: Nil                 => List(m)
            case ms                       => ms
          }
          val r = op match {
            case "==" => els.exists(e => graft.bfl.Coerce.toStr(e) == strOperand)
            case _ =>
              !numOperand.isNaN && els.exists { e =>
                val n = graft.bfl.Coerce.toNum(e)
                !n.isNaN && (op match {
                  case ">"   => n > numOperand
                  case "<"   => n < numOperand
                  case ">="  => n >= numOperand
                  case "<="  => n <= numOperand
                  case "l>"  => numOperand > n
                  case "l<"  => numOperand < n
                  case "l>=" => numOperand >= n
                  case "l<=" => numOperand <= n
                })
              }
          }
          java.lang.Boolean.valueOf(r)
        }
    }

  override protected def withNewChildInternal(c: Expression): BflDescentCmpExpr =
    copy(child = c)
  override def prettyName: String = "bfl_descent_cmp"
}

object BflExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def goFmt(c: Column): Column = ColumnBridge.column(GoFormatExpr(expr(c)))
  def bflDescent(c: Column, segs: List[graft.bfl.Ast.Seg]): Column =
    ColumnBridge.column(BflDescentExpr(expr(c), segs))
  /** Some(fused compare) when `c` wraps a [[BflDescentExpr]] — the Compiler
    * probes this at Equality/Comparison nodes with a static operand.
    */
  def bflDescentCmp(c: Column, op: String, strOperand: String,
      numOperand: Double): Option[Column] =
    ColumnBridge.expression(c) match {
      case BflDescentExpr(child, segs) =>
        Some(ColumnBridge.column(BflDescentCmpExpr(child, segs, op, strOperand, numOperand)))
      case _ => None
    }
  def goParseFloat(c: Column): Column = ColumnBridge.column(GoParseFloatExpr(expr(c)))
  def bflMatch(c: Column, query: String): Column =
    ColumnBridge.column(BflMatchExpr(expr(c), query))
  def bflTransform(c: Column, query: String): Column =
    ColumnBridge.column(BflTransformExpr(expr(c), query))
  def bflEval(c: Column, query: String): Column =
    ColumnBridge.column(BflEvalExpr(expr(c), query))

  private def expr(c: Column): Expression = ColumnBridge.expression(c)
}
