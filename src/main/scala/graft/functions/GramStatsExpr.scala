package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local clipped n-gram statistics for the generation-quality metrics
  * (BLEU / ROUGE / chrF): per (doc, n) for n = 1..maxN, the multiset
  * intersection size of the reference and hypothesis gram bags plus both
  * totals — computed INSIDE the row, so the per-doc gram bags never leave
  * it (guide §8: decide with small rows). The former plan exploded a
  * (doc, n, gram) relation ~maxN× the token/char count of the corpus and
  * shuffled it into a hash aggregate whose key cardinality ≈ its row
  * count — the worst case for map-side combining; at 100 TB that exchange
  * IS the metric's cost. Here only maxN tiny structs per document reach
  * the aggregation.
  *
  * Exactness contract: identical to the relational form
  * `explode(grams) → groupBy(doc, n, gram) → Σ min(hc, rc) / Σ hc / Σ rt`
  * by construction — a per-doc hash map holds the reference bag keyed on
  * the gram's UTF8String (byte equality, exactly the join/groupBy
  * equality), the hypothesis grams decrement it (Σ over gram types of
  * min(hc, rc) IS the multiset-intersection size) — and GramStatsSpec
  * pins the equality against the Column form on adversarial inputs. The
  * DuckDB oracle keeps the relational spelling, so every board hash
  * doubles as an equivalence proof.
  *
  * Output: array of exactly maxN structs (n, m, ht, rt) — zero-valued
  * where a side is shorter than n, matching the relational form's absent
  * rows under the downstream per-n sums.
  */
private[graft] object GramStatsCore {

  /** Clipped-match + totals over pre-built gram sequences. */
  def stats(maxN: Int, refGrams: Int => Array[UTF8String],
      hypGrams: Int => Array[UTF8String]): ArrayData = {
    val out = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      val rg = refGrams(n)
      val hg = hypGrams(n)
      var m = 0L
      if (rg.length > 0 && hg.length > 0) {
        val bag = new java.util.HashMap[UTF8String, Integer](rg.length * 2)
        var i = 0
        while (i < rg.length) {
          val prev = bag.get(rg(i))
          bag.put(rg(i), if (prev == null) 1 else prev + 1)
          i += 1
        }
        i = 0
        while (i < hg.length) {
          val c = bag.get(hg(i))
          if (c != null && c > 0) { m += 1; bag.put(hg(i), c - 1) }
          i += 1
        }
      }
      out(n - 1) = InternalRow(n, m, hg.length.toLong, rg.length.toLong)
      n += 1
    }
    new GenericArrayData(out)
  }

  val entryType: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("m", LongType, nullable = false),
    StructField("ht", LongType, nullable = false),
    StructField("rt", LongType, nullable = false)))
}

/** Token n-gram stats: inputs are the two token ARRAYS (the `_b_ref` /
  * `_b_hyp` relations of [[graft.operators.TextEval.refHyp]]); grams are
  * space-joined token windows, exactly `array_join(slice(a, i, n), " ")`.
  */
case class TokenGramStatsExpr(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {

  require(maxN >= 1 && maxN <= 10, s"token_gram_stats: maxN out of range: $maxN")

  override def dataType: DataType =
    ArrayType(GramStatsCore.entryType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_gram_stats requires two array<string> columns, got $other")
    }

  private val space = UTF8String.fromString(" ")

  private def toks(v: ArrayData): Array[UTF8String] = v match {
    case null => Array.empty[UTF8String]
    case a =>
      val out = new Array[UTF8String](a.numElements())
      var i = 0
      while (i < out.length) {
        out(i) = a.getUTF8String(i) // split() arrays never hold nulls
        i += 1
      }
      out
  }

  private def grams(t: Array[UTF8String], n: Int): Array[UTF8String] = {
    if (t.length < n) return Array.empty[UTF8String]
    if (n == 1) return t
    val out = new Array[UTF8String](t.length - n + 1)
    val win = new Array[UTF8String](n)
    var i = 0
    while (i < out.length) {
      var d = 0
      while (d < n) { win(d) = t(i + d); d += 1 }
      // concatWs byte-assembles exactly array_join's " "-separated gram
      out(i) = UTF8String.concatWs(space, win: _*)
      i += 1
    }
    out
  }

  // a NULL side contributes no gram rows in the relational form; the
  // all-zero entries here sum identically, so the expression never
  // returns null (eval, not nullSafeEval)
  override def eval(input: InternalRow): Any =
    compute(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])

  /** Row-local kernel shared by eval and the generated code — takes raw
    * (possibly null) child values so whole-stage codegen pays ONE virtual
    * call per row instead of an interpreted tree-walk with boxing.
    */
  def compute(ref: ArrayData, hyp: ArrayData): ArrayData = {
    val r = toks(ref)
    val h = toks(hyp)
    GramStatsCore.stats(maxN, grams(r, _), grams(h, _))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val ref = ctx.addReferenceObj("tokenGramStats", this)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        ArrayData ${ev.value} = $ref.compute(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenGramStatsExpr =
    copy(left = newLeft, right = newRight)
}

/** Character n-gram stats over two STRINGS (the chrF form): grams are
  * `substr(s, i, n)` windows — identical to
  * `transform(sequence(1, length(s) − n + 1), i => substr(s, i, n))`,
  * code-point-indexed like SQL substr (UTF8String.substring).
  */
case class CharGramStatsExpr(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {

  require(maxN >= 1 && maxN <= 10, s"char_gram_stats: maxN out of range: $maxN")

  override def dataType: DataType =
    ArrayType(GramStatsCore.entryType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_gram_stats requires two string columns, got $other")
    }

  private def grams(s: UTF8String, n: Int): Array[UTF8String] = {
    if (s == null) return Array.empty[UTF8String]
    val len = s.numChars()
    if (len < n) return Array.empty[UTF8String]
    val out = new Array[UTF8String](len - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = s.substring(i, i + n)
      i += 1
    }
    out
  }

  override def eval(input: InternalRow): Any =
    compute(left.eval(input).asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])

  /** Shared row-local kernel (see [[TokenGramStatsExpr.compute]]); `grams`
    * treats a null side as empty, matching the relational form's absent
    * rows.
    */
  def compute(ref: UTF8String, hyp: UTF8String): ArrayData =
    GramStatsCore.stats(maxN, grams(ref, _), grams(hyp, _))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val ref = ctx.addReferenceObj("charGramStats", this)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        ArrayData ${ev.value} = $ref.compute(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharGramStatsExpr =
    copy(left = newLeft, right = newRight)
}

object GramStatsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def tokenGramStats(ref: Column, hyp: Column, maxN: Int): Column =
    ColumnBridge.column(TokenGramStatsExpr(
      ColumnBridge.expression(ref), ColumnBridge.expression(hyp), maxN))
  def charGramStats(ref: Column, hyp: Column, maxN: Int): Column =
    ColumnBridge.column(CharGramStatsExpr(
      ColumnBridge.expression(ref), ColumnBridge.expression(hyp), maxN))
}
