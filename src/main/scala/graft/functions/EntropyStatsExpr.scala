package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local per-document entropy statistics — the [[GramStatsExpr]]
  * discipline applied to the entropy gates: the former plans exploded
  * every character/token of the corpus into a (doc, item) relation,
  * shuffled it into a per-(doc, item) count aggregate (key cardinality ≈
  * row count — no map-side combining to speak of) and then folded the
  * rounded-DECIMAL entropy terms per doc. All of that is a per-row bag
  * count; only one small struct per document needs to reach the plan.
  *
  * Exactness contract (pinned by EntropyStatsSpec against the relational
  * forms): counts from a hash map keyed on the item's UTF8String (byte
  * equality — the groupBy equality); each term computes the IDENTICAL
  * double arithmetic as the Column form (`cast long→double`, `Math.log`,
  * one multiply/divide in the same order), rounds through
  * `BigDecimal.valueOf(d).setScale(scale, HALF_UP)` (exactly Spark's
  * `round(double, scale)`), and accumulates as exact BigDecimal — the
  * same order-free decimal sum the relational aggregate produced. The
  * DuckDB oracles keep the relational spelling, so every board hash
  * doubles as an equivalence proof.
  */
private[graft] object EntropyStatsCore {

  /** Σ over bag counts of round(term(c), scale), as an exact BigDecimal. */
  def roundedTermSum(counts: java.util.Collection[Integer], scale: Int,
      term: Long => Double): java.math.BigDecimal = {
    // seed at the target scale: an empty bag must still produce a
    // scale-4/9 decimal (UnsafeRow writers require the declared scale)
    var acc = java.math.BigDecimal.ZERO.setScale(scale)
    val it = counts.iterator()
    while (it.hasNext) {
      val t = term(it.next().longValue())
      // exactly Spark's Round(double, scale): HALF_UP on the shortest
      // decimal representation of the double
      acc = acc.add(java.math.BigDecimal.valueOf(t)
        .setScale(scale, java.math.RoundingMode.HALF_UP))
    }
    acc
  }

  def bag[T](items: Array[T]): java.util.HashMap[T, Integer] = {
    val m = new java.util.HashMap[T, Integer](items.length * 2)
    var i = 0
    while (i < items.length) {
      val prev = m.get(items(i))
      m.put(items(i), if (prev == null) 1 else prev + 1)
      i += 1
    }
    m
  }

  def decimal(v: java.math.BigDecimal): org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(v))
}

/** Per-doc token entropy inputs: (n_tokens, Σ round(tf·ln tf, 4)) over the
  * whitespace tokens of `lower(text)` — the relation
  * `explode(tokens(lower(text))) → groupBy(doc, t) → count` folded to one
  * struct per row. Tokenization is [[MinHashCore.spaceTrimSplit]], the
  * pinned equivalent of `split(trim(lower(text)), "\\s+")`.
  */
case class TokenEntropyStatsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", DecimalType(38, 4), nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_entropy_stats requires a string column, got ${other.sql}")
    }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  /** Row-local kernel shared by eval and the generated code — whole-stage
    * codegen pays ONE virtual call per row instead of an interpreted
    * tree-walk with boxing. A null text folds like the relational form's
    * absent rows (empty bag).
    */
  def compute(v: UTF8String): InternalRow = {
    val toks =
      if (v == null) Array.empty[String]
      else MinHashCore.spaceTrimSplit(v.toLowerCase.toString)
    val bag = EntropyStatsCore.bag(toks)
    var n = 0L
    val it = bag.values().iterator()
    while (it.hasNext) n += it.next().longValue()
    val s = EntropyStatsCore.roundedTermSum(bag.values(), 4,
      c => c.toDouble * Math.log(c.toDouble))
    InternalRow(n, EntropyStatsCore.decimal(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("tokenEntropyStats", this)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = $ref.compute(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenEntropyStatsExpr =
    copy(child = newChild)
}

/** Per-doc character entropy inputs: (charset, n_chars,
  * Σ round((c/n)·ln(c/n), 9)) over the characters `regexp_extract_all(text,
  * '.')` yields — i.e. every code point EXCEPT Java regex line terminators
  * (\n, \r, U+0085, U+2028, U+2029), which '.' never matches.
  */
case class CharEntropyStatsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("charset", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("s", DecimalType(38, 9), nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy_stats requires a string column, got ${other.sql}")
    }

  private def isLineTerminator(cp: Int): Boolean =
    cp == '\n' || cp == '\r' || cp == 0x85 || cp == 0x2028 || cp == 0x2029

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  /** Row-local kernel shared by eval and the generated code (see
    * [[TokenEntropyStatsExpr.compute]]).
    */
  def compute(v: UTF8String): InternalRow = {
    val s = if (v == null) "" else v.toString
    // code-point bag, '.'-matchable chars only
    val bag = new java.util.HashMap[Integer, Integer]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!isLineTerminator(cp)) {
        val prev = bag.get(cp)
        bag.put(cp, if (prev == null) 1 else prev + 1)
        n += 1
      }
      i += Character.charCount(cp)
    }
    val nd = n.toDouble
    val sum = EntropyStatsCore.roundedTermSum(bag.values(), 9,
      c => (c.toDouble / nd) * Math.log(c.toDouble / nd))
    InternalRow(bag.size().toLong, n, EntropyStatsCore.decimal(sum))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("charEntropyStats", this)
    ev.copy(
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = $ref.compute(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyStatsExpr =
    copy(child = newChild)
}

object EntropyStatsExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def tokenEntropyStats(text: Column): Column =
    ColumnBridge.column(TokenEntropyStatsExpr(ColumnBridge.expression(text)))
  def charEntropyStats(text: Column): Column =
    ColumnBridge.column(CharEntropyStatsExpr(ColumnBridge.expression(text)))
}
