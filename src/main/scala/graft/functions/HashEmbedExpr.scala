package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local feature-hashed bag-of-words embedding — the [[GramStatsExpr]]
  * discipline applied to [[graft.operators.TextAnalysis.hashEmbed]]: the
  * former exploded every token of the corpus into a (doc, token) relation,
  * md5-bucketed it, and shuffled it through TWO hash aggregations
  * ((doc, bucket) counts, then per-doc map + L2 norm) whose first key
  * cardinality ≈ the token count of the corpus. All of that is a per-row
  * fold into a `dim`-wide count array; only the finished embedding leaves
  * the scan, so the downstream plan is exchange-free until the consumer's
  * own shape.
  *
  * Exactness contract (pinned by HashEmbedStatsSpec against the relational
  * form): tokens are [[MinHashCore.spaceTrimSplit]] over the
  * UTF8String-lowercased text (the pinned `split(trim(lower(text)),
  * "\\s+")` equivalent — note a non-null text always yields >= 1 token,
  * the empty string included, exactly like the explode); the bucket is
  * `parseLong(md5hex(token).substring(0, 15), 16) % dim` — bit-identical
  * to `conv(substring(md5(t), 1, 15), 16, 10) % dim` (60 bits, never
  * negative, no overflow); counts are exact longs; the norm is
  * `Math.sqrt((Σ c²).toDouble)` (one long→double cast, same as
  * `sqrt(sum(c*c).cast("double"))`); each weight rounds through
  * `BigDecimal.valueOf(c/norm).setScale(6, HALF_UP).doubleValue()` —
  * exactly Spark's `round(double, 6)`. A null text returns null (the
  * relational explode emitted no row for it; callers prefilter
  * `isNotNull` so the optimizer can never duplicate the fold around a
  * null test).
  */
case class HashEmbedExpr(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim >= 1, s"hash_embed requires dim >= 1, got $dim")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash_embed requires a string column, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Row-local kernel shared by eval and the generated code — whole-stage
    * codegen pays ONE virtual call per row instead of an interpreted
    * tree-walk with boxing. Input is non-null (null propagation is the
    * caller's: nullSafeEval / nullSafeCodeGen).
    */
  def compute(input: UTF8String): ArrayData = {
    val toks = MinHashCore.spaceTrimSplit(input.toLowerCase.toString)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      // conv(substring(md5(t),1,15),16,10) % dim: 15 hex digits = 60 bits,
      // always non-negative, so Java % == Spark pmod-free %
      val b = (java.lang.Long.parseLong(
        MinHashCore.md5Hex(toks(i)).substring(0, 15), 16) % dim).toInt
      counts(b) += 1L
      i += 1
    }
    var ss = 0L
    i = 0
    while (i < dim) { ss += counts(i) * counts(i); i += 1 }
    val norm = Math.sqrt(ss.toDouble)
    val out = new Array[Any](dim)
    i = 0
    while (i < dim) {
      // exactly Spark's Round(double, 6): HALF_UP on the shortest decimal
      // representation of the double
      out(i) = java.math.BigDecimal.valueOf(counts(i).toDouble / norm)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("hashEmbed", this)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): HashEmbedExpr =
    copy(child = newChild)
}

object HashEmbedExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def hashEmbed(text: Column, dim: Int): Column =
    ColumnBridge.column(HashEmbedExpr(ColumnBridge.expression(text), dim))
}
