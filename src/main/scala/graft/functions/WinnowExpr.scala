package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed rolling-hash document fingerprints (Schleimer et al., MOSS) in
  * ONE JVM pass — bit-identical to the Column-HOF reference form
  * ([[graft.operators.TextAnalysis.winnowFingerprintsColumns]], pinned by
  * OperatorsSpec) and to the generated DuckDB oracle, but O(tokens·(k+w)):
  * in the HOF form every window lambda references the k-gram ARRAY
  * expression, which Catalyst re-inlines per window (no CSE for
  * interpreted lambdas) — O(n²) evaluation with n md5 calls per window
  * that made text_winnow run minutes at sf0.1 on a single input split.
  *
  * Spark string semantics replicated exactly: UTF8String lowercase, trim
  * strips SPACES only, split keeps trailing empties. Token base hashes are
  * the first 15 md5 hex chars (< 2^60) mod 1e9+7; the k-step polynomial
  * takes `% M` after every multiply; short docs hash their zero-padded
  * prefix.
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k >= 1 && w >= 1, "winnow k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints requires a string column, got ${other.sql}")
    }

  private val M = 1000000007L
  private val B = 131L

  override def nullSafeEval(v: Any): Any = {
    val toks =
      MinHashCore.spaceTrimSplit(v.asInstanceOf[UTF8String].toLowerCase.toString)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      th(i) = java.lang.Long.parseLong(MinHashCore.md5Hex(toks(i)).substring(0, 15), 16) % M
      i += 1
    }
    val m = math.max(th.length - (k - 1), 1)
    val kg = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0L
      var d = 0
      while (d < k) {
        val x = if (i + d < th.length) th(i + d) else 0L
        h = (h * B + x) % M
        d += 1
      }
      kg(i) = h
      i += 1
    }
    val wins = math.max(kg.length - (w - 1), 1)
    val mins = new Array[Long](wins)
    i = 0
    while (i < wins) {
      var mn = Long.MaxValue
      var j = i
      val end = math.min(i + w, kg.length)
      while (j < end) { if (kg(j) < mn) mn = kg(j); j += 1 }
      mins(i) = mn
      i += 1
    }
    // array_distinct + array_sort ≡ distinct ascending on longs
    ArrayData.toArrayData(mins.distinct.sorted)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprintsExpr =
    copy(child = c)
  override def prettyName: String = "winnow_fingerprints"
}

object WinnowExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def fingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    ColumnBridge.column(WinnowFingerprintsExpr(ColumnBridge.expression(text), k, w))
}
