package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Cosine similarity of two float vectors in one JVM loop. Bit-identical to
  * the HOF form (`aggregate(zip_with(...))` with double casts, left-fold
  * accumulation — the order DuckDB's list_sum mirrors), but ~10x faster:
  * interpreted higher-order functions cost ~5µs/element, which dominated the
  * bucketed near-dup pair verification at sf0.1. Generates straight-line
  * Java inside whole-stage codegen (the interpreted `nullSafeEval` fallback
  * cost ~1.2µs/row of boxing/dispatch on the 1M-candidate density scans —
  * the loop below is the same arithmetic, same order, zero boxing).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case org.apache.spark.sql.types.ArrayType(FloatType | DoubleType, _) => true
      case _                                                               => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires array<float|double> operands, got " +
          s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  // per-side element accessor: each operand may independently be
  // array<float> (raw embeddings) or array<double> (e.g. k-means centroid
  // literals); lazy — child types are unresolved at construction
  @transient private lazy val getL = CosineSimExpr.accessor(left.dataType)
  @transient private lazy val getR = CosineSimExpr.accessor(right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      dot += getL(a, i) * getR(b, i)
      i += 1
    }
    // norms over each FULL vector (zip_with truncates the dot to the shorter
    // length, matching the HOF form)
    i = 0
    while (i < a.numElements()) { val x = getL(a, i); na += x * x; i += 1 }
    i = 0
    while (i < b.numElements()) { val y = getR(b, i); nb += y * y; i += 1 }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(dt: DataType, arr: String, i: String): String = dt match {
        case org.apache.spark.sql.types.ArrayType(DoubleType, _) =>
          s"$arr.getDouble($i)"
        case _ => s"(double) $arr.getFloat($i)"
      }
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += ${get(left.dataType, a, i)} * ${get(right.dataType, b, i)};
        }
        for (int $i = 0; $i < $a.numElements(); $i++) {
          double $x = ${get(left.dataType, a, i)}; $na += $x * $x;
        }
        for (int $i = 0; $i < $b.numElements(); $i++) {
          double $x = ${get(right.dataType, b, i)}; $nb += $x * $x;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

object CosineSimExpr {
  private def accessor(dt: DataType): (ArrayData, Int) => Double = dt match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case _                                                   => (a, i) => a.getFloat(i).toDouble
  }
}

object CosineExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
