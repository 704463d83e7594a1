package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH signature in one pass. Bit-identical to the Column
  * form in [[graft.operators.Similarity.lshSignatureColumns]] (±1 planes,
  * per-plane signed left-fold sum over double-cast elements in coordinate
  * order, missing/null coordinates contribute 0.0, bit p set iff dot >= 0)
  * and to the generated DuckDB oracle SQL — but evaluated as a loop over a
  * boolean plane matrix instead of a ~2000-node expression tree: the Column
  * form's whole-stage codegen alone cost seconds of Janino compile per
  * query invocation, which dominated `ann_lsh_topk`'s bench time and
  * variance.
  *
  * Null-vector rows produce the ALL-BITS-SET signature (every dot is the
  * empty sum 0.0, and 0.0 >= 0), exactly like the Column form's
  * coalesce-to-0.0 terms and the oracle's COALESCE — NOT the usual
  * null-propagation, hence the custom [[eval]].
  */
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Boolean]])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // lazy: child may be an unresolved attribute at construction time
  @transient private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _                => FloatType // rejected by checkInputDataTypes
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig requires array<float> or array<double>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val arr = if (v == null) null else v.asInstanceOf[ArrayData]
    val n = if (arr == null) 0 else arr.numElements()
    val isFloat = elemType == FloatType
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var d = 0
      while (d < plane.length) {
        // try_element_at + 0-default semantics: out-of-range or null
        // coordinates contribute nothing
        val e =
          if (d >= n || arr.isNullAt(d)) 0.0
          else if (isFloat) arr.getFloat(d).toDouble
          else arr.getDouble(d)
        dot += (if (plane(d)) e else -e)
        d += 1
      }
      // !(dot < 0), NOT (dot >= 0): a NaN dot (NaN coordinate in the data)
      // must set the bit, because the pinned-equivalent Column form compares
      // under Spark SQL ordering where NaN is the LARGEST double — the JVM's
      // IEEE `NaN >= 0` is false and would silently break the equivalence
      if (!(dot < 0)) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSigExpr =
    copy(child = c)
  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def signature(vec: Column, planes: Array[Array[Boolean]]): Column =
    ColumnBridge.column(HyperplaneSigExpr(ColumnBridge.expression(vec), planes))
}
