package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Random-hyperplane LSH signature in one pass. Bit-identical to the Column
  * form in [[graft.operators.Similarity.lshSignature]] (±1 planes, per-plane
  * signed left-fold sum over double-cast floats in coordinate order, missing
  * coordinates contribute 0.0, bit p set iff dot >= 0) and to the generated
  * DuckDB oracle SQL — but evaluated as a loop over a boolean plane matrix
  * instead of a ~2000-node expression tree: the Column form's whole-stage
  * codegen alone cost seconds of Janino compile per query invocation, which
  * dominated `ann_lsh_topk`'s bench time and variance.
  */
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Boolean]])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var d = 0
      while (d < plane.length) {
        // try_element_at + 0-default semantics: out-of-range or null
        // coordinates contribute nothing
        val e = if (d < n && !arr.isNullAt(d)) arr.getFloat(d).toDouble else 0.0
        dot += (if (plane(d)) e else -e)
        d += 1
      }
      if (dot >= 0) sig |= (1L << p)
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
