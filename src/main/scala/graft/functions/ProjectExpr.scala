package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Rademacher (±1) random projection in one pass: `y_p = Σ_d s_pd · x_d`
  * over the seeded boolean plane matrix — the Johnson–Lindenstrauss
  * dimensionality reduction with the same plane machinery
  * [[HyperplaneSigExpr]] signs. Evaluated as a loop instead of a
  * k×dim-node expression tree (the PQ/LSH codegen lesson); the summation
  * runs in coordinate order with missing/null coordinates contributing
  * 0.0, bit-identical to the Column reference form and the generated
  * DuckDB mirror. The 1/√k variance normalization is NOT applied here —
  * callers scale (same literal in both engines) so the expression stays a
  * pure integer-signed sum of the input coordinates.
  */
case class RademacherProjectExpr(child: Expression, planes: Array[Array[Boolean]])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _                => FloatType // rejected by checkInputDataTypes
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"rademacher_project requires array<float> or array<double>, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isFloat = elemType == FloatType
    val out = new Array[Any](planes.length)
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var d = 0
      while (d < plane.length) {
        val e =
          if (d >= n || arr.isNullAt(d)) 0.0
          else if (isFloat) arr.getFloat(d).toDouble
          else arr.getDouble(d)
        dot += (if (plane(d)) e else -e)
        d += 1
      }
      out(p) = dot
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): RademacherProjectExpr =
    copy(child = c)
  override def prettyName: String = "rademacher_project"
}

object ProjectExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def project(vec: Column, planes: Array[Array[Boolean]]): Column =
    ColumnBridge.column(RademacherProjectExpr(ColumnBridge.expression(vec), planes))
}
