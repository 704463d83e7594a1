package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All product-quantization subspace codes in ONE pass over the vector.
  *
  * The Column form (`greatest` over 16 per-codeword structs × 8 subspaces,
  * each a fold of 8 squared-diff terms) expands to ~3k expression nodes
  * that re-read every element 16 times — it benched pq_build at ~9 s where
  * this one-pass loop runs the identical arithmetic (float→double cast,
  * left-fold accumulation, max-sim/min-code tie-break) in microseconds per
  * row. Bit-identical to [[graft.operators.Similarity.pqEncode]]'s pinned
  * Column reference — the same expansion pathology (and fix) as
  * [[MinHashSigsExpr]] and [[ShinglesExpr]].
  *
  * `books(m)(c)` is subspace m's codeword c; codes are the row indices of
  * the nearest codeword by squared L2, ties to the smallest code.
  */
case class PqCodesExpr(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes requires array<float|double>, got ${other.sql}")
    }

  @transient private lazy val bk: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val getE: (ArrayData, Int) => Double =
    child.dataType match {
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case _                        => (a, i) => a.getFloat(i).toDouble
    }

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val numSub = bk.length
    val subDim = bk(0)(0).length
    val out = new Array[Any](numSub)
    var m = 0
    while (m < numSub) {
      val book = bk(m)
      var bestSim = Double.NegativeInfinity
      var bestC = 0
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val x = getE(vec, m * subDim + d) - cw(d)
          // identical fold order to the Column form: acc = acc + (x*x)
          acc = acc + x * x
          d += 1
        }
        val sim = -acc
        if (sim > bestSim) { bestSim = sim; bestC = c }
        c += 1
      }
      out(m) = bestC.toLong
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqCodesExpr =
    copy(child = c)
  override def prettyName: String = "pq_codes"
}

object PqExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** array<long> of every subspace's code for a vector column. Requires
    * codeword ids 0..k-1 in order (the [[graft.operators.Similarity]]
    * codebooks satisfy this by construction). */
  def codes(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqCodesExpr(ColumnBridge.expression(vec), books))
}
