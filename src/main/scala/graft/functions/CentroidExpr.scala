package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Top-`nAssign` nearest centroids (cosine DESC, ties to the smallest
  * centroid id) of a float/double vector against a LITERAL centroid matrix,
  * in one JVM loop — the scalable form of the per-centroid
  * `greatest(struct(cosine(vec, lit(c)), -cid))` expression tree
  * ([[graft.operators.Similarity]] `centroidSims`): that tree costs ~3·C
  * Catalyst nodes and a C-ary `greatest`, which is fine at C=8 but breaks
  * analysis/codegen budgets at the C ≈ √n cell counts the auto-scaled IVF
  * build uses (C=448 at 200k vectors, C≈3·10⁵ at 10¹¹). Here the matrix is
  * ONE reference object and assignment is a C×dim loop per row.
  *
  * Arithmetic is bit-identical to [[CosineSimExpr]] (dot over the shorter
  * length, norms over each full vector, same accumulation order) and the
  * ranking to `sort_array(struct(sim, -cid)) DESC` under Spark's double
  * ordering (NaN greatest — `java.lang.Double.compare` semantics), so swapping
  * construction paths never changes an assignment.
  *
  * CodegenFallback for the same reason as [[HyperplaneSigExpr]]: the row cost
  * is the C·dim flops themselves; the interpreted-dispatch overhead is noise
  * next to them, while generating the loop inline would buy nothing.
  */
case class NearestCentroidsExpr(
    child: Expression,
    cids: Seq[Long],
    matrix: Seq[Seq[Double]],
    nAssign: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(cids.length == matrix.length && cids.length >= 1,
    "nearest_centroids: cids/matrix shape mismatch or empty")
  require(nAssign >= 1 && nAssign <= cids.length,
    "nearest_centroids: nAssign out of range")

  // Seq (not Array) constructor fields so case-class equals/hashCode are
  // structural: two semantically identical instances canonicalize together
  // (plan dedup, common-subexpression reuse) — Array fields compare by
  // reference and defeat both. The hot eval loop still runs over arrays.
  @transient private lazy val cidArr: Array[Long] = cids.toArray
  @transient private lazy val matArr: Array[Array[Double]] =
    matrix.map(_.toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_centroids requires array<float> or array<double>, got ${other.sql}")
  }

  // centroid norms don't depend on the row — precompute once
  @transient private lazy val centNorms: Array[Double] = matArr.map { cv =>
    var nb = 0.0
    var i = 0
    while (i < cv.length) { nb += cv(i) * cv(i); i += 1 }
    math.sqrt(nb)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val nElem = arr.numElements()
    // row norm over the FULL vector (CosineSimExpr contract)
    var na = 0.0
    var i = 0
    while (i < nElem) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      na += x * x
      i += 1
    }
    val rowNorm = math.sqrt(na)
    val sims = new Array[Double](matArr.length)
    var c = 0
    while (c < matArr.length) {
      val cv = matArr(c)
      val n = math.min(nElem, cv.length)
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        dot += x * cv(j)
        j += 1
      }
      sims(c) = dot / (rowNorm * centNorms(c))
      c += 1
    }
    // repeated argmax selection: sim DESC (NaN greatest, Double.compare
    // ordering — Spark's double sort order), ties to the smallest cid;
    // O(C·nAssign) with nAssign small by contract
    val out = new Array[Any](nAssign)
    val taken = new Array[Boolean](matArr.length)
    var pick = 0
    while (pick < nAssign) {
      var best = -1
      var k = 0
      while (k < matArr.length) {
        if (!taken(k)) {
          if (best < 0) best = k
          else {
            val cmp = java.lang.Double.compare(sims(k), sims(best))
            if (cmp > 0 || (cmp == 0 && cidArr(k) < cidArr(best))) best = k
          }
        }
        k += 1
      }
      taken(best) = true
      out(pick) = cidArr(best)
      pick += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidsExpr =
    copy(child = c)
  override def prettyName: String = "nearest_centroids"
}

object CentroidExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Top-`nAssign` centroid ids for `vec` (cosine DESC, ties to smallest
    * cid) as an `array<bigint>` column. `cents` as (cid, centroid) pairs —
    * the [[graft.operators.Similarity]] trained-centroid shape.
    */
  def nearestCids(vec: Column, cents: Array[(Long, Seq[Double])],
      nAssign: Int): Column =
    ColumnBridge.column(NearestCentroidsExpr(
      ColumnBridge.expression(vec),
      cents.map(_._1).toSeq,
      cents.map(_._2).toSeq,
      nAssign))
}
