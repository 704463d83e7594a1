package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash in one pass: tokenize, xxhash64 each token (same XXH64 /
  * seed 42 as Spark's `xxhash64` function, so results are bit-identical to
  * the Column pipeline in graft.operators.Dedup.simhash64), bit-vote, sign.
  *
  * The Column form runs 64 interpreted `aggregate` lambdas per row (~17M
  * lambda evals at sf0.1 → 8.7s); this loop does one hash per token.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    // Spark trim/split semantics (space-only trim, keep trailing empties),
    // matching TextAnalysis.tokens
    val raw = v.toString
    var a = 0; var b = raw.length
    while (a < b && raw.charAt(a) == ' ') a += 1
    while (b > a && raw.charAt(b - 1) == ' ') b -= 1
    val words = raw.substring(a, b).split("\\s+", -1)

    val votes = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val u = UTF8String.fromString(words(i))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64Expr =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHashExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(text)))
}
