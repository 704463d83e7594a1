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
    val words = MinHashCore.spaceTrimSplit(v.toString)
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

/** 64-bit SimHash with md5-derived token hashes, as a 16-char lowercase hex
  * string. Token hash = first 64 bits of md5(token), i.e. exactly DuckDB's
  * `CAST('0x'||substr(md5(w),1,16) AS UBIGINT)` — md5 is the only hash both
  * engines share, which makes this variant oracle-checkable (xxhash64 is
  * Spark-specific). Hex-string output sidesteps signed/unsigned divergence:
  * both engines print the same 64-bit pattern.
  */
case class SimHashMd5Expr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(v: Any): Any = {
    val words = MinHashCore.spaceTrimSplit(v.toString)
    val votes = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      // first 16 hex chars of md5 == high 8 bytes, parsed as unsigned 64-bit
      val h = java.lang.Long.parseUnsignedLong(
        MinHashCore.md5Hex(words(i)).substring(0, 16), 16)
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
    val hx = java.lang.Long.toHexString(sig)
    UTF8String.fromString("0" * (16 - hx.length) + hx)
  }

  override protected def withNewChildInternal(c: Expression): SimHashMd5Expr =
    copy(child = c)
  override def prettyName: String = "simhash_md5"
}

object SimHashExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(text)))
  def simhashMd5Hex(text: Column): Column =
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(text)))
}
