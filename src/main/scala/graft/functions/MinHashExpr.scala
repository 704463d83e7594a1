package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature vector in one pass: tokenize → word n-gram shingles →
  * for each of k seeds, min over shingles of hex(md5(seed ++ ":" ++ shingle)).
  *
  * Semantically identical to the Column pipeline
  * (`split`/`transform`/`array_min` with md5, see graft.operators.Dedup) and
  * to the DuckDB oracle's `list_min(list_transform(...))`, but evaluated as a
  * tight JVM loop — interpreted higher-order Columns cost ~5µs/element with
  * no codegen or subexpression sharing, which made signatures the near-dup
  * bottleneck (2M md5 calls at sf0.1).
  */
case class MinHashSigsExpr(child: Expression, k: Int, ngram: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexDigits(b >>> 4)
      out(i * 2 + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(v: Any): Any = {
    // replicate SPARK semantics exactly (the Column pipeline + DuckDB oracle
    // both use them): trim() strips SPACES only (Java String.trim would also
    // strip tabs/newlines), split keeps trailing empty tokens (limit -1)
    val raw = v.toString
    var a = 0; var b = raw.length
    while (a < b && raw.charAt(a) == ' ') a += 1
    while (b > a && raw.charAt(b - 1) == ' ') b -= 1
    val text = raw.substring(a, b)
    val words = text.split("\\s+", -1)
    // shingles: sliding n-gram windows, or the whole token string when short
    // (matches Dedup.shingles / the oracle CASE)
    val shingles: Array[String] =
      if (words.length >= ngram)
        Array.tabulate(words.length - ngram + 1) { i =>
          val sb = new StringBuilder(words(i))
          var j = 1
          while (j < ngram) { sb += ' '; sb ++= words(i + j); j += 1 }
          sb.toString
        }
      else Array(words.mkString(" "))

    val digest = md5.get()
    val mins = new Array[UTF8String](k)
    var seed = 0
    while (seed < k) {
      val prefix = (seed.toString + ":").getBytes(StandardCharsets.UTF_8)
      var min: String = null
      var i = 0
      while (i < shingles.length) {
        digest.reset()
        digest.update(prefix)
        digest.update(shingles(i).getBytes(StandardCharsets.UTF_8))
        val h = hex(digest.digest())
        if (min == null || h.compareTo(min) < 0) min = h
        i += 1
      }
      mins(seed) = UTF8String.fromString(min)
      seed += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigsExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sigs"
}

object MinHashExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** array<string> of k signature hex minima for a text column. */
  def minhashArray(text: Column, k: Int, ngram: Int = 3): Column =
    ColumnBridge.column(MinHashSigsExpr(ColumnBridge.expression(text), k, ngram))
}
