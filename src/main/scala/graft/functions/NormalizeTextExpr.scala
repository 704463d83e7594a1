package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization — the first pass of every web-corpus
  * pipeline (mojibake-adjacent artifacts, zero-width joiners, stray
  * control bytes, runaway whitespace all defeat downstream dedup and
  * tokenization if they survive):
  *
  *   1. Unicode NFC (canonical composition — é as e+◌́ equals é);
  *   2. drop control characters (C0/C1 and DEL) except \n and \t;
  *   3. drop zero-width characters (ZWSP/ZWNJ/ZWJ/BOM U+200B-D, U+FEFF);
  *   4. collapse every whitespace run to one space and trim.
  *
  * One JVM pass per row (CodegenFallback, like the other per-row text
  * expressions); the equivalent Column pipeline would chain four regexes —
  * four UTF8String materializations per row — and Spark has no built-in
  * NFC at all. Mirrors DuckDB `nfc_normalize` + regexp chain exactly
  * (pinned by the `text_normalize` oracle).
  */
case class NormalizeTextExpr(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text requires a string column, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val nfc = java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      // whitespace-for-collapse is the ASCII set RE2's `\s` sees AFTER the
      // control strip ({space, \t, \n, \r}) — NOT Character.isWhitespace,
      // whose Unicode members RE2 would preserve (engine-parity first)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\r'
      val isControl = (c < 0x20 && !isWs) || c == 0x7f || (c >= 0x80 && c <= 0x9f)
      val isZeroWidth = (c >= 0x200b && c <= 0x200d) || c == 0xfeff
      if (!isControl && !isZeroWidth) {
        if (isWs) pendingSpace = started
        else {
          if (pendingSpace) { sb.append(' '); pendingSpace = false }
          sb.append(c)
          started = true
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(c: Expression): NormalizeTextExpr =
    copy(child = c)
  override def prettyName: String = "normalize_text"
}

object NormalizeTextExpr {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def normalize(text: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(text)))

  /** DuckDB mirror: NFC + control/zero-width strip + whitespace collapse.
    * `\s` in DuckDB's RE2 covers the same ASCII+Unicode space set Java's
    * `Character.isWhitespace` does for the classes that survive step 2-3;
    * both engines then trim.
    */
  def sql(textExpr: String): String =
    s"""trim(regexp_replace(
          regexp_replace(nfc_normalize($textExpr),
            '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x{0080}-\\x{009F}\\x{200B}-\\x{200D}\\x{FEFF}]', '', 'g'),
          '\\s+', ' ', 'g'))"""
}
