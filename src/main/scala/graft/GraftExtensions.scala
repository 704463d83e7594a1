package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType

import graft.functions._

/** SparkSessionExtensions entry point: registers the BFL functions for SQL.
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`; then:
  * {{{
  *   SELECT * FROM events WHERE bfl_match(to_json(struct(*)), 'value > 100')
  *   SELECT bfl_eval(doc, 'tag == "hot" and redact("secret")') FROM log
  *   SELECT go_fmt(3.14), minhash_sigs(text, 8)
  * }}}
  *
  * This is the Spark-idiomatic analog of the reference's helpers registry
  * (reference: server/lib/eval.go:544-562).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(v, StringType) => v.toString
    case other =>
      throw new IllegalArgumentException(s"$fn: query must be a string literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("bfl_match"),
      info("bfl_match", "bfl_match(doc, query) - BFL predicate over a JSON doc"),
      (exprs: Seq[Expression]) => BflMatchExpr(exprs(0), strLit(exprs(1), "bfl_match"))
    ))
    e.injectFunction((
      FunctionIdentifier("bfl_eval"),
      info("bfl_eval", "bfl_eval(doc, query) - transformed doc when matching, else NULL"),
      (exprs: Seq[Expression]) => BflEvalExpr(exprs(0), strLit(exprs(1), "bfl_eval"))
    ))
    e.injectFunction((
      FunctionIdentifier("bfl_transform"),
      info("bfl_transform", "bfl_transform(doc, query) - record-altering helpers applied"),
      (exprs: Seq[Expression]) => BflTransformExpr(exprs(0), strLit(exprs(1), "bfl_transform"))
    ))
    e.injectFunction((
      FunctionIdentifier("go_fmt"),
      info("go_fmt", "go_fmt(d) - Go strconv %g 6-sig-digit formatting"),
      (exprs: Seq[Expression]) => GoFormatExpr(exprs(0))
    ))
    e.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs", "minhash_sigs(text, k) - k md5 minhash signature hex strings"),
      (exprs: Seq[Expression]) =>
        MinHashSigsExpr(exprs(0), exprs(1) match {
          case Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"minhash_sigs: k must be a literal")
        }, 3)
    ))
  }
}
