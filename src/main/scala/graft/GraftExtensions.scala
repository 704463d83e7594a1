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
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder
      ))
    }
}

object GraftExtensions {

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(v, StringType) => v.toString
    case other =>
      throw new IllegalArgumentException(s"$fn: query must be a string literal, got $other")
  }

  val definitions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bfl_match" -> ((exprs: Seq[Expression]) =>
      BflMatchExpr(exprs(0), strLit(exprs(1), "bfl_match"))),
    "bfl_eval" -> ((exprs: Seq[Expression]) =>
      BflEvalExpr(exprs(0), strLit(exprs(1), "bfl_eval"))),
    "bfl_transform" -> ((exprs: Seq[Expression]) =>
      BflTransformExpr(exprs(0), strLit(exprs(1), "bfl_transform"))),
    "go_fmt" -> ((exprs: Seq[Expression]) => GoFormatExpr(exprs(0))),
    "minhash_sigs" -> ((exprs: Seq[Expression]) =>
      MinHashSigsExpr(exprs(0), exprs(1) match {
        case Literal(v, _) => v.toString.toInt
        case _ => throw new IllegalArgumentException("minhash_sigs: k must be a literal")
      }, 3))
  )

  /** Register on an ALREADY-RUNNING session (builder-time extensions only
    * apply to newly created sessions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    definitions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
