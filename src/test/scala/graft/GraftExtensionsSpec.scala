package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface spec: the extension-registered functions work from spark.sql. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = Sessions
      .builder("local[4]", 4)
      .appName("extensions-spec")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    // the suite may inherit an existing session (one JVM for all suites)
    // where builder-time extensions don't apply — use the runtime path
    GraftExtensions.register(s)
    s
  }

  test("bfl functions are callable from SQL") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq(
      """{"tag":"hot","n":5,"secret":"s3cr3t"}""",
      """{"tag":"cold","n":50,"secret":"hunter2"}"""
    ).toDF("doc").createOrReplaceTempView("log")

    val matched = spark.sql(
      """SELECT doc FROM log WHERE bfl_match(doc, 'tag == "hot"')""").collect()
    assert(matched.length == 1 && matched(0).getString(0).contains("hot"))

    val evaled = spark.sql(
      """SELECT bfl_eval(doc, 'n > 10 and redact("secret")') AS out FROM log""").collect()
    val nonNull = evaled.map(_.getString(0)).filter(_ != null)
    assert(nonNull.length == 1)
    assert(nonNull(0).contains("\"secret\":\"[REDACTED]\""))

    assert(spark.sql("SELECT go_fmt(CAST(1634668524000 AS DOUBLE)) AS g")
      .collect()(0).getString(0) == "1.63467e+12")

    val sigs = spark.sql("SELECT minhash_sigs('a b c d e f', 4) AS s")
      .collect()(0).getSeq[String](0)
    assert(sigs.length == 4 && sigs.forall(_.length == 32))
  }
}
