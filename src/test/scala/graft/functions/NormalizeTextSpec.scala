package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeTextSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("normalize-text-spec")
    .getOrCreate()

  private def norm(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(NormalizeTextExpr.normalize(col("t")).as("n"))
      .as[String].head()
  }

  test("NFC composes decomposed accents (e + combining acute = é)") {
    spark.sparkContext.setLogLevel("WARN")
    assert(norm("cafe\u0301") == "café")
  }

  test("controls and zero-width characters are dropped; CRLF collapses to one space") {
    assert(norm("ctrl\u0001\u0002x") == "ctrlx")
    assert(norm("zero\u200Bwidth\uFEFF!") == "zerowidth!")
    assert(norm("a\r\nb") == "a b")
  }

  test("whitespace runs collapse, edges trim, NBSP is preserved verbatim") {
    assert(norm("  a\t\tb \n c  ") == "a b c")
    assert(norm("nb sp") == "nb sp") // RE2 \s parity: NBSP is not \s
  }

  test("empty and all-junk inputs normalize to the empty string") {
    assert(norm("") == "")
    assert(norm(" \t\r\n​ ") == "")
  }
}
