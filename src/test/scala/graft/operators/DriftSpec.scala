package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DriftSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("drift-spec")
    .getOrCreate()

  test("psi: identical halves score ~0, planted length shift scores high") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // "stable": every doc identical length — both md5-halves see one
    // bucket with p=1, PSI exactly 0
    val stable = (1L to 400L)
      .map(i => (i, "src_stable", Seq.fill(20)("w").mkString(" ")))
    // "shifted": length correlates with the PSI md5-half parity itself, so
    // the two populations genuinely differ (short docs on side 0, long on
    // side 1) — PSI must clear the 0.25 "shifted" band
    val sideOf: Long => Int = i => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"psi:$i".getBytes("UTF-8"))
      ((md(0) & 0xff) % 2)
    }
    val shifted = (1001L to 1400L).map { i =>
      val len = if (sideOf(i) == 0) 20 else 300
      (i, "src_shifted", Seq.fill(len)("w").mkString(" "))
    }
    val docs = (stable ++ shifted).toDF("doc_id", "source", "text")
    val out = Drift.psiDrift(docs, "doc_id", "source", "text")
      .as[(String, Double)].collect().toMap
    assert(out("src_stable") == 0.0)
    assert(out("src_shifted") > 0.25,
      s"planted shift should exceed the 'shifted' band, got ${out("src_shifted")}")
  }
}
