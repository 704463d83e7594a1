package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 diversity/style batch: seasonal Mann-Kendall,
  * character entropy, MATTR, Burrows's Delta, paragraph dedup.
  */
class DiversityStyleSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("diversity-style-spec")
    .getOrCreate()

  test("seasonalMannKendall: pure weekly cycle is flat, cycle+drift is up") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 8 full weeks starting Mon 2024-01-01; dow spike every Sunday
    val rows = (0 until 56).flatMap { d =>
      val day = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d).atTime(12, 0))
      val spike = if (d % 7 == 6) 5 else 0
      val cyc = 10 + spike
      val drift = 10 + spike + (d / 7) // +1 per week, within-season monotone
      (0 until cyc).map(_ => ("cyc", day)) ++
        (0 until drift).map(_ => ("drift", day))
    }
    val out = Temporal.seasonalMannKendall(rows.toDF("event_type", "ts"),
      "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("cyc").getAs[Long]("s_stat") == 0L)
    assert(out("cyc").getAs[String]("direction") == "flat")
    // drift: every within-season pair is concordant → S = 7 · C(8,2) = 196
    assert(out("drift").getAs[Long]("s_stat") == 196L)
    assert(out("drift").getAs[String]("direction") == "up")
    assert(out("drift").getAs[Double]("z") > 3.0)
  }

  test("charEntropy: degenerate, binary, and uniform alphabets are exact") {
    import spark.implicits._
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd")).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 4L, 0.0)))
    assert(out(2L)._2 == 2L && math.abs(out(2L)._4 - 1.0) < 1e-6)
    assert(out(3L)._2 == 4L && math.abs(out(3L)._4 - 2.0) < 1e-6)
  }

  test("mattr: repetition floors at 1/w, full diversity hits 1, short docs drop") {
    import spark.implicits._
    val rep = (1 to 100).map(_ => "a").mkString(" ")
    val div = (1 to 100).map(i => s"w$i").mkString(" ")
    val short = (1 to 49).map(i => s"s$i").mkString(" ")
    val df = Seq((1L, rep), (2L, div), (3L, short)).toDF("doc_id", "text")
    val out = TextAnalysis.mattr(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 100L, 2L, 0.02)))
    assert(out(2L) == ((2L, 100L, 2L, 1.0)))
    assert(!out.contains(3L)) // no full window → no row
  }

  test("burrowsDelta: identical profiles at distance 0, deviant source apart") {
    import spark.implicits._
    val df = Seq(
      ("a", "x x x y y z"),
      ("b", "x x x y y z"),
      ("c", "z z z z y x")
    ).toDF("source", "text")
    val out = TextAnalysis.burrowsDelta(df, "source", "text")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", "b")) == 0.0)
    assert(out(("a", "c")) > 0.1 && out(("b", "c")) == out(("a", "c")))
  }

  test("paraDedup: duplicated docs count every paragraph, partials included") {
    import spark.implicits._
    val text24 = (1 to 24).map(i => s"t$i").mkString(" ")
    val text30 = (1 to 30).map(i => s"u$i").mkString(" ")
    val df = Seq(
      (1L, "s1", text24), (2L, "s1", text24), // exact pair → all paras dup
      (3L, "s2", text30)                       // unique; 12+12+6 tokens
    ).toDF("doc_id", "source", "text")
    val out = Dedup.paraDedup(df, "doc_id", "source", "text")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("s1") == (("s1", 4L, 4L, 1.0)))
    assert(out("s2") == (("s2", 3L, 0L, 0.0)))
  }
}
