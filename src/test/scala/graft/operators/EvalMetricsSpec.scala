package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 eval-metric batch: BLEU, NDCG, Jaro-Winkler
  * linkage, Holt linear smoothing, Simpson diversity.
  */
class EvalMetricsSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("eval-metrics-spec")
    .getOrCreate()

  // --- Jaro-Winkler expression -------------------------------------------

  test("jaroWinkler: literature values and the 0.7 boost gate") {
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.JaroWinklerExpr.similarity
    assert(math.abs(similarity("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(similarity("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // no common prefix → no boost
    assert(math.abs(similarity("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    // jaro 2/3 ≤ 0.7 → boost suppressed despite 4-char shared prefix
    assert(math.abs(similarity("abcdxxxx", "abcdyyyy") - 2.0 / 3.0) < 1e-12)
    // jaro 0.722 > 0.7 → boost applies (matches DuckDB probe)
    assert(math.abs(similarity("ab", "abcdefghijkl") - 0.7777777777777779) < 1e-12)
    assert(similarity("abc", "abc") == 1.0)
    assert(similarity("abc", "xyz") == 0.0)
    assert(similarity("a", "") == 0.0)
    // symmetry
    assert(similarity("DWAYNE", "DUANE") == similarity("DUANE", "DWAYNE"))
  }

  test("jaroWinklerPairs: last-token blocking, exact names excluded") {
    import spark.implicits._
    val df = Seq(
      "small ring", "small ring", "red ring", "small wing", "blue bolt"
    ).toDF("name")
    val out = Linkage.jaroWinklerPairs(df, "name", minSim = 0.5)
      .as[(String, String, Double, Long, Long)].collect()
    // cross-block pairs (ring vs wing vs bolt) never appear
    assert(out.forall { case (a, b, _, _, _) =>
      a.split(" ").last == b.split(" ").last })
    // identical names collapse into one dictionary row: sim 1.0 impossible
    assert(out.forall(_._3 < 1.0))
    val rr = out.find(p => p._1 == "red ring" && p._2 == "small ring")
    assert(rr.isDefined)
    val expected = graft.functions.JaroWinklerExpr.similarity("red ring", "small ring")
    assert(math.abs(rr.get._3 - math.rint(expected * 1e6) / 1e6) < 1e-9)
    assert(rr.get._4 == 1L && rr.get._5 == 2L) // carrier counts
  }

  // --- BLEU ---------------------------------------------------------------

  test("bleuEval: hand-computed clipped counts and brevity penalty") {
    import spark.implicits._
    // doc 0: k=3 drops tokens 3,6 → hyp "x y w v"; doc 2: k=5 drops "e"
    val df = Seq((0L, "x y z w v u"), (2L, "a b c d e")).toDF("doc_id", "text")
    val r = TextEval.bleuEval(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("match_1") == 8L && r.getAs[Long]("total_1") == 8L)
    assert(r.getAs[Long]("match_2") == 5L && r.getAs[Long]("total_2") == 6L)
    assert(r.getAs[Long]("match_3") == 2L && r.getAs[Long]("total_3") == 4L)
    assert(r.getAs[Long]("match_4") == 1L && r.getAs[Long]("total_4") == 2L)
    assert(r.getAs[Long]("ref_len") == 11L && r.getAs[Long]("hyp_len") == 8L)
    val bp = math.exp(1.0 - 11.0 / 8.0)
    val bleu = bp * math.exp(0.25 * (math.log(1.0) + math.log(5.0 / 6.0) +
      math.log(2.0 / 4.0) + math.log(1.0 / 2.0)))
    assert(math.abs(r.getAs[Double]("bp") - bp) < 1e-6)
    assert(math.abs(r.getAs[Double]("bleu") - bleu) < 1e-6)
  }

  test("bleuEval: zero 4-gram coverage scores 0, not NaN; BP stays 1") {
    import spark.implicits._
    // doc_id 1 → k=4; a 3-token doc loses nothing, but has no 4-grams
    val df = Seq((1L, "p q r")).toDF("doc_id", "text")
    val r = TextEval.bleuEval(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("match_3") == 1L && r.getAs[Long]("total_3") == 1L)
    assert(r.getAs[Long]("total_4") == 0L)
    assert(r.getAs[Double]("bp") == 1.0)
    assert(r.getAs[Double]("bleu") == 0.0)
  }

  test("rougeEval: recall denominates on the reference, precision on the hypothesis") {
    import spark.implicits._
    val df = Seq((0L, "x y z w v u"), (2L, "a b c d e")).toDF("doc_id", "text")
    val out = TextEval.rougeEval(df, "doc_id", "text")
      .as[(Int, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, m1, h1, r1, p1, rec1, f1) = out(1)
    assert(m1 == 8L && h1 == 8L && r1 == 11L)
    assert(p1 == 1.0 && math.abs(rec1 - 8.0 / 11.0) < 1e-6)
    val ef1 = 2.0 * 1.0 * (8.0 / 11.0) / (1.0 + 8.0 / 11.0)
    assert(math.abs(f1 - ef1) < 1e-6)
    val (_, m2, h2, r2, p2, rec2, f2) = out(2)
    assert(m2 == 5L && h2 == 6L && r2 == 9L)
    val (ep, er) = (5.0 / 6.0, 5.0 / 9.0)
    assert(math.abs(p2 - ep) < 1e-6 && math.abs(rec2 - er) < 1e-6)
    assert(math.abs(f2 - 2.0 * ep * er / (ep + er)) < 1e-6)
  }

  test("chrfEval: perfect hypothesis is capped only by missing 6-gram coverage") {
    import spark.implicits._
    // doc_id 1 → k=4; 2 tokens lose nothing; chars "abcde" has no 6-grams
    val df = Seq((1L, "abc de")).toDF("doc_id", "text")
    val rows = TextEval.chrfEval(df, "doc_id", "text")
      .as[(Int, Option[Long], Option[Long], Option[Long],
        Option[Double], Option[Double], Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 7)
    (1 to 5).foreach { n =>
      assert(rows(n)._7 == 1.0, s"F at n=$n")
      assert(rows(n)._2 == rows(n)._3 && rows(n)._3 == rows(n)._4)
    }
    assert(rows(6)._7 == 0.0 && rows(6)._3.contains(0L))
    // macro row: mean of the six F values
    assert(math.abs(rows(0)._7 - 5.0 / 6.0) < 1e-6)
    assert(rows(0)._2.isEmpty && rows(0)._5.isEmpty)
  }

  // --- Mann-Whitney ---------------------------------------------------------

  /** The operator's md5 arm for each user id, computed in one query. */
  private def armsOf(ids: Seq[Long]): Map[Long, Int] = {
    import spark.implicits._
    ids.toDF("u").select(col("u"),
      (conv(substring(md5(concat(lit("arm:"), col("u").cast("string"))), 1, 2),
        16, 10).cast("int") % 2).as("a"))
      .as[(Long, Int)].collect().toMap
  }

  test("mannWhitney: hand-computed U, ties, continuity-corrected z") {
    import spark.implicits._
    // recover the md5 arm split the operator uses, then plant 3 users per arm
    val armOf = armsOf(1L to 40L)
    val arm0 = (1L to 40L).filter(armOf(_) == 0).take(3)
    val arm1 = (1L to 40L).filter(armOf(_) == 1).take(3)
    assert(arm0.size == 3 && arm1.size == 3)
    val ts = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val rows =
      arm0.zip(Seq(1.0, 2.0, 3.0)).map { case (u, v) => (u, "purchase", v, ts) } ++
      arm1.zip(Seq(2.0, 3.0, 4.0)).map { case (u, v) => (u, "purchase", v, ts) } ++
      Seq((arm0.head, "click", 99.0, ts)) // non-conversion rows are ignored
    val df = rows.toDF("user_id", "event_type", "value", "ts")
    val r = EventSeq.mannWhitney(df, "user_id", "event_type", "value", "purchase")
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    // U = 0 + 0.5 + 1.5 = 2 (arm0 over arm1, ties half)
    assert(r.getAs[Double]("u") == 2.0)
    assert(math.abs(r.getAs[Double]("cliff_delta") - (2.0 * 2.0 / 9.0 - 1.0)) < 1e-6)
    // ties t³−t = 12; var = 0.75·(7 − 12/30) = 4.95; z = −2/sqrt(4.95)/...
    val z = (2.0 - 4.5 + 0.5) / math.sqrt(4.95)
    assert(math.abs(r.getAs[Double]("z") - math.rint(z * 1e4) / 1e4) < 1e-9)
    assert(!r.getAs[Boolean]("sig_95"))
  }

  test("mannWhitney: identical arm distributions give z 0 and cliff 0") {
    import spark.implicits._
    val armOf = armsOf(1L to 40L)
    val arm0 = (1L to 40L).filter(armOf(_) == 0).take(2)
    val arm1 = (1L to 40L).filter(armOf(_) == 1).take(2)
    val ts = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val rows = (arm0 ++ arm1).zipWithIndex.map { case (u, i) =>
      (u, "purchase", (i % 2 + 1).toDouble, ts) }
    // arm0 gets {1,2}, arm1 gets {1,2} — perfectly matched
    val df = rows.toDF("user_id", "event_type", "value", "ts")
    val r = EventSeq.mannWhitney(df, "user_id", "event_type", "value", "purchase")
      .collect()(0)
    assert(r.getAs[Double]("u") == 2.0) // n1n2/2
    assert(r.getAs[Double]("cliff_delta") == 0.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  // --- NDCG ----------------------------------------------------------------

  test("ndcgAtK: ideal-histogram IDCG and the perfect-ranking identity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha"),   // grade 2
      (2L, "alpha alpha alpha"),  // grade 1
      (3L, "beta"),               // grade 1
      (4L, "gamma delta")         // unscored
    ).toDF("doc_id", "text")
    val out = Search.ndcgAtK(docs, "doc_id", "text",
      Seq(("q", Seq("alpha", "beta"))), k = 10).collect()(0)
    assert(out.getAs[Long]("n_scored") == 3L)
    val idcg = 3.0 / (math.log(2.0) / math.log(2.0)) +
      1.0 / (math.log(3.0) / math.log(2.0)) +
      1.0 / (math.log(4.0) / math.log(2.0))
    assert(math.abs(out.getAs[Double]("idcg") - idcg) < 1e-4)
    val ndcg = out.getAs[Double]("ndcg")
    assert(ndcg > 0.0 && ndcg <= 1.0)
    assert(out.getAs[Double]("dcg") <= out.getAs[Double]("idcg") + 1e-9)

    // a single relevant doc: realized ranking IS the ideal ranking
    val one = Seq((1L, "alpha")).toDF("doc_id", "text")
    val p = Search.ndcgAtK(one, "doc_id", "text",
      Seq(("q", Seq("alpha"))), k = 10).collect()(0)
    assert(p.getAs[Double]("ndcg") == 1.0)
  }

  // --- Holt linear ---------------------------------------------------------

  test("holtLinear: exact-linear series gives zero SSE and the true slope") {
    import spark.implicits._
    // key "a": day t (0..9) has 10 + 2t events — exactly linear
    // key "b": constant 5/day
    val rows = (0 until 10).flatMap { t =>
      val day = java.sql.Timestamp.valueOf(f"2024-01-${t + 1}%02d 12:00:00")
      (0 until (10 + 2 * t)).map(_ => ("a", day)) ++
        (0 until 5).map(_ => ("b", day))
    }
    val df = rows.toDF("event_type", "ts")
    val out = Temporal.holtLinear(df, "event_type", "ts")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, daysA, levelA, trendA, fA, sseA) = out("a")
    assert(daysA == 10L)
    assert(math.abs(levelA - 28.0) < 1e-9) // y_9 = 10 + 18
    assert(math.abs(trendA - 2.0) < 1e-9)
    assert(math.abs(fA - 42.0) < 1e-9)     // 28 + 7·2
    assert(sseA == 0.0)
    val (_, _, levelB, trendB, fB, sseB) = out("b")
    assert(math.abs(levelB - 5.0) < 1e-9 && math.abs(trendB) < 1e-9)
    assert(math.abs(fB - 5.0) < 1e-9 && sseB == 0.0)
  }

  test("holtLinear: gap days fold as zeros, not skipped") {
    import spark.implicits._
    // days 1 and 3 observed, day 2 empty → series [2, 0, 2]
    val day1 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    val day3 = java.sql.Timestamp.valueOf("2024-01-03 12:00:00")
    val df = Seq(("a", day1), ("a", day1), ("a", day3), ("a", day3))
      .toDF("event_type", "ts")
    val r = Temporal.holtLinear(df, "event_type", "ts")
      .as[(String, Long, Double, Double, Double, Double)].head()
    assert(r._2 == 3L)
    // fold by hand: l2=0, b2=-2; t=3: pred=-2, l=.3*2+.7*(-2)=-0.8,
    // b=.2*(-0.8-0)+.8*(-2)=-1.76, sse=(2-(-2))^2=16
    assert(math.abs(r._3 - (-0.8)) < 1e-9)
    assert(math.abs(r._4 - (-1.76)) < 1e-9)
    assert(math.abs(r._6 - 16.0) < 1e-9)
  }

  // --- Simpson diversity ----------------------------------------------------

  test("simpsonDiversity: uniform and degenerate distributions are exact") {
    import spark.implicits._
    val df = Seq(
      ("u", "a a a b b b c c c d d d"), // 4 types × 3 → λ = 24/132
      ("one", "z z z z")                 // single type → λ = 1
    ).toDF("source", "text")
    val out = TextAnalysis.simpsonDiversity(df, "source", "text")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, vocabU, nU, pairsU, simU, invU) = out("u")
    assert(vocabU == 4L && nU == 12L && pairsU == 24L)
    assert(math.abs(simU - 24.0 / 132.0) < 1e-6) // simpson is rounded at 6 dp
    assert(math.abs(invU - 132.0 / 24.0) < 1e-9)
    val (_, vocab1, n1, pairs1, sim1, inv1) = out("one")
    assert(vocab1 == 1L && n1 == 4L && pairs1 == 12L)
    assert(sim1 == 1.0 && inv1 == 1.0)
  }
}
