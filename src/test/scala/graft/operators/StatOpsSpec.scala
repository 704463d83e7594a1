package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatOpsSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stat-ops-spec")
    .getOrCreate()

  test("spearman: monotone pairs hit +1, reversed pairs hit -1") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq((1, 10), (2, 20), (3, 25), (4, 90), (5, 91)).toDF("a", "b")
    val up = Correlation.spearman(df, col("a"), col("b"))
      .as[(Long, Option[Double])].head()
    assert(up == ((5L, Some(1.0))))
    val down = Correlation.spearman(df, col("a"), -col("b"))
      .as[(Long, Option[Double])].head()
    assert(down == ((5L, Some(-1.0))))
  }

  test("spearman: constant signal yields NULL, ties use average ranks") {
    import spark.implicits._
    val const = Seq((1, 7), (2, 7), (3, 7)).toDF("a", "b")
    assert(Correlation.spearman(const, col("a"), col("b"))
      .as[(Long, Option[Double])].head()._2.isEmpty)
    // x = 1,2,3,4 ; y = 1,1,2,2 — textbook average-rank Spearman ≈ 0.8944
    val tied = Seq((1, 1), (2, 1), (3, 2), (4, 2)).toDF("a", "b")
    val rho = Correlation.spearman(tied, col("a"), col("b"))
      .as[(Long, Option[Double])].head()._2.get
    assert(math.abs(rho - 0.894427) < 1e-4, s"rho $rho")
  }

  test("wilsonCi: interval brackets p_hat, stays in [0,1], narrows with n") {
    import spark.implicits._
    val df = (1 to 100).map(i => ("big", i <= 90)) ++
      (1 to 10).map(i => ("small", i <= 9))
    val out = Audit.wilsonCi(df.toDF("g", "ok"), "g", col("ok"))
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    for ((_, (_, n, k, p, lo, hi)) <- out) {
      assert(lo >= 0.0 && hi <= 1.0 && lo < p && p < hi)
      assert(p == k.toDouble / n)
    }
    // same p_hat = 0.9 but n=100 vs n=10: the big group's interval is tighter
    val width = (g: String) => out(g)._6 - out(g)._5
    assert(width("big") < width("small"))
  }

  test("jackknifeSource: influences offset each other; dropping the heavy source moves the mean down") {
    import spark.implicits._
    val df = Seq(("a", 100L), ("a", 110L), ("b", 10L), ("b", 20L)).toDF("s", "v")
    val out = Audit.jackknifeSource(df, "s", col("v"))
      .as[(String, Long, Double, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a")._4.get == 15.0)   // LOO mean without the heavy source
    assert(out("b")._4.get == 105.0)
    assert(out("a")._5.get > 0 && out("b")._5.get < 0) // pulls up vs down
  }

  test("rboOverlap: identical rankings score 1, disjoint rankings score 0") {
    import spark.implicits._
    val df = (1 to 60).map(i => (i.toLong, i, i)).toDF("id", "a", "b")
    val same = Correlation.rboOverlap(df, "id", col("a"), col("b"), depth = 20)
      .as[(Int, Long, Double)].head()
    assert(same._1 == 20 && same._2 == 20L)
    // truncated RBO of identical lists = (1-p)·Σ p^(d-1) = 1 - p^D
    assert(math.abs(same._3 - (1 - math.pow(0.9, 20))) < 1e-5, s"rbo ${same._3}")
    // a rises with id, b falls: top-20 sets are disjoint over 60 docs
    val opp = Correlation.rboOverlap(df, "id", col("a"), -col("b"), depth = 20)
      .as[(Int, Option[Long], Option[Double])].head()
    assert(opp._2.isEmpty && opp._3.isEmpty) // zero overlap at every depth
  }

  test("hillTail: a heavier tail yields a smaller alpha") {
    import spark.implicits._
    // heavy: word w_i repeated ~1000/i times (zipf-ish); light: near-flat
    def corpus(f: Int => Int): String =
      (1 to 12).flatMap(i => Seq.fill(f(i))(s"w$i")).mkString(" ")
    val df = Seq(
      ("heavy", corpus(i => 1000 / i)),
      ("light", corpus(i => 100 - i))).toDF("source", "text")
    val out = TextAnalysis.hillTail(df, "source", "text", k = 8)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3.get).toMap
    assert(out("heavy") < out("light"),
      s"heavy ${out("heavy")} should be < light ${out("light")}")
  }

  test("epochPlanner: weights sum to 1 and epochs reflect the budget") {
    import spark.implicits._
    val df = Seq(("a", "x " * 99 + "x"), ("b", "y")).toDF("source", "text")
    val out = Sampling.epochPlanner(df, "source", "text", budgetTokens = 1000L)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(math.abs(out.values.map(_._4).sum - 1.0) < 1e-5)
    // a: 100 tokens, b: 1 → weights 10/11, 1/11; epochs = alloc/available
    assert(math.abs(out("a")._4 - 10.0 / 11) < 1e-4)
    assert(math.abs(out("a")._6 - (1000.0 * 10 / 11 / 100)) < 1e-2)
    assert(out("b")._6 > 80) // tiny source repeats wildly — the flag
  }

  test("heapsLaw: growing vocabulary fits beta near 1; saturated vocabulary fits near 0") {
    import spark.implicits._
    // each doc introduces 2 brand-new words: V(n) = n exactly, beta = 1
    val growing = (1 to 40)
      .map(i => (i.toLong, s"w${2 * i} w${2 * i + 1}")).toDF("doc_id", "text")
    val g = TextAnalysis.heapsLaw(growing, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(g._1 == 40 && g._2 == 80 && g._3 == 80)
    assert(math.abs(g._4 - 1.0) < 1e-6, s"beta ${g._4}")
    // one word repeated: V saturates at 1 after doc 1, beta ≈ 0
    val flat = (1 to 40).map(i => (i.toLong, "same same same")).toDF("doc_id", "text")
    val f = TextAnalysis.heapsLaw(flat, "doc_id", "text")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(f._3 == 1 && math.abs(f._4) < 0.01, s"beta ${f._4}")
  }
}
