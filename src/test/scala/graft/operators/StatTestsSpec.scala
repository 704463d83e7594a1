package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 statistical-test batch: multiclass MCC, one-way
  * ANOVA, Brown-Forsythe, Ljung-Box.
  */
class StatTestsSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stat-tests-spec")
    .getOrCreate()

  test("mccEval: perfect prediction 1, majority-class guesser 0") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("c", "c"))
      .toDF("y", "p")
    val rp = Classify.mccEval(perfect, "y", "p").collect()(0)
    assert(rp.getAs[Double]("mcc") == 1.0 && rp.getAs[Double]("accuracy") == 1.0)
    assert(rp.getAs[Double]("macro_f1") == 1.0)
    // 9:1 imbalance, always predict the majority: accuracy .9, MCC NULL
    // (degenerate single-prediction-class → zero denominator)
    val guess = ((1 to 9).map(_ => ("maj", "maj")) :+ (("min", "maj")))
      .toDF("y", "p")
    val rg = Classify.mccEval(guess, "y", "p").collect()(0)
    assert(rg.getAs[Double]("accuracy") == 0.9)
    assert(rg.isNullAt(rg.fieldIndex("mcc")))
    // near-degenerate: one dissenting prediction — MCC collapses toward 0
    // while accuracy stays high
    val near = ((1 to 8).map(_ => ("maj", "maj")) ++
      Seq(("min", "maj"), ("maj", "min"))).toDF("y", "p")
    val rn = Classify.mccEval(near, "y", "p").collect()(0)
    assert(rn.getAs[Double]("accuracy") == 0.8)
    assert(math.abs(rn.getAs[Double]("mcc")) < 0.2)
  }

  test("mccEval: hand-computed binary confusion matches the closed form") {
    import spark.implicits._
    // TP=4 TN=3 FP=2 FN=1 → MCC = (TP·TN−FP·FN)/sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN))
    val rows = (1 to 4).map(_ => ("pos", "pos")) ++
      (1 to 3).map(_ => ("neg", "neg")) ++
      (1 to 2).map(_ => ("neg", "pos")) ++
      Seq(("pos", "neg"))
    val r = Classify.mccEval(rows.toDF("y", "p"), "y", "p").collect()(0)
    val want = (4.0 * 3 - 2.0 * 1) / math.sqrt(6.0 * 5 * 5 * 4)
    assert(math.abs(r.getAs[Double]("mcc") - want) < 1e-6)
  }

  test("oneWay: equal group means give F 0; separated means dominate") {
    import spark.implicits._
    val same = Seq(("a", 10), ("a", 20), ("b", 10), ("b", 20)).toDF("g", "v")
    val r0 = Anova.oneWay(same, "g", "v").collect()(0)
    assert(r0.getAs[Double]("f_stat") == 0.0 && r0.getAs[Double]("eta_sq") == 0.0)
    val apart = Seq(("a", 10), ("a", 11), ("b", 100), ("b", 101)).toDF("g", "v")
    val r1 = Anova.oneWay(apart, "g", "v").collect()(0)
    assert(r1.getAs[Double]("f_stat") > 1000)
    assert(r1.getAs[Double]("eta_sq") > 0.99)
    // hand check: groups {1,2,3},{4,5,6}: SSB=13.5, SSW=4, F=(13.5/1)/(4/4)
    val hand = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6))
      .toDF("g", "v")
    val rh = Anova.oneWay(hand, "g", "v").collect()(0)
    assert(rh.getAs[Double]("ss_between") == 13.5)
    assert(rh.getAs[Double]("ss_within") == 4.0)
    assert(rh.getAs[Double]("f_stat") == 13.5 / 1.0)
  }

  test("brownForsythe: equal spreads flat, one wide group rejects") {
    import spark.implicits._
    val even = Seq(("a", 1), ("a", 3), ("b", 11), ("b", 13)).toDF("g", "v")
    val r0 = Anova.brownForsythe(even, "g", "v").collect()(0)
    // |x−med| is 1 everywhere → SSB = SSW = 0 → degenerate, F undefined
    assert(r0.isNullAt(r0.fieldIndex("f_stat")))
    assert(r0.getAs[Double]("ss_between") == 0.0)
    // three-point groups so |x−med| varies WITHIN groups too:
    // tight {100,101,102} → z {1,0,1}; wide {100,200,300} → z {100,0,100}
    val wide = (1 to 21).map(i => ("tight", 100 + (i % 3))) ++
      (1 to 21).map(i => ("wide", 100 + (i % 3) * 100))
    val r1 = Anova.brownForsythe(wide.toDF("g", "v"), "g", "v").collect()(0)
    assert(r1.getAs[Double]("f_stat") > 20)
  }

  test("friedmanTest: planted dominance rejects; full ties degenerate") {
    import spark.implicits._
    val MsPerDay = 86400000L
    // A > B > C every one of 14 days → ranks constant → chi2 = 2n = 28
    val dom = (0 until 14).flatMap { d =>
      (0 until 30).map(i => ("A", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until 20).map(i => ("B", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until 10).map(i => ("C", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val r = Temporal.friedmanTest(dom.toDF("event_type", "ts"),
      "event_type", "ts").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 14L && r.getAs[Long]("k_keys") == 3L)
    assert(r.getAs[Double]("chi2") == 28.0)
    assert(r.getAs[Boolean]("reject_95"))
    // identical counts every day: everything ties → correction hits 0
    val tied = (0 until 14).flatMap { d =>
      Seq("A", "B", "C").flatMap(k =>
        (0 until 10).map(i => (k, new java.sql.Timestamp(d * MsPerDay + i))))
    }
    val rt = Temporal.friedmanTest(tied.toDF("event_type", "ts"),
      "event_type", "ts").collect()(0)
    assert(rt.getAs[Double]("chi2") == 0.0)
    assert(rt.isNullAt(rt.fieldIndex("chi2_tied")))
  }

  test("theilDecomp: equal rows give 0; pure between-group inequality") {
    import spark.implicits._
    val flat = (1 to 10).map(i => (s"g${i % 2}", 25L)).toDF("source", "n_chars")
    val r0 = Audit.theilDecomp(flat, "source", "n_chars").collect()(0)
    assert(r0.getAs[Double]("theil_t") == 0.0)
    // 5×10 vs 5×40: within-group inequality exactly zero
    val between = ((1 to 5).map(_ => ("lo", 10L)) ++ (1 to 5).map(_ => ("hi", 40L)))
      .toDF("source", "n_chars")
    val r1 = Audit.theilDecomp(between, "source", "n_chars").collect()(0)
    val want = 0.2 * math.log(0.4) + 0.8 * math.log(1.6)
    assert(math.abs(r1.getAs[Double]("t_between") - want) < 1e-6)
    assert(math.abs(r1.getAs[Double]("t_within")) < 1e-6)
    assert(math.abs(r1.getAs[Double]("share_between") - 1.0) < 1e-4)
  }

  test("hurstExponent: trending series persistent, alternating anti-persistent") {
    import spark.implicits._
    val MsPerDay = 86400000L
    val rows = (0 until 30).flatMap { d =>
      val trend = 10 + 3 * d
      val alt = if (d % 2 == 0) 5 else 15
      (0 until trend).map(i => ("trend", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until alt).map(i => ("alt", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val out = Temporal.hurstExponent(rows.toDF("event_type", "ts"),
      "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("trend").getAs[Long]("n_sizes") == 3L)
    val hTrend = out("trend").getAs[Double]("hurst")
    val hAlt = out("alt").getAs[Double]("hurst")
    assert(hTrend > 0.8, s"trend H=$hTrend")
    assert(hAlt < 0.5, s"alt H=$hAlt")
  }

  test("kruskalWallis: shifted group rejects, identical groups accept") {
    import spark.implicits._
    // group c sits 100 higher than a/b → H large, reject
    val shifted = ((1 to 20).map(i => ("a", (i % 10) + 1L)) ++
      (1 to 20).map(i => ("b", (i % 10) + 2L)) ++
      (1 to 20).map(i => ("c", (i % 10) + 100L))).toDF("source", "n_chars")
    val r = Anova.kruskalWallis(shifted, "source", "n_chars").collect()(0)
    assert(r.getAs[Long]("n") == 60L && r.getAs[Long]("k_groups") == 3L)
    assert(r.getAs[Double]("h_tied") > 20)
    assert(r.getAs[Boolean]("reject_95"))
    // identical distributions → H ≈ 0, accept
    val same = (1 to 60).map(i => (s"g${i % 3}", (i % 10) + 1L))
      .toDF("source", "n_chars")
    val r0 = Anova.kruskalWallis(same, "source", "n_chars").collect()(0)
    assert(r0.getAs[Double]("h_tied") < 2)
    assert(!r0.getAs[Boolean]("reject_95"))
  }

  test("jarqueBera: symmetric binomial accepts, skewed squares reject") {
    import spark.implicits._
    // popcount of 0..255 = Binomial(8, .5): skew 0, excess kurtosis −.25
    val binom = (0 until 256)
      .map(i => ("sym", java.lang.Integer.bitCount(i).toDouble))
    // i² is heavily right-skewed
    val skewed = (1 to 256).map(i => ("skw", (i * i).toDouble))
    val out = Robust.jarqueBera((binom ++ skewed).toDF("event_type", "value"),
      "event_type", "value")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("sym").getAs[Double]("skewness")) < 1e-6)
    assert(!out("sym").getAs[Boolean]("reject_95"),
      s"binomial should pass: jb=${out("sym").getAs[Double]("jb")}")
    assert(out("skw").getAs[Double]("skewness") > 0.5)
    assert(out("skw").getAs[Boolean]("reject_95"))
  }

  test("mcnemarGates: symmetric disagreement accepts, one-sided rejects") {
    import spark.implicits._
    def gates(rows: Seq[(Long, Boolean, Boolean)]) = {
      val df = rows.toDF("id", "a", "b")
      Audit.mcnemarGates(df.select(col("id"), col("a")),
        df.select(col("id"), col("b")), "id", "a", "b").collect()(0)
    }
    // 10 vs 10 disagreements → chi2 tiny
    val r = gates((1L to 10L).map(i => (i, true, false)) ++
      (11L to 20L).map(i => (i, false, true)) ++
      (21L to 40L).map(i => (i, true, true)))
    assert(r.getAs[Long]("n_only_a") == 10L && r.getAs[Long]("n_only_b") == 10L)
    assert(!r.getAs[Boolean]("reject_95"))
    // 15 vs 1: gate A clearly stricter on its side
    val r1 = gates((1L to 15L).map(i => (i, true, false)) ++
      Seq((16L, false, true)) ++ (17L to 40L).map(i => (i, false, false)))
    assert(r1.getAs[Boolean]("reject_95"))
    assert(r1.getAs[Double]("chi2") > 10)
  }

  test("cochranQ: identical gates accept, one strict gate rejects") {
    import spark.implicits._
    val same = (1L to 30L).map(i => (i, i % 2 == 0, i % 2 == 0, i % 2 == 0))
      .toDF("id", "g1", "g2", "g3")
    val r0 = Audit.cochranQ(same, "id", Seq("g1", "g2", "g3")).collect()(0)
    assert(r0.getAs[Double]("q") == 0.0 && !r0.getAs[Boolean]("reject_95"))
    // g3 passes almost nothing the others pass
    val strict = (1L to 30L).map(i => (i, i % 2 == 0, i % 2 == 0, i == 2L))
      .toDF("id", "g1", "g2", "g3")
    val r1 = Audit.cochranQ(strict, "id", Seq("g1", "g2", "g3")).collect()(0)
    assert(r1.getAs[Long]("pass_g3") == 1L)
    assert(r1.getAs[Boolean]("reject_95"), s"q=${r1.getAs[Double]("q")}")
  }

  test("runsTest: alternating oscillates (+z), blocked clusters (−z)") {
    import spark.implicits._
    val MsPerDay = 86400000L
    val rows = (0 until 28).flatMap { d =>
      // alternating high/low day counts → far too many runs
      val alt = if (d % 2 == 0) 2 else 10
      // two regimes: 14 high days then 14 low → 2 runs, far too few
      val blk = if (d < 14) 10 else 2
      (0 until alt).map(i => ("alt", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until blk).map(i => ("blk", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val out = Temporal.runsTest(rows.toDF("event_type", "ts"),
      "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("alt").getAs[Long]("runs") == 28L)
    assert(out("alt").getAs[Double]("z") > 1.96)
    assert(out("alt").getAs[Boolean]("reject_95"))
    assert(out("blk").getAs[Long]("runs") == 2L)
    assert(out("blk").getAs[Double]("z") < -1.96)
    assert(out("blk").getAs[Boolean]("reject_95"))
  }

  test("bartlett: equal spreads accept, one wild group rejects") {
    import spark.implicits._
    // same 1..10 cycle in each of 3 groups → pooled = every group
    val same = (1 to 60).map(i => (s"g${i % 3}", ((i / 3) % 10 + 1).toLong))
      .toDF("source", "n_chars")
    val r0 = Anova.bartlett(same, "source", "n_chars").collect()(0)
    assert(r0.getAs[Double]("t_stat") < 1.0)
    assert(!r0.getAs[Boolean]("reject_95"))
    // group c spread ×20
    val wild = ((1 to 20).map(i => ("a", (i % 10 + 1).toLong)) ++
      (1 to 20).map(i => ("b", (i % 10 + 1).toLong)) ++
      (1 to 20).map(i => ("c", ((i % 10 + 1) * 20).toLong)))
      .toDF("source", "n_chars")
    val r1 = Anova.bartlett(wild, "source", "n_chars").collect()(0)
    assert(r1.getAs[Boolean]("reject_95"), s"t=${r1.getAs[Double]("t_stat")}")
  }

  test("welchAnova: shift under unequal variances rejects, null accepts") {
    import spark.implicits._
    // equal means, very different spreads → W small, accept
    val nullCase = ((1 to 30).map(i => ("lo", 50.0 + (i % 3) - 1)) ++
      (1 to 30).map(i => ("hi", 50.0 + ((i % 21) - 10) * 2.0)))
      .toDF("event_type", "value")
    val r0 = Anova.welchAnova(nullCase, "event_type", "value").collect()(0)
    assert(!r0.getAs[Boolean]("reject_95"),
      s"w=${r0.getAs[Double]("w_stat")}")
    // one group shifted +30 → reject despite heteroscedasticity
    val shift = ((1 to 30).map(i => ("lo", 50.0 + (i % 3) - 1)) ++
      (1 to 30).map(i => ("hi", 80.0 + ((i % 21) - 10) * 2.0)))
      .toDF("event_type", "value")
    val r1 = Anova.welchAnova(shift, "event_type", "value").collect()(0)
    assert(r1.getAs[Boolean]("reject_95"))
    assert(r1.getAs[Double]("w_stat") > 20)
  }

  test("permutationTest: constant values p=1, arm-aligned effect p≈min") {
    import spark.implicits._
    def md5Arm(salt: String, u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$u".getBytes("UTF-8"))
      Integer.parseInt(f"${d(0)}%02x", 16) % 2
    }
    // constant metric: diff_obs = 0, every replica ties → p = 1
    val const = (1L to 40L).map(u => (u, "purchase", 5.0))
      .toDF("user_id", "event_type", "value")
    val r0 = EventSeq.permutationTest(const, "user_id", "event_type",
      "value", "purchase", b = 64).collect()(0)
    assert(r0.getAs[Double]("diff_obs") == 0.0)
    assert(r0.getAs[Double]("p_value") == 1.0)
    assert(r0.getAs[Long]("b_valid") == 64L)
    // metric = f(true arm): the observed split is as extreme as any
    // relabeling can produce → p near 1/(b+1)
    val planted = (1L to 40L).map(u =>
      (u, "purchase", if (md5Arm("arm", u) == 0) 100.0 else 1.0))
      .toDF("user_id", "event_type", "value")
    val r1 = EventSeq.permutationTest(planted, "user_id", "event_type",
      "value", "purchase", b = 64).collect()(0)
    assert(math.abs(r1.getAs[Double]("diff_obs")) == 99.0)
    assert(r1.getAs[Double]("p_value") < 0.05,
      s"p=${r1.getAs[Double]("p_value")}")
  }

  test("krippAlpha: unanimous panel 1, coin-flip panel ≈ 0, inversion < 0") {
    import spark.implicits._
    val perfect = (1L to 20L).map(i => (i, i % 2 == 0, i % 2 == 0, i % 2 == 0))
      .toDF("id", "g1", "g2", "g3")
    val r1 = Audit.krippAlpha(perfect, "id", Seq("g1", "g2", "g3")).collect()(0)
    assert(r1.getAs[Double]("alpha") == 1.0)
    // three raters marking disjoint thirds: maximal systematic disagreement
    val inv = (0L until 30L).map(i => (i, i % 3 == 0, i % 3 == 1, i % 3 == 2))
      .toDF("id", "g1", "g2", "g3")
    val r2 = Audit.krippAlpha(inv, "id", Seq("g1", "g2", "g3")).collect()(0)
    assert(r2.getAs[Double]("alpha") < -0.3, r2.getAs[Double]("alpha"))
    // degenerate: everyone says true on everything → alpha undefined
    val allT = (1L to 10L).map(i => (i, true, true, true))
      .toDF("id", "g1", "g2", "g3")
    val r3 = Audit.krippAlpha(allT, "id", Seq("g1", "g2", "g3")).collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("alpha")))
  }

  test("brierDecomp: sharp forecast decomposes to pure resolution") {
    import spark.implicits._
    // perfect sharp: p=1 on positives, p=0 on negatives
    val sharp = (1L to 40L).map(i => (if (i % 4 == 0) 1.0 else 0.0, i % 4 == 0))
      .toDF("p", "y")
    val r1 = Audit.brierDecomp(sharp, "p", "y").collect()(0)
    assert(r1.getAs[Double]("brier") == 0.0)
    assert(r1.getAs[Double]("reliability") == 0.0)
    assert(math.abs(r1.getAs[Double]("resolution") -
      r1.getAs[Double]("uncertainty")) < 1e-6)
    assert(r1.getAs[Double]("uncertainty") == 0.1875) // .25·.75
    // constant base-rate forecast: zero resolution, brier = uncertainty
    val flat = (1L to 40L).map(i => (0.25, i % 4 == 0)).toDF("p", "y")
    val r2 = Audit.brierDecomp(flat, "p", "y").collect()(0)
    assert(r2.getAs[Double]("resolution") == 0.0)
    assert(math.abs(r2.getAs[Double]("brier") - 0.1875) < 1e-6)
    assert(r2.getAs[Double]("reliability") < 1e-6)
  }

  test("tukeyHsd: only the shifted group's pairs flag") {
    import spark.implicits._
    val rows = ((1 to 20).map(i => ("a", (i % 5 + 10).toLong)) ++
      (1 to 20).map(i => ("b", (i % 5 + 10).toLong)) ++
      (1 to 20).map(i => ("c", (i % 5 + 40).toLong)))
      .toDF("source", "n_chars")
    val out = Anova.tukeyHsd(rows, "source", "n_chars")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 3)
    assert(!out(("a", "b")).getAs[Boolean]("significant_95"))
    assert(out(("a", "c")).getAs[Boolean]("significant_95"))
    assert(out(("b", "c")).getAs[Boolean]("significant_95"))
    assert(out(("a", "c")).getAs[Double]("mean_diff") == -30.0)
  }

  test("mutualInfo: independent columns ≈ 0, determined column NMI = 1") {
    import spark.implicits._
    // a cycles mod 2, b cycles mod 3 over 60 rows → exactly independent
    val ind = (0 until 60).map(i => (s"a${i % 2}", s"b${i % 3}"))
      .toDF("source", "lang")
    val r0 = Audit.mutualInfo(ind, "source", "lang").collect()(0)
    assert(r0.getAs[Double]("mi_nats") == 0.0)
    // b = f(a): MI = H(b) → NMI 1
    val dep = (0 until 60).map(i => (s"a${i % 3}", s"b${i % 3}"))
      .toDF("source", "lang")
    val r1 = Audit.mutualInfo(dep, "source", "lang").collect()(0)
    assert(math.abs(r1.getAs[Double]("mi_nats") - math.log(3)) < 1e-6)
    assert(r1.getAs[Double]("nmi") == 1.0)
  }

  test("woeIv: balanced category 0, leaning categories split signs") {
    import spark.implicits._
    // cat "bal": 10/10; cat "good": 15 good 5 bad; cat "bad": 5/15
    val rows = ((1 to 20).map(i => ("bal", i % 2 == 0)) ++
      (1 to 20).map(i => ("good", i % 4 != 0)) ++
      (1 to 20).map(i => ("bad", i % 4 == 0))).toDF("source", "keep")
    val out = Audit.woeIv(rows, "source", "keep")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("good").getAs[Double]("woe") > 0.5)
    assert(out("bad").getAs[Double]("woe") < -0.5)
    assert(math.abs(out("bal").getAs[Double]("woe")) < 0.2)
    assert(out.values.map(_.getAs[Double]("iv_term")).forall(_ >= 0))
    // degenerate all-good category → NULL woe
    val degen = ((1 to 5).map(_ => ("pure", true)) ++
      (1 to 10).map(i => ("mix", i % 2 == 0))).toDF("source", "keep")
    val rd = Audit.woeIv(degen, "source", "keep")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rd("pure").isNullAt(rd("pure").fieldIndex("woe")))
  }

  test("kendallW: constant ordering W=1, shuffled ordering near 0") {
    import spark.implicits._
    val MsPerDay = 86400000L
    // A > B > C every day → perfect concordance
    val stable = (0 until 12).flatMap { d =>
      (0 until 30).map(i => ("A", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until 20).map(i => ("B", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until 10).map(i => ("C", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val r1 = Temporal.kendallW(stable.toDF("event_type", "ts"),
      "event_type", "ts").collect()(0)
    assert(r1.getAs[Double]("w") == 1.0)
    // rotate the winner daily → orderings cancel
    val rot = (0 until 12).flatMap { d =>
      Seq("A", "B", "C").zipWithIndex.flatMap { case (k, i) =>
        val n = 10 + 10 * (((i + d) % 3))
        (0 until n).map(j => (k, new java.sql.Timestamp(d * MsPerDay + j)))
      }
    }
    val r2 = Temporal.kendallW(rot.toDF("event_type", "ts"),
      "event_type", "ts").collect()(0)
    assert(r2.getAs[Double]("w") < 0.1, s"w=${r2.getAs[Double]("w")}")
  }

  test("captureRecapture: known overlap recovers the Chapman estimate") {
    import spark.implicits._
    // population of 100 true pairs: catch A sees 1..60, catch B sees 41..100
    // → m = 20, N̂ = 61·61/21 − 1 ≈ 176.2 (biased high here by DESIGN —
    // the catches are disjoint-heavy, not independent; the arithmetic is
    // what's under test)
    val a = (1 to 60).map(i => (i.toLong, (i + 1000).toLong)).toDF("id_a", "id_b")
    val b = (41 to 100).map(i => (i.toLong, (i + 1000).toLong)).toDF("id_a", "id_b")
    val r = Dedup.captureRecapture(a, b).collect()(0)
    assert(r.getAs[Long]("n_a") == 60L && r.getAs[Long]("n_b") == 60L)
    assert(r.getAs[Long]("n_both") == 20L)
    assert(math.abs(r.getAs[Double]("n_hat") - (61.0 * 61 / 21 - 1)) < 0.01)
    assert(math.abs(r.getAs[Double]("recall_a") -
      60.0 / (61.0 * 61 / 21 - 1)) < 1e-4)
    // identical catches: N̂ = n — the estimator says nothing is unseen
    val rSame = Dedup.captureRecapture(a, a).collect()(0)
    assert(math.abs(rSame.getAs[Double]("n_hat") - 60.0) < 0.01)
    assert(rSame.getAs[Double]("se") == 0.0)
  }

  test("oddsRatio: balanced arms OR ≈ 1 with CI covering 1") {
    import spark.implicits._
    // conversion independent of user id → arms statistically identical
    val rows = (1L to 400L).map(u =>
      (u, if (u % 4 == 0) "purchase" else "view"))
      .toDF("user_id", "event_type")
    val r = EventSeq.oddsRatio(rows, "user_id", "event_type", "purchase")
      .collect()(0)
    val or = r.getAs[Double]("odds_ratio")
    assert(or > 0.5 && or < 2.0, s"or=$or")
    assert(r.getAs[Double]("or_lo95") < 1.0 && r.getAs[Double]("or_hi95") > 1.0)
    assert(r.getAs[Double]("or_lo95") < or && or < r.getAs[Double]("or_hi95"))
  }

  test("dispersionTest: constant days ≈ underdispersed, bursty overdispersed") {
    import spark.implicits._
    val MsPerDay = 86400000L
    val rows = (0 until 30).flatMap { d =>
      // constant 10/day: variance 0 → dispersion 0
      val burst = if (d % 10 == 0) 100 else 1 // heavy bursts
      (0 until 10).map(i => ("flat", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until burst).map(i => ("burst", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val out = Temporal.dispersionTest(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getAs[Double]("dispersion") == 0.0)
    assert(!out("flat").getAs[Boolean]("overdispersed_95"))
    assert(out("burst").getAs[Double]("dispersion") > 10)
    assert(out("burst").getAs[Boolean]("overdispersed_95"))
  }

  test("trendTest: monotone rate rejects with direction, flat accepts") {
    import spark.implicits._
    // keep-rate rises with bucket: 10%, 50%, 90%
    val up = (0 until 300).map { i =>
      val b = i % 3
      (i.toLong, b.toLong, (i % 10) < (1 + 4 * b))
    }.toDF("id", "bucket", "keep")
    val r1 = Audit.trendTest(up, "bucket", "keep").collect()(0)
    assert(r1.getAs[Boolean]("reject_95"))
    assert(r1.getAs[String]("direction") == "increasing")
    val flat = (0 until 300).map(i => (i.toLong, (i % 3).toLong, i % 2 == 0))
      .toDF("id", "bucket", "keep")
    val r0 = Audit.trendTest(flat, "bucket", "keep").collect()(0)
    assert(!r0.getAs[Boolean]("reject_95"), s"z=${r0.getAs[Double]("z")}")
  }

  test("potTail: bounded jitter xi < 0, planted power-law bursts xi > 0") {
    import spark.implicits._
    val MsPerDay = 86400000L
    val rows = (0 until 60).flatMap { d =>
      // bounded: base 10 with excursions capped at 15 — excesses over the
      // p90 threshold (13) are {1,1,1,2,2,2}: short, bounded tail
      val b = if (d % 20 == 0) 15 else if (d % 10 == 0) 14
        else if (d % 5 == 0) 13 else 10
      // heavy: mostly 5, but every 7th day bursts DOUBLE — geometric
      // excesses, CV > 1, the power-law-ish tail MoM reads as ξ > 0
      val h = if (d % 7 == 3) 5 + (1 << (d / 7 + 1)) else 5
      (0 until b).map(i => ("bounded", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until h).map(i => ("heavy", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val out = Temporal.potTail(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect().map(r => r.getString(0) -> r).toMap
    assert(out("bounded").getAs[Double]("xi") < 0)
    assert(!out("bounded").getAs[Boolean]("heavy_tail"))
    assert(out("heavy").getAs[Double]("xi") > 0.05,
      s"xi=${out("heavy").getAs[Double]("xi")}")
    assert(out("heavy").getAs[Boolean]("heavy_tail"))
    assert(out("heavy").getAs[Double]("return_level_365") >
      out("heavy").getAs[Double]("threshold"))
  }

  test("tukeyFences: asymmetric right tail counted on the right only") {
    import spark.implicits._
    val rows = ((1 to 100).map(i => ("t", (i % 10 + 10).toDouble)) ++
      Seq(("t", 500.0), ("t", 800.0))).toDF("event_type", "value")
    val r = Robust.tukeyFences(rows, "event_type", "value").collect()(0)
    assert(r.getAs[Long]("n_high") == 2L && r.getAs[Long]("n_low") == 0L)
    assert(r.getAs[Long]("n_high_far") == 2L)
    // symmetric data: nothing outside the fences
    val sym = (1 to 100).map(i => ("s", (i % 10).toDouble))
      .toDF("event_type", "value")
    val rs = Robust.tukeyFences(sym, "event_type", "value").collect()(0)
    assert(rs.getAs[Long]("n_high") == 0L && rs.getAs[Long]("n_low") == 0L)
  }

  test("xmrChart: tight process is in-control, one spike flags its day") {
    import spark.implicits._
    val MsPerDay = 86400000L
    val rows = (0 until 30).flatMap { d =>
      // steady: 10/11 alternating — MRbar 1, limits ~10.5±2.66
      val s = 10 + (d % 2)
      // spike: same steady base but day 20 explodes to 60
      val p = if (d == 20) 60 else 10 + (d % 2)
      (0 until s).map(i => ("steady", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until p).map(i => ("spike", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val out = Temporal.xmrChart(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect().map(r => r.getString(0) -> r).toMap
    assert(out("steady").getAs[Long]("n_violations") == 0L)
    assert(out("spike").getAs[Long]("n_violations") == 1L)
    assert(out("spike").getAs[Int]("first_violation_day") == 20)
    assert(out("steady").getAs[Double]("mr_bar") == 1.0)
  }

  test("daviesBouldin: separated clusters < overlapping clusters") {
    import spark.implicits._
    val centsFar = Array((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val centsNear = Array((0L, Seq(1.0, 0.05)), (1L, Seq(1.0, -0.05)))
    def idx(cs: Array[(Long, Seq[Double])], spread: Double) =
      (0 until 20).map { i =>
        val c = i % 2
        val base = cs(c)._2
        // jitter members around their centroid
        val v = Seq((base(0) + spread * (i % 5 - 2) / 10.0).toFloat,
          (base(1) + spread * ((i / 2) % 5 - 2) / 10.0).toFloat)
        (i.toLong, v, c.toLong)
      }.toDF("vec_id", "embedding", "cluster")
    val far = Similarity.daviesBouldin(centsFar, idx(centsFar, 0.2),
      "vec_id", "embedding").collect().map(_.getAs[Double]("db_component"))
    val near = Similarity.daviesBouldin(centsNear, idx(centsNear, 0.2),
      "vec_id", "embedding").collect().map(_.getAs[Double]("db_component"))
    assert(far.max < 1.0, s"far=${far.toSeq}")
    assert(near.min > far.max, s"near=${near.toSeq} vs far=${far.toSeq}")
  }

  test("cronbachAlpha: identical items 1, independent items near 0") {
    import spark.implicits._
    val same = (1L to 30L).map(i => (i, i % 2 == 0, i % 2 == 0, i % 2 == 0))
      .toDF("id", "g1", "g2", "g3")
    val r1 = Audit.cronbachAlpha(same, "id", Seq("g1", "g2", "g3")).collect()(0)
    assert(r1.getAs[Double]("alpha") == 1.0)
    // items cycling at coprime periods → pairwise near-independent
    val ind = (0L until 210L).map(i => (i, i % 2 == 0, i % 3 == 0, i % 5 == 0))
      .toDF("id", "g1", "g2", "g3")
    val r0 = Audit.cronbachAlpha(ind, "id", Seq("g1", "g2", "g3")).collect()(0)
    assert(math.abs(r0.getAs[Double]("alpha")) < 0.15,
      s"alpha=${r0.getAs[Double]("alpha")}")
  }

  test("partialCorr: mediated correlation vanishes when z is controlled") {
    import spark.implicits._
    // x and y both driven by z: marginally correlated, partially not
    val rows = (1 to 200).map { i =>
      val z = (i % 20).toDouble
      (i.toLong, 2 * z + (i % 3) - 1, 3 * z + ((i / 3) % 3) - 1, z)
    }.toDF("id", "x", "y", "z")
    val r = Audit.partialCorr(rows, "x", "y", "z").collect()(0)
    assert(r.getAs[Double]("r_xy") > 0.9)
    assert(math.abs(r.getAs[Double]("r_xy_given_z")) < 0.15,
      s"partial=${r.getAs[Double]("r_xy_given_z")}")
  }

  test("srmCheck: md5 split passes, biased filter trips the alarm") {
    import spark.implicits._
    def md5Arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
      Integer.parseInt(f"${d(0)}%02x", 16) % 2
    }
    val all = (1L to 2000L).map(u => Tuple1(u)).toDF("user_id")
    val ok = EventSeq.srmCheck(all, "user_id").collect()(0)
    assert(!ok.getAs[Boolean]("srm_detected"),
      s"chi2=${ok.getAs[Double]("chi2")}")
    // drop 30% of ONE arm (a logging-loss bug) → SRM fires
    val biased = (1L to 2000L).filter(u => md5Arm(u) == 0 || u % 10 < 7)
      .map(u => Tuple1(u)).toDF("user_id")
    val bad = EventSeq.srmCheck(biased, "user_id").collect()(0)
    assert(bad.getAs[Boolean]("srm_detected"))
  }

  test("bayesAb: planted winner near certainty, symmetric arms near half") {
    import spark.implicits._
    def md5Arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
      Integer.parseInt(f"${d(0)}%02x", 16) % 2
    }
    // arm 0 converts at ~60%, arm 1 at ~20%
    val planted = (1L to 800L).map { u =>
      val conv = if (md5Arm(u) == 0) u % 5 < 3 else u % 5 < 1
      (u, if (conv) "purchase" else "view")
    }.toDF("user_id", "event_type")
    val r = EventSeq.bayesAb(planted, "user_id", "event_type", "purchase")
      .collect()(0)
    assert(r.getAs[Double]("p_a_beats_b") > 0.999)
    assert(r.getAs[Double]("post_mean_a") > r.getAs[Double]("post_mean_b"))
    // same conversion rule for both arms → P(A>B) near 0.5
    val sym = (1L to 800L).map(u => (u, if (u % 5 < 2) "purchase" else "view"))
      .toDF("user_id", "event_type")
    val rs = EventSeq.bayesAb(sym, "user_id", "event_type", "purchase")
      .collect()(0)
    val p = rs.getAs[Double]("p_a_beats_b")
    assert(p > 0.1 && p < 0.9, s"p=$p")
  }

  test("simpsonsCheck + postStrat: planted mix-shift paradox detected and corrected") {
    import spark.implicits._
    val MsPerDay = 86400000L
    def md5Arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
      Integer.parseInt(f"${d(0)}%02x", 16) % 2
    }
    // pick deterministic users of each true arm
    val armOf = (1L to 5000L).groupBy(md5Arm)
    val a = armOf(0).toSeq.sorted
    val b = armOf(1).toSeq.sorted
    // stratum HIGH (day 0): A-heavy, both convert often, B slightly better
    //   A: 80 users, 72 convert; B: 20 users, 19 convert
    // stratum LOW (day 3): B-heavy, both convert rarely, B slightly better
    //   A: 20 users, 2 convert;  B: 80 users, 12 convert
    def mk(users: Seq[Long], day: Int, nConv: Int) =
      users.zipWithIndex.map { case (u, i) =>
        (u, if (i < nConv) "purchase" else "view",
          new java.sql.Timestamp(day * MsPerDay + i))
      }
    val rows = mk(a.take(80), 0, 72) ++ mk(b.take(20), 0, 19) ++
      mk(a.slice(80, 100), 3, 2) ++ mk(b.slice(20, 100), 3, 12)
    val df = rows.toDF("user_id", "event_type", "ts")
    val sc = EventSeq.simpsonsCheck(df, "user_id", "event_type", "ts",
      "purchase").collect()(0)
    assert(sc.getAs[Long]("k_strata") == 2L)
    assert(sc.getAs[Long]("n_strata_pos") == 0L)
    assert(sc.getAs[Long]("n_strata_neg") == 2L)
    assert(sc.getAs[Double]("overall_diff") > 0.3)
    assert(sc.getAs[Boolean]("paradox"))
    val ps = EventSeq.postStrat(df, "user_id", "event_type", "ts",
      "purchase").collect()(0)
    assert(ps.getAs[Double]("raw_diff") > 0.3)
    assert(ps.getAs[Double]("poststrat_diff") < 0,
      s"poststrat=${ps.getAs[Double]("poststrat_diff")}")
  }

  test("seasonalStrength: weekly cycle high F_s, trending series high F_t") {
    import spark.implicits._
    val MsPerDay = 86400000L
    val rows = (0 until 42).flatMap { d =>
      val cyc = if (d % 7 < 2) 25 else 5     // hard weekly pattern
      val tr = 5 + d                          // steady growth
      (0 until cyc).map(i => ("cyc", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until tr).map(i => ("tr", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val out = Temporal.seasonalStrength(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect().map(r => r.getString(0) -> r).toMap
    assert(out("cyc").getAs[Double]("f_seasonal") > 0.8,
      s"cyc fs=${out("cyc").getAs[Double]("f_seasonal")}")
    assert(out("tr").getAs[Double]("f_trend") > 0.8,
      s"tr ft=${out("tr").getAs[Double]("f_trend")}")
    assert(out("tr").getAs[Double]("f_seasonal") <
      out("cyc").getAs[Double]("f_seasonal"))
  }

  test("prAuc: perfect ranking 1, anti-ranking below base rate, AP exact") {
    import spark.implicits._
    // 4 positives among 20; perfect score ranks them 1-4 → AP 1
    val perfect = (1 to 20).map(i => (i.toLong, 100.0 - i, i <= 4))
      .toDF("id", "s", "y")
    val r1 = Audit.prAuc(perfect, "id", "s", "y").collect()(0)
    assert(r1.getAs[Double]("pr_auc") == 1.0)
    assert(r1.getAs[Double]("base_rate") == 0.2)
    // positives forced to the BOTTOM: AP = mean of 1/17, 2/18, 3/19, 4/20
    val anti = (1 to 20).map(i => (i.toLong, 100.0 - i, i > 16))
      .toDF("id", "s", "y")
    val r0 = Audit.prAuc(anti, "id", "s", "y").collect()(0)
    val want = (1.0 / 17 + 2.0 / 18 + 3.0 / 19 + 4.0 / 20) / 4
    assert(math.abs(r0.getAs[Double]("pr_auc") - want) < 1e-6)
    assert(r0.getAs[Double]("pr_auc") < 0.2)
  }

  test("vonNeumann: smooth ramp persistent, alternation oscillating") {
    import spark.implicits._
    val MsPerDay = 86400000L
    // salt "w": its 40-day md5 draw reads z = −0.40 — inside the accept
    // band (the first salt tried drew a genuinely clumpy sequence at
    // z = −2.4, which the test CORRECTLY called persistent)
    def md5Byte(d: Int): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w:$d".getBytes("UTF-8"))
      java.lang.Byte.toUnsignedInt(h(0))
    }
    val rows = (0 until 40).flatMap { d =>
      val ramp = 5 + d / 2            // slow regime drift
      val alt = if (d % 2 == 0) 2 else 20
      val rnd = 5 + md5Byte(d) % 11   // hash-derived ≈ white noise
      (0 until ramp).map(i => ("ramp", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until alt).map(i => ("alt", new java.sql.Timestamp(d * MsPerDay + i))) ++
        (0 until rnd).map(i => ("rnd", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val out = Temporal.vonNeumann(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect().map(r => r.getString(0) -> r).toMap
    assert(out("ramp").getAs[String]("regime") == "persistent")
    assert(out("ramp").getAs[Double]("eta") < 1.0)
    assert(out("alt").getAs[String]("regime") == "oscillating")
    assert(out("alt").getAs[Double]("eta") > 3.0)
    assert(out("rnd").getAs[String]("regime") == "random",
      s"rnd eta=${out("rnd").getAs[Double]("eta")}")
  }

  test("ratioMetricAb: heavy-user variance inflates the honest SE") {
    import spark.implicits._
    def md5Arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
      Integer.parseInt(f"${d(0)}%02x", 16) % 2
    }
    // equal per-event value in both arms (ratio identical), but users
    // contribute wildly different volumes → the delta-method SE must
    // stay honest and the z must NOT reject
    val nullCase = (1L to 400L).flatMap { u =>
      val k = 1 + (u % 7).toInt // 1..7 purchases per user
      (0 until k).map(_ => (u, "purchase", 10.0))
    }.toDF("user_id", "event_type", "value")
    val r0 = EventSeq.ratioMetricAb(nullCase, "user_id", "event_type",
      "value", "purchase").collect()(0)
    assert(r0.getAs[Double]("ratio_a") == 10.0 &&
      r0.getAs[Double]("ratio_b") == 10.0)
    assert(r0.getAs[Double]("diff") == 0.0)
    // planted effect: arm 0's purchases are worth 2x
    val lift = (1L to 400L).flatMap { u =>
      val k = 1 + (u % 7).toInt
      val v = if (md5Arm(u) == 0) 20.0 else 10.0
      (0 until k).map(i => (u, "purchase", v + (i % 3) - 1))
    }.toDF("user_id", "event_type", "value")
    val r1 = EventSeq.ratioMetricAb(lift, "user_id", "event_type",
      "value", "purchase").collect()(0)
    assert(r1.getAs[Boolean]("sig_95"))
    assert(r1.getAs[Double]("diff") > 9)
  }

  test("ljungBox: white noise accepts, strong weekly cycle rejects") {
    import spark.implicits._
    val MsPerDay = 86400000L
    // cycle: counts 5,5,5,5,5,5,25 repeating — huge lag-7 autocorrelation
    val cyc = (0 until 56).flatMap { d =>
      val n = if (d % 7 == 6) 25 else 5
      (0 until n).map(i => ("cyc", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    // pseudo-noise: deterministic md5-derived counts, no lag structure
    val md = java.security.MessageDigest.getInstance("MD5")
    val noise = (0 until 56).flatMap { d =>
      val h = md.digest(s"lb:$d".getBytes("UTF-8"))(0) & 0xff
      val n = 5 + h % 13
      (0 until n).map(i => ("noise", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val out = Temporal.ljungBox((cyc ++ noise).toDF("event_type", "ts"),
      "event_type", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("cyc").getAs[Boolean]("reject_95"))
    assert(out("cyc").getAs[Long]("n_series") == 56L)
    assert(out("cyc").getAs[Double]("q_stat") >
      out("noise").getAs[Double]("q_stat"))
  }
}
