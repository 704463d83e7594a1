package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 session-5 operators: daily gap fill, pivot/melt, embedding
  * hygiene.
  */
class TemporalReshapeSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("temporal-reshape-spec")
    .getOrCreate()

  // ------------------------------------------------------------- gap fill

  test("gap fill: missing days appear, carry the last value, and are flagged") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 5.0),
      (1L, "2024-01-01 11:00:00", 7.0), // day 1 total 12
      (1L, "2024-01-04 09:00:00", 3.0), // days 2-3 missing
      (2L, "2024-01-02 08:00:00", 1.0)  // single-day key: no gaps
    ).toDF("user_id", "s", "value")
      .select($"user_id", to_timestamp($"s").as("ts"), $"value")
    val out = Temporal.gapFill(ev, "user_id", "ts", "value")
      .select($"user_id", $"day", $"v_fill", $"filled")
      .as[(Long, String, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01", 12.0, false),
      (1L, "2024-01-02", 12.0, true),
      (1L, "2024-01-03", 12.0, true),
      (1L, "2024-01-04", 3.0, false),
      (2L, "2024-01-02", 1.0, false)
    ))
  }

  test("ewma: hand-computed fold, empty days as zeros, spike trips the gate") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // key "a": days 0..3 counts 2, 0(empty), 2, 20 — EWMA(α=0.3) over the
    // first 3 days: s0=2, s1=.3*0+.7*2=1.4, s2=.3*2+.7*1.4=1.58;
    // resid = 20−1.58 = 18.42 > 3·sqrt(2.58) → anomaly
    // key "b": flat 1/day, last day 1 → resid small, no anomaly
    val rows =
      Seq.fill(2)(("a", "2024-01-01 10:00:00")) ++
      Seq.fill(2)(("a", "2024-01-03 10:00:00")) ++
      Seq.fill(20)(("a", "2024-01-04 10:00:00")) ++
      (1 to 4).map(d => ("b", f"2024-01-0$d 10:00:00"))
    val ev = rows.toDF("k", "s").select($"k", to_timestamp($"s").as("ts"))
    val out = Temporal.ewmaDaily(ev, "k", "ts")
      .select($"k", $"days", $"c_last", $"level_prev", $"resid", $"anomaly")
      .as[(String, Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(out.length == 2)
    val a = out.head
    assert(a == (("a", 4L, 20L, 1.58, 18.42, true)), s"$a")
    val b = out(1)
    assert(b._1 == "b" && b._3 == 1L && !b._6, s"$b")
  }

  test("gap fill on fixture events: grid is complete and per-key contiguous") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val out = Temporal.gapFill(ev, "user_id", "ts", "value").cache()
    try {
      // every key's row count equals its inclusive day span
      val spans = out.groupBy("user_id")
        .agg(count(lit(1)).as("rows"),
          datediff(max(to_date(col("day"))), min(to_date(col("day")))).as("span"))
      assert(spans.where(col("rows") =!= col("span") + 1).count() == 0)
      assert(out.where(col("v_fill").isNull).count() == 0)
    } finally out.unpersist()
  }

  // -------------------------------------------------- trend / seasonality

  test("daily trend: planted growth is positive, flat stream is zero, empty days count") {
    import spark.implicits._
    // key g: counts 1,2,3,4 over 4 days (slope 1.0); key f: 2/day (slope 0)
    // key s: active on days 1 and 4 only — empty middle days must count as
    // zeros (slope from {5,0,0,5} is 0, NOT the slope of {5,5})
    val rows =
      (1 to 4).flatMap(d => (1 to d).map(i => ("g", s"2024-02-0$d 0${i}:00:00"))) ++
      (1 to 4).flatMap(d => Seq(1, 2).map(i => ("f", s"2024-02-0$d 0${i}:00:00"))) ++
      Seq("2024-02-01", "2024-02-04").flatMap(d => (1 to 5).map(i => ("s", s"$d 0$i:00:00")))
    val df = rows.toDF("k", "t").select($"k", to_timestamp($"t").as("ts"))
    val out = Temporal.dailyTrend(df, "k", "ts")
      .select("k", "slope_per_day").as[(String, Double)].collect().toMap
    assert(out("g") == 1.0, s"planted unit growth: $out")
    assert(out("f") == 0.0, s"flat stream: $out")
    assert(out("s") == 0.0, s"symmetric gaps must cancel: $out")
  }

  test("CUSUM changepoint: planted level shift found; gap endpoint wins when extremal") {
    import spark.implicits._
    // key u: 1/day for days 1-10 then 5/day for 11-20 — mean 3/day, CUSUM
    // most extreme (-20) at day 10, the boundary before the shift
    val u = (1 to 10).map(d => ("u", d, 1)) ++ (11 to 20).map(d => ("u", d, 5))
    // key g: 2 events on day 1, 38 on day 20 — CUSUM declines through the
    // gap to -36 on day 19, the day BEFORE the next active day: the gap
    // ENDPOINT is the argmax even though no event happened there
    val g = Seq(("g", 1, 2), ("g", 20, 38))
    val rows = (u ++ g).flatMap { case (k, d, n) =>
      (1 to n).map(i => (k, f"2024-03-$d%02d ${i % 24}%02d:30:00"))
    }
    val df = rows.toDF("k", "t").select($"k", to_timestamp($"t").as("ts"))
    val out = Temporal.changepoint(df, "k", "ts")
      .select("k", "cp_day", "cusum", "direction")
      .as[(String, String, Double, String)].collect()
      .map { case (k, d, v, dir) => k -> ((d, v, dir)) }.toMap
    assert(out("u") == (("2024-03-10", -20.0, "down")), s"got ${out("u")}")
    assert(out("g") == (("2024-03-19", -36.0, "down")), s"got ${out("g")}")
  }

  test("CUSUM changepoint: a LEADING gap's excursion is evaluated (late-start key)") {
    import spark.implicits._
    // key "l" is active ONLY on the last day of the span (day 10, 20
    // events); key "e" anchors the span from day 1. For "l": mean μ = 2,
    // CUSUM declines by μ per empty day, bottoming at −μ·9 = −18 on day 9
    // — the day BEFORE its first activity. Pre-fix the leading gap was
    // never evaluated and "l" reported cusum 2 at day 10.
    val rows =
      (1 to 10).map(d => ("e", f"2024-03-$d%02d 01:30:00")) ++
      (1 to 20).map(i => ("l", f"2024-03-10 ${i % 24}%02d:30:00"))
    val df = rows.toDF("k", "t").select($"k", to_timestamp($"t").as("ts"))
    val out = Temporal.changepoint(df, "k", "ts")
      .select("k", "cp_day", "cusum", "direction")
      .as[(String, String, Double, String)].collect()
      .map { case (k, d, v, dir) => k -> ((d, v, dir)) }.toMap
    assert(out("l") == (("2024-03-09", -18.0, "down")), s"got ${out("l")}")
  }

  test("gap quantiles: same-user consecutive gaps, attributed to the later event") {
    import spark.implicits._
    // u1: a at 0s, b at 10s, a at 40s → gaps 10 (type b), 30 (type a);
    // u2: b at 0s, b at 5s → gap 5 (type b). First events yield no gap.
    val rows = Seq(
      (1L, 1L, 0L, "a"), (2L, 1L, 10L, "b"), (3L, 1L, 40L, "a"),
      (4L, 2L, 0L, "b"), (5L, 2L, 5L, "b"))
    val df = rows.toDF("event_id", "user_id", "t", "event_type")
      .select($"event_id", $"user_id", timestamp_seconds($"t").as("ts"), $"event_type")
    val out = Temporal.gapQuantiles(df, "event_type", "user_id", "ts", "event_id")
      .select("event_type", "n_gaps", "p50_s")
      .as[(String, Long, Double)].collect()
      .map { case (t, n, p) => t -> ((n, p)) }.toMap
    assert(out == Map("a" -> ((1L, 30.0)), "b" -> ((2L, 7.5))), s"got $out")
  }

  test("Theil-Sen: one spike day bends OLS but not the median of slopes") {
    import spark.implicits._
    // 10/day for 29 days, then a 300-event spike on day 30
    val rows = (1 to 30).flatMap { d =>
      val n = if (d == 30) 300 else 10
      (1 to n).map(i => ("r", f"2024-03-$d%02d ${i % 24}%02d:30:00"))
    }
    val df = rows.toDF("k", "t").select($"k", to_timestamp($"t").as("ts"))
    val ts = Temporal.theilSenTrend(df, "k", "ts")
      .select("ts_slope").as[Double].collect().head
    val ols = Temporal.dailyTrend(df, "k", "ts")
      .select("slope_per_day").as[Double].collect().head
    assert(ts == 0.0, s"median of slopes must ignore the spike: $ts")
    assert(ols > 1.0, s"OLS must be bent by the same spike: $ols")
  }

  test("seasonal residuals: weekly quiet days never alarm; a silent busy day does") {
    import spark.implicits._
    // 4 weeks from Mon 2024-03-04: 10 events every Mon-Sat, ZERO every
    // Sunday (expected for Sundays is 0 → no alarm), and one silent
    // Tuesday (2024-03-19) on an otherwise-busy weekday
    val days = (0 until 28).map(i => java.time.LocalDate.of(2024, 3, 4).plusDays(i))
    val rows = days.flatMap { d =>
      val isSunday = d.getDayOfWeek == java.time.DayOfWeek.SUNDAY
      val silent = d.toString == "2024-03-19"
      if (isSunday || silent) Seq.empty
      else (1 to 10).map(h => ("k", f"$d ${h}%02d:00:00"))
    }
    val df = rows.toDF("k", "t").select($"k", to_timestamp($"t").as("ts"))
    val out = Temporal.seasonalResiduals(df, "k", "ts", zThresh = 2.5)
      .select("day", "n", "z").as[(String, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq("2024-03-19"), s"only the silent Tuesday alarms: $out")
    assert(out.head._2 == 0L && out.head._3 < -2.5)
  }

  test("dow profile: portable day-of-week and shares summing to one") {
    import spark.implicits._
    // 1970-01-04 was a Sunday: (3 + 4) % 7 = 0
    val df = Seq(("k", "1970-01-04 10:00:00"), ("k", "1970-01-05 10:00:00"),
        ("k", "1970-01-05 11:00:00"))
      .toDF("k", "t").select($"k", to_timestamp($"t").as("ts"))
    val out = Temporal.dowProfile(df, "k", "ts")
      .select("dow", "n", "share").as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 1L, 0.333333), (1L, 2L, 0.666667)), s"got $out")
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val shares = Temporal.dowProfile(ev, "event_type", "ts")
      .groupBy("event_type").agg(round(sum(col("share")), 4).as("s"))
    assert(shares.where(col("s") =!= 1.0).count() == 0)
  }

  // ---------------------------------------------------------- time folds

  test("time folds: uniform mass splits on exact day boundaries") {
    import spark.implicits._
    // 2 events/day over 4 days, k=4: thresholds 2i land exactly on day i
    val ev = (1 to 4).flatMap(d => Seq(1, 2).map(h =>
        (s"2024-03-0$d 0$h:00:00", 1.0)))
      .toDF("s", "value")
      .select(to_timestamp($"s").as("ts"), $"value")
    val out = Temporal.timeFolds(ev, "ts", k = 4)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-03-01", "2024-03-02", 2L, 2L),
      (2L, "2024-03-02", "2024-03-03", 4L, 2L),
      (3L, "2024-03-03", "2024-03-04", 6L, 2L)))
  }

  test("time folds on fixture events: expanding, conserving, never leaking") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val total = ev.count()
    val folds = Temporal.timeFolds(ev, "ts", k = 4).collect()
    assert(folds.length == 3)
    val nTrain = folds.map(_.getAs[Long]("n_train"))
    assert(nTrain.zip(nTrain.tail).forall { case (a, b) => a < b })
    folds.foreach { f =>
      assert(f.getAs[String]("train_end") < f.getAs[String]("val_end"))
    }
    // last fold's train+val mass is the whole corpus
    val last = folds.last
    assert(last.getAs[Long]("n_train") + last.getAs[Long]("n_val") == total)
  }

  // ---------------------------------------------------------- pivot/melt

  test("pivot then melt round-trips to the plain groupBy counts") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val vals = Seq("click", "view", "purchase", "signup", "error")
    val wide = Reshape.pivotCounts(ev, "user_id", "event_type", vals)
    val melted = Reshape.meltCounts(wide, "user_id", vals, "event_type", "n")
      .where(col("n") > 0)
    val direct = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    assert(melted.exceptAll(direct).isEmpty && direct.exceptAll(melted).isEmpty)
  }

  test("pivot: absent (key, value) combos are zero, not null") {
    import spark.implicits._
    val ev = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("user_id", "event_type")
    val wide = Reshape.pivotCounts(ev, "user_id", "event_type", Seq("a", "b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(wide == Set((1L, 2L, 0L), (2L, 0L, 1L)))
  }

  // --------------------------------------------------- retrieval eval

  test("precision@k: fully-relevant top ranks score 1, dilution shows at larger k") {
    import spark.implicits._
    // docs 1-5 contain every query term many times (rank at the top AND
    // are the conjunctive-relevant set); 6-15 contain a single term
    val docs = ((1 to 5).map(i => (i.toLong, "alpha beta gamma alpha beta gamma")) ++
      (6 to 15).map(i => (i.toLong, "alpha filler filler filler"))).toDF("doc_id", "text")
    val out = Search.precisionAtK(docs, "doc_id", "text",
        Seq("alpha", "beta", "gamma"), ks = Seq(5, 10))
      .select("n_relevant", "p5", "p10").as[(Long, Double, Double)].collect().head
    assert(out == ((5L, 1.0, 0.5)), s"got $out")
  }

  test("apEval: matches direct AP over the bm25 ranking; window-miss costs AP") {
    import spark.implicits._
    // doc 1: all terms, high tf → top. doc 14: all terms once, buried by
    // a long body. docs 2-13: one high-tf term each.
    val docs = (Seq((1L, "alpha beta gamma alpha beta gamma")) ++
      (2 to 13).map(i => (i.toLong,
        Seq.fill(5)(if (i % 2 == 0) "beta" else "gamma").mkString(" "))) ++
      Seq((14L, "alpha beta gamma " + Seq.fill(100)("pad").mkString(" "))))
      .toDF("doc_id", "text")
    val terms = Seq("alpha", "beta", "gamma")
    val r = Search.apEval(docs, "doc_id", "text", terms).collect().head
    assert(r.getAs[Long]("n_relevant") == 2L)
    assert(r.getAs[Double]("mrr") == 1.0)
    // direct AP from the ranked list + the known relevance set {1, 14}
    val ranked = Search.bm25Rank(docs, "doc_id", "text", terms, 100)
      .orderBy(col("score").desc, col("doc_id"))
      .select("doc_id").as[Long].collect()
    val rel = Set(1L, 14L)
    var cum = 0; var sp = 0.0
    ranked.zipWithIndex.foreach { case (id, i) =>
      if (rel(id)) {
        cum += 1
        sp += math.floor(cum.toDouble / (i + 1) * 1e6 + 0.5) / 1e6
      } }
    assert(math.abs(r.getAs[Double]("ap") - sp / rel.size) < 1e-6)
    // doc 14 must actually be buried for the test to mean anything
    assert(ranked.indexOf(14L) > 1, s"ranking=${ranked.toSeq}")
    // a relevant doc outside the ranked window counts as a miss
    val narrow = Search.apEval(docs, "doc_id", "text", terms, kmax = 1)
      .collect().head
    assert(narrow.getAs[Long]("hits_ranked") == 1L)
    assert(narrow.getAs[Double]("ap") == 0.5)
  }

  test("apEvalPanel: shared-scan panel equals per-query apEval exactly") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val panel = Seq(
      ("q_dup_window", Seq("dup", "window")),
      ("q_spark_join", Seq("spark", "join")),
      ("q_nohit", Seq("zzznothere")))
    val got = Search.apEvalPanel(docs, "doc_id", "text", panel)
      .collect().map(r => r.getString(0) -> r).toMap
    panel.foreach { case (name, terms) =>
      val single = Search.apEval(docs, "doc_id", "text", terms).collect()(0)
      val p = got(name)
      assert(p.getAs[Long]("n_relevant") == single.getAs[Long]("n_relevant"),
        s"$name n_relevant")
      assert(p.getAs[Long]("hits_ranked") == single.getAs[Long]("hits_ranked"),
        s"$name hits_ranked")
      assert(Option(p.getAs[java.lang.Double]("ap")) ==
        Option(single.getAs[java.lang.Double]("ap")), s"$name ap")
      assert(Option(p.getAs[java.lang.Double]("mrr")) ==
        Option(single.getAs[java.lang.Double]("mrr")), s"$name mrr")
    }
  }

  // ------------------------------------------------- Gini concentration

  test("gini: uniform source scores zero, one-megadoc source scores high") {
    import spark.implicits._
    val uniform = (1 to 10).map(i => ("u", Seq.fill(50)("w").mkString(" ")))
    val skewed = (1 to 9).map(i => ("s", "w")) :+
      ("s", Seq.fill(1000)("w").mkString(" "))
    val df = (uniform ++ skewed).toDF("source", "text")
    val out = Audit.giniConcentration(df, "source",
        TextAnalysis.tokenCount(col("text")))
      .select("source", "gini").as[(String, Double)].collect().toMap
    assert(out("u") == 0.0, s"uniform docs must score 0: $out")
    assert(out("s") > 0.8, s"megadoc concentration must dominate: $out")
  }

  // ------------------------------------------------------ bootstrap CI

  test("bootstrap CI brackets the mean on fixture events and is deterministic") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val r1 = Bootstrap.meanCi(ev, "event_id", "value", b = 64).collect().head
    val r2 = Bootstrap.meanCi(ev, "event_id", "value", b = 64).collect().head
    assert(r1 == r2) // fully deterministic resampling
    val (lo, m, hi) = (r1.getAs[Double]("ci_lo"), r1.getAs[Double]("mean"),
      r1.getAs[Double]("ci_hi"))
    assert(lo < m && m < hi, s"CI [$lo, $hi] must bracket mean $m")
    assert((hi - lo) / m < 0.5, s"CI implausibly wide: [$lo, $hi] around $m")
  }

  test("bootstrap CI degenerates to the point value on a constant column") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, 7.5)).toDF("id", "v")
    val r = Bootstrap.meanCi(df, "id", "v", b = 32).collect().head
    assert(r.getAs[Double]("mean") == 7.5)
    assert(r.getAs[Double]("ci_lo") == 7.5 && r.getAs[Double]("ci_hi") == 7.5)
  }

  // ------------------------------------------------------- table profile

  test("profile stats: nulls counted, distincts exclude nulls, strings digest") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("aa"), Some(1.5)),
      (2L, None, Some(1.5)),
      (3L, Some("bb"), None),
      (4L, Some("aa"), Some(2.0))
    ).toDF("id", "s", "v")
    val out = Profile.stats(df, Seq(
        ("id", col("id"), false), ("s", col("s"), false), ("v", col("v"), true)))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(out("id").getAs[Long]("n_null") == 0 && out("id").getAs[Long]("n_distinct") == 4)
    assert(out("s").getAs[Long]("n_null") == 1 && out("s").getAs[Long]("n_distinct") == 2)
    assert(out("s").getAs[String]("vmin") == "aa" && out("s").getAs[String]("vmax") == "bb")
    assert(out("v").getAs[Long]("n_null") == 1 && out("v").getAs[Long]("n_distinct") == 2)
    assert(out("v").getAs[String]("vmax") == "2.000000")
  }

  // ------------------------------------------------------ embed hygiene

  test("embed hygiene: zero vectors and ragged dims are surfaced per label") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(3.0f, 4.0f), 0),       // norm 5
      (2L, Seq(0.0f, 0.0f), 0),       // zero vector
      (3L, Seq(1.0f, 0.0f, 0.0f), 1)  // dim 3
    ).toDF("vec_id", "embedding", "label")
    val out = Audit.embedHygiene(emb, "embedding", "label")
      .select($"label", $"n", $"dim_min", $"dim_max", $"n_zero", $"min_norm", $"max_norm")
      .as[(Int, Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(out == Set(
      (0, 2L, 2L, 2L, 1L, 0.0, 5.0),
      (1, 1L, 3L, 3L, 0L, 1.0, 1.0)
    ))
  }
}
