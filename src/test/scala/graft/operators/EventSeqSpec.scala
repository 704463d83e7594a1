package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventSeqSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("eventseq-spec")
    .getOrCreate()

  private def events(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "t_sec", "event_type", "value")
      .select(col("event_id"), col("user_id"),
        timestamp_seconds(col("t_sec")).as("ts"), col("event_type"), col("value"))
  }

  test("funnel: in-order within-window progression, out-of-order and late drop out") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = Seq(
      // u1 converts fully in order
      (1L, 1L, 0L, "signup", 0.0), (2L, 1L, 10L, "view", 0.0),
      (3L, 1L, 20L, "click", 0.0), (4L, 1L, 30L, "purchase", 0.0),
      // u2 reaches click only
      (5L, 2L, 0L, "signup", 0.0), (6L, 2L, 10L, "view", 0.0),
      (7L, 2L, 20L, "click", 0.0),
      // u3: purchase BEFORE click — purchase must not count
      (8L, 3L, 0L, "signup", 0.0), (9L, 3L, 10L, "view", 0.0),
      (10L, 3L, 15L, "purchase", 0.0), (11L, 3L, 20L, "click", 0.0),
      // u4: view outside the 100 s window
      (12L, 4L, 0L, "signup", 0.0), (13L, 4L, 500L, "view", 0.0))
    val out = EventSeq.funnel(events(rows), "user_id", "ts", "event_type",
        Seq("signup", "view", "click", "purchase"), windowSec = 100L)
      .select("stage_idx", "n_users", "conv_rate")
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((0, 4L, 1.0), (1, 3L, 0.75), (2, 3L, 0.75), (3, 1L, 0.25)),
      s"funnel rows: $out")
  }

  test("transitions: lead pairs per user in (ts, id) order; probabilities per source") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 0L, "view", 0.0), (2L, 1L, 10L, "click", 0.0),
      (3L, 1L, 20L, "view", 0.0),
      (4L, 2L, 0L, "view", 0.0), (5L, 2L, 10L, "view", 0.0),
      // same-ts tie for u3: event_id order decides view→click
      (6L, 3L, 7L, "view", 0.0), (7L, 3L, 7L, "click", 0.0))
    val out = EventSeq.transitions(events(rows), "user_id", "ts", "event_type", "event_id")
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSeq.sorted
    assert(out == Seq(("click", "view", 1L, 1.0),
      ("view", "click", 2L, 0.6667), ("view", "view", 1L, 0.3333)),
      s"transitions: $out")
  }

  test("cohort retention: first-day cohorts, per-day distinct activity") {
    import spark.implicits._
    val day = 86400L
    val rows = Seq(
      // u1 active day0 (twice — must dedup), day1
      (1L, 1L, 0L, "view", 0.0), (2L, 1L, 100L, "view", 0.0),
      (3L, 1L, day + 5, "view", 0.0),
      // u2 first active day1
      (4L, 2L, day + 9, "view", 0.0))
    val out = EventSeq.cohortRetention(events(rows), "user_id", "ts")
      .select("cohort_day", "day_offset", "n_users")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out == Seq((0L, 0L, 1L), (0L, 1L, 1L), (1L, 0L, 1L)), s"cohort: $out")
  }

  test("cohort LTV: cumulative value per member along cohort age") {
    import spark.implicits._
    val day = 86400L
    val rows = Seq(
      // cohort day0: u1 and u2; u1 spends 10 on d0 and 6 on d2, u2 spends
      // 4 on d0 — curve: offset0 = 14/2, offset2 = 20/2
      (1L, 1L, 0L, "purchase", 10.0), (2L, 2L, 50L, "purchase", 4.0),
      (3L, 1L, 2 * day, "purchase", 6.0),
      // cohort day1: u3 alone, spends 8 then 1
      (4L, 3L, day, "purchase", 8.0), (5L, 3L, day + 10, "purchase", 1.0))
    val out = EventSeq.cohortLtv(events(rows), "user_id", "ts", "value")
      .select("cohort_day", "day_offset", "n_users", "ltv_per_user")
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(out == Seq((0L, 0L, 2L, 7.0), (0L, 2L, 2L, 10.0),
      (1L, 0L, 1L, 9.0)), s"ltv: $out")
  }

  test("paretoShare: distinct spends give exact top-decile share, whale dominates") {
    import spark.implicits._
    val even = (1 to 10).map(i => (i.toLong, i * 10.0)).toDF("k", "v")
    val r = Audit.paretoShare(even, "k", "v").collect()(0)
    assert(r.getAs[Long]("n_keys") == 10L)
    // t90 interpolates to 91 → only key 10 (spend 100) qualifies
    assert(math.abs(r.getAs[Double]("share_top10") - 100.0 / 550.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("share_top50") -
      (60 + 70 + 80 + 90 + 100) / 550.0) < 1e-6)
    val whale = ((1 to 9).map(i => (i.toLong, 10.0)) :+ ((10L, 1000.0)))
      .toDF("k", "v")
    val rw = Audit.paretoShare(whale, "k", "v").collect()(0)
    assert(rw.getAs[Double]("share_top10") > 0.9)
  }

  test("basketLift: bundled types lift > 1, disjoint audiences lift < 1") {
    import spark.implicits._
    // users 1-10 do BOTH a and b (perfect bundle); users 11-20 do c only,
    // 21-30 do d only (perfect substitutes); all 30 do "base"
    val rows = (1L to 10L).flatMap(u => Seq((u, "a"), (u, "b"))) ++
      (11L to 20L).map(u => (u, "c")) ++ (21L to 30L).map(u => (u, "d")) ++
      (1L to 30L).map(u => (u, "base"))
    val out = EventSeq.basketLift(rows.toDF("user_id", "event_type"),
        "user_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("n_both") == 10L)
    assert(ab.getAs[Double]("lift") == 3.0) // 30·10/(10·10)
    assert(ab.getAs[Double]("jaccard") == 1.0)
    assert(ab.getAs[Double]("conf_a_b") == 1.0)
    assert(!out.contains(("c", "d"))) // no shared user → no pair row
    // a vs base: conf(a→base)=1, lift = 30·10/(10·30) = 1 (independent-ish)
    assert(out(("a", "base")).getAs[Double]("lift") == 1.0)
  }

  test("churnHazard: day-1 cliff localized, survivors drain at the end") {
    import spark.implicits._
    val day = 86400L
    // 6 users churn immediately (lifetime 0), 3 live 5 days, 1 lives 10
    val rows =
      (1L to 6L).map(u => (u, 0L)) ++
      (7L to 9L).flatMap(u => Seq((u, 0L), (u, 5 * day))) ++
      Seq((10L, 0L), (10L, 10 * day))
    val out = EventSeq.churnHazard(
        rows.toDF("user_id", "t_sec")
          .select(col("user_id"), timestamp_seconds(col("t_sec")).as("ts")),
        "user_id", "ts")
      .select("age", "at_risk", "n_churned", "hazard")
      .as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(out == Seq((0L, 10L, 6L, 0.6), (5L, 4L, 3L, 0.75),
      (10L, 1L, 1L, 1.0)), s"hazard: $out")
  }

  test("activeUsers: trailing windows count distinct users exactly") {
    import spark.implicits._
    val day = 86400L
    // u1 active days 0,1; u2 active day 0 only; u3 active day 9 only
    val rows = Seq((1L, 0L), (1L, 50L), (1L, day), (2L, 10L), (3L, 9 * day))
    val out = EventSeq.activeUsers(
        rows.toDF("user_id", "t_sec")
          .select(col("user_id"), timestamp_seconds(col("t_sec")).as("ts")),
        "user_id", "ts", wauDays = 7, mauDays = 28)
      .select("day", "dau", "wau", "mau", "stickiness")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L) == ((0L, 2L, 2L, 2L, 1.0)))
    assert(out(1L) == ((1L, 1L, 2L, 2L, 0.5)))
    // day 6: u1/u2's day-0 activity still inside the 7-day window
    assert(out(6L)._3 == 2L)
    // day 7: day-0 activity aged out of WAU, still inside MAU
    assert(out(7L) == ((7L, 0L, 1L, 2L, 0.0)))
    // day 9: u3 joins; u1's day-1 activity aged out of WAU (1+7 = 8 ≤ 9)
    assert(out(9L) == ((9L, 1L, 1L, 3L, 0.333333)))
  }

  test("effectSizes: planted lift shows h and d with matching signs") {
    import spark.implicits._
    def md5Arm(u: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
      Integer.parseInt(f"${d(0)}%02x", 16) % 2
    }
    // arm A converts 60% around value 10; arm B converts 20% around 30
    // (±1 jitter keeps the pooled sd positive)
    val rows = (1L to 600L).map { u =>
      val a = md5Arm(u)
      val conv = if (a == 0) u % 5 < 3 else u % 5 < 1
      val base = if (a == 0) 10.0 else 30.0
      (u, if (conv) "purchase" else "view", base + (u % 3) - 1)
    }.toDF("user_id", "event_type", "value")
    val r = EventSeq.effectSizes(rows, "user_id", "event_type", "value",
      "purchase").collect()(0)
    assert(r.getAs[Double]("cohens_h") > 0.5, s"h=${r.getAs[Double]("cohens_h")}")
    assert(r.getAs[Double]("p_a") > r.getAs[Double]("p_b"))
    // value metric runs the other way: B's purchases are worth 3×
    assert(r.getAs[Double]("cohens_d") < -2,
      s"d=${r.getAs[Double]("cohens_d")}")
  }

  test("shapley: efficiency axiom holds; the driving channel takes the credit") {
    import spark.implicits._
    // channels a,b,c: conversion happens iff the user touched "a";
    // b rides along on half the converters (pure free-rider)
    val rows =
      (1L to 20L).flatMap { u =>    // touched a (+ b on evens) → convert
        val base = Seq((u, "a"), (u, "purchase"))
        if (u % 2 == 0) base :+ ((u, "b")) else base
      } ++
      (21L to 40L).map(u => (u, "b")) ++   // b alone → no conversion
      (41L to 60L).map(u => (u, "c"))      // c alone → no conversion
    val df = rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
    val r = Attribution.shapley(df, "user_id", "event_type",
        convType = "purchase", nChannels = 3)
      .collect().map(x => x.getString(0) -> x).toMap
    val (sa, sb, sc) = (r("a").getAs[Double]("shapley"),
      r("b").getAs[Double]("shapley"), r("c").getAs[Double]("shapley"))
    // hand-derived under the monotone valuation: v({a})=10, v({a,b})=20,
    // v({a,c})=10, v(N)=20, rest 0 → φ_a=15, φ_b=5, φ_c=0
    assert(sa == 15.0, s"a=$sa")
    assert(sb == 5.0, s"b=$sb")
    assert(sc == 0.0, s"c=$sc")
    // efficiency: Σφ = v(all) − v(∅) = all 20 conversions, exactly
    assert(sa + sb + sc == 20.0)
    assert(r("a").getAs[Long]("n_users") == 20L)
    assert(r("c").getAs[Long]("n_users") == 20L)
  }

  test("funnel timing: mean stage-to-stage hours over first-touch times") {
    import spark.implicits._
    val h = 3600L
    val rows = Seq(
      // u1: signup→view 1h, view→click 2h
      (1L, 1L, 0L, "signup", 0.0), (2L, 1L, h, "view", 0.0),
      (3L, 1L, 3 * h, "click", 0.0),
      // u2: signup→view 3h, stops
      (4L, 2L, 0L, "signup", 0.0), (5L, 2L, 3 * h, "view", 0.0))
    val out = EventSeq.funnelTiming(events(rows), "user_id", "ts", "event_type",
        Seq("signup", "view", "click"), windowSec = 10 * h)
      .select("stage_idx", "n_users", "avg_hours")
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out == Seq((1, 2L, 2.0), (2, 1L, 2.0)), s"timing: $out")
  }

  test("last-touch attribution: in-window touch credited, stale → direct, ties → max id") {
    import spark.implicits._
    val rows = Seq(
      // u1: click 10s before purchase → click credited
      (1L, 1L, 100L, "click", 0.0), (2L, 1L, 110L, "purchase", 0.0),
      // u2: view 2h before purchase with 1h lookback → direct
      (3L, 2L, 0L, "view", 0.0), (4L, 2L, 7200L, "purchase", 0.0),
      // u3: view and click at the SAME ts before purchase → max id (click) wins
      (5L, 3L, 50L, "view", 0.0), (6L, 3L, 50L, "click", 0.0),
      (7L, 3L, 60L, "purchase", 0.0))
    val out = Attribution.lastTouch(events(rows), "user_id", "ts",
        "event_type", "event_id", convType = "purchase", lookbackSec = 3600L)
      .select("channel", "n_conv", "share")
      .as[(String, Long, Double)].collect().toSeq.sorted
    assert(out == Seq(("click", 2L, 0.6667), ("direct", 1L, 0.3333)),
      s"attribution: $out")
  }

  test("rfm scores: quartile bands with inverted recency; rfm code concatenates") {
    import spark.implicits._
    val day = 86400L
    // 4 users with strictly ordered recency/frequency/monetary profiles
    val rows =
      // u1: 1 old cheap purchase (worst on all axes)
      Seq((1L, 1L, 0L, "purchase", 1.0)) ++
      // u2: 2 purchases, newer, more value
      Seq((2L, 2L, 5 * day, "purchase", 5.0), (3L, 2L, 10 * day, "purchase", 5.0)) ++
      // u3: 3 purchases
      (0 until 3).map(i => (10L + i, 3L, (15 + i) * day, "purchase", 10.0)) ++
      // u4: 4 purchases ending at the corpus max (best on all axes)
      (0 until 4).map(i => (20L + i, 4L, (25 + i) * day, "purchase", 20.0))
    val out = EventSeq.rfmScores(events(rows), "user_id", "ts", "value",
        "event_type", convType = "purchase")
      .select("user_id", "r_score", "f_score", "m_score", "rfm")
      .as[(Long, Int, Int, Int, String)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._5) == Seq("111", "222", "333", "444"),
      s"monotone profiles → monotone codes: $out")
    assert(out.forall(r => r._5 == s"${r._2}${r._3}${r._4}"), s"code concat: $out")
  }

  test("decayed engagement halves per half-life; newest event undecayed") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 0L, "view", 8.0),    // two half-lives old → 2.0
      (2L, 1L, 100L, "view", 4.0),  // one half-life old → 2.0
      (3L, 1L, 200L, "view", 1.0))  // newest → 1.0
    val out = EventSeq.decayAgg(events(rows), "user_id", "ts", "value",
        halfLifeSec = 100L)
      .select("user_id", "n_events", "decayed_value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 3L, 5.0)), s"decay: $out")
  }

  test("Welch t: planted arm separation yields a large |t|; counts conserve") {
    import spark.implicits._
    // value deterministically derived FROM the md5 arm: arm 0 → 10, arm 1
    // → 20, plus a user-specific wobble so variances are nonzero
    val users = (1L to 60L)
    def armOf(u: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
      ((h(0) & 0xff) % 2 + 2) % 2
    }
    val rows = users.zipWithIndex.map { case (u, i) =>
      (i.toLong, u, i.toLong * 1000L, "purchase",
        10.0 + armOf(u) * 10.0 + (u % 3) * 0.1)
    }.toSeq
    val out = EventSeq.abValueTtest(events(rows), "user_id", "event_type",
        "value", convType = "purchase").collect().head
    assert(out.getAs[Long]("n_a") + out.getAs[Long]("n_b") == 60L)
    assert(out.getAs[Double]("mean_b") - out.getAs[Double]("mean_a") > 9.0)
    assert(math.abs(out.getAs[Double]("t")) > 50.0,
      s"planted 10-unit separation must dominate the 0.1 wobble: $out")
    assert(out.getAs[Double]("df") > 10.0)
  }

  test("markov removal: mandatory channel scores total effect, unused scores zero") {
    spark.sparkContext.setLogLevel("WARN")
    // every converting journey is START -> a -> CONV; "b" appears only in
    // non-converting journeys. Removing a kills ALL conversion (effect 1);
    // removing b changes nothing (effect 0).
    val rows = Seq(
      (1L, 1L, 0L, "a", 0.0), (2L, 1L, 10L, "purchase", 0.0),
      (3L, 2L, 0L, "a", 0.0), (4L, 2L, 10L, "purchase", 0.0),
      (5L, 3L, 0L, "b", 0.0), (6L, 3L, 10L, "b", 0.0))
    val out = Attribution.markovRemoval(events(rows), "user_id", "ts",
        "event_type", "event_id", convType = "purchase",
        channels = Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3))).toSeq
    // base chain: START->a (2/3), START->b (1/3); a->CONV always; b->b->NULL
    val pBase = 2.0 / 3.0
    assert(out.map(_._1) == Seq("a", "b"))
    assert(math.abs(out.head._2 - pBase) < 1e-6, s"$out")
    assert(out.head._3 == 1.0, s"removing the mandatory channel: $out")
    assert(out(1)._3 == 0.0, s"removing the unused channel: $out")
  }

  test("markov removal: chain truncates at the FIRST conversion") {
    spark.sparkContext.setLogLevel("WARN")
    // events after the first purchase must not create transitions: the
    // post-conversion "b" here would otherwise give b a removal effect
    val rows = Seq(
      (1L, 1L, 0L, "a", 0.0), (2L, 1L, 10L, "purchase", 0.0),
      (3L, 1L, 20L, "b", 0.0), (4L, 1L, 30L, "purchase", 0.0))
    val out = Attribution.markovRemoval(events(rows), "user_id", "ts",
        "event_type", "event_id", convType = "purchase",
        channels = Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(out("b") == 0.0, s"post-conversion events leaked into the chain: $out")
    assert(out("a") == 1.0, s"$out")
  }

  test("cuped: theta recovers the planted pre/post slope, variance collapses") {
    spark.sparkContext.setLogLevel("WARN")
    // user u: pre-period X = u mod 10 at t=0s, post-period Y = 2X + wobble
    // at t=100s; split at 50s. Y is almost a deterministic function of X,
    // so CUPED must find theta ~ 2 and residual variance near zero.
    val rows = (1L to 200L).flatMap { u =>
      val x = (u % 10).toDouble
      Seq((u * 2, u, 0L, "view", x),
        (u * 2 + 1, u, 100L, "view", 2.0 * x + (u % 3) * 0.1))
    }
    val out = Cuped.adjust(events(rows), "user_id", "ts", "value",
      splitMs = 50000L).collect().head
    assert(out.getAs[Long]("n_a") + out.getAs[Long]("n_b") == 200L)
    val theta = out.getAs[Double]("theta")
    assert(theta > 1.9 && theta < 2.1, s"theta $theta, expected ~2")
    assert(out.getAs[Double]("var_ratio") < 0.05,
      s"near-deterministic X->Y must collapse variance: $out")
    // no planted arm effect: adjusted means differ by less than the raw
    // X-imbalance the adjustment removes
    assert(math.abs(out.getAs[Double]("mean_a_adj") -
      out.getAs[Double]("mean_b_adj")) < 1.0)
  }
}
