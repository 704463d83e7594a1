package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-way analysis of variance across groups, plus the Brown-Forsythe
  * (median-centered Levene) homogeneity-of-variance test that validates
  * ANOVA's own assumption — the "do sources differ" pair for corpus
  * slices: [[oneWay]] asks whether group MEANS differ, [[brownForsythe]]
  * whether group SPREADS do (quality drift often shows in spread first).
  *
  * Exactness discipline: values fold as DECIMAL(18,6) moments per group;
  * the between-group terms sx_g²/n_g round to 6 and fold as DECIMAL, so
  * F and η² are fixed-shape doubles over partition-order-immune sums.
  */
object Anova {

  private def d(c: Column) = c.cast("double")

  /** Shared fold: per-group (n, Σx, Σx²) in DECIMAL → F, η². Input must
    * provide columns (g, x DECIMAL(18,6)).
    */
  private def anovaOf(vals: DataFrame): DataFrame = {
    val byG = vals.groupBy("g")
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val terms = byG.select(col("ng"), col("sx"), col("sxx"),
      round(d(col("sx")) * d(col("sx")) / d(col("ng")), 6)
        .cast("decimal(38,6)").as("bt"))
    terms.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
        sum(col("sx")).as("s"), sum(col("sxx")).as("ss"),
        sum(col("bt")).as("sbt"))
      .select(col("n"), col("k"),
        (d(col("sbt")) - d(col("s")) * d(col("s")) / d(col("n"))).as("ssb"),
        (d(col("ss")) - d(col("sbt"))).as("ssw"))
      .select(col("n"), col("k").as("k_groups"),
        round(col("ssb"), 4).as("ss_between"),
        round(col("ssw"), 4).as("ss_within"),
        when(col("ssw") > 0 && col("k") > 1 && col("n") > col("k"),
          round((col("ssb") / (d(col("k")) - lit(1.0))) /
            (col("ssw") / (d(col("n")) - d(col("k")))), 4)).as("f_stat"),
        when(col("ssb") + col("ssw") > 0,
          round(col("ssb") / (col("ssb") + col("ssw")), 6)).as("eta_sq"))
  }

  /** One-way ANOVA of `valCol` across `groupCol`: F = MSB/MSW and the
    * effect size η² = SSB/SST. One scan, groups-bounded algebra.
    */
  def oneWay(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    anovaOf(Dedup.parallelize(df).select(col(groupCol).as("g"),
      col(valCol).cast("decimal(18,6)").as("x")))

  /** DuckDB mirror of [[oneWay]]. */
  def oneWaySql(tbl: String, groupCol: String, valCol: String): String =
    anovaSql(s"SELECT $groupCol AS g, CAST($valCol AS DECIMAL(18,6)) AS x FROM $tbl")

  /** Brown-Forsythe: one-way ANOVA of the absolute deviations from each
    * group's MEDIAN — the robust Levene variant. The F is on |x − med_g|,
    * so a significant result means group SPREADS differ. Medians are
    * exact (interpolated) per group — group-bounded; at petabyte group
    * sizes swap in the histogram-quantile sketch, the fold is unchanged.
    */
  def brownForsythe(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val base = Dedup.parallelize(df).select(col(groupCol).as("g"),
      col(valCol).cast("decimal(18,6)").as("x0"))
    val med = base.groupBy("g")
      .agg(percentile(d(col("x0")), lit(0.5)).as("m"))
    base.join(broadcast(med), "g")
      .select(col("g"),
        round(abs(d(col("x0")) - col("m")), 6).cast("decimal(18,6)").as("x"))
      .transform(anovaOf)
  }

  /** DuckDB mirror of [[brownForsythe]] (`median` = percentile_cont 0.5,
    * the same interpolated definition as Spark's `percentile`).
    */
  def brownForsytheSql(tbl: String, groupCol: String,
      valCol: String): String =
    anovaSql(s"""SELECT b.g,
        CAST(round(abs(CAST(x0 AS DOUBLE) - m), 6) AS DECIMAL(18,6)) AS x
      FROM (SELECT $groupCol AS g, CAST($valCol AS DECIMAL(18,6)) AS x0 FROM $tbl) b
      JOIN (SELECT $groupCol AS g, median(CAST($valCol AS DOUBLE)) AS m
            FROM $tbl GROUP BY 1) md ON b.g = md.g""")

  /** Bartlett's test (Bartlett 1937) for homogeneity of variance: the
    * PARAMETRIC companion to [[brownForsythe]] — more powerful when the
    * data really are normal, badly oversensitive when they are not (run
    * the Jarque–Bera gate first; that asymmetry is why both ship).
    * T = [(N−k)·ln s_p² − Σ(n_g−1)·ln s_g²] / C ~ χ²(k−1), with
    * C = 1 + (Σ1/(n_g−1) − 1/(N−k)) / (3(k−1)).
    *
    * One scan: per-group (n, Σx, Σx²) DECIMAL moments; the log terms
    * round to 9 and fold as DECIMAL over the groups-bounded relation.
    */
  def bartlett(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val byG = Dedup.parallelize(df)
      .select(col(groupCol).as("g"), col(valCol).cast("decimal(18,6)").as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .where(col("ng") >= 2)
    val s2 = (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("ng"))) /
      (d(col("ng")) - lit(1.0))
    val terms = byG.select(col("ng"),
      round((d(col("ng")) - lit(1.0)) * s2, 6).cast("decimal(38,6)").as("ss"),
      when(s2 > 0, round((d(col("ng")) - lit(1.0)) * log(s2), 9)
        .cast("decimal(28,9)")).as("lg"),
      round(lit(1.0) / (d(col("ng")) - lit(1.0)), 9)
        .cast("decimal(28,9)").as("inv"))
    val agg = terms.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
      sum(col("ss")).as("sst"), sum(col("lg")).as("slg"),
      sum(col("inv")).as("sinv"),
      sum(when(col("lg").isNull, 1L).otherwise(0L)).as("n_degen"))
    val n = d(col("n"))
    val k = d(col("k"))
    val sp2 = d(col("sst")) / (n - k)
    val t = (n - k) * log(sp2) - d(col("slg"))
    val c = lit(1.0) + (d(col("sinv")) - lit(1.0) / (n - k)) /
      (lit(3.0) * (k - lit(1.0)))
    val critArr = array(chiCrit95.map(lit): _*)
    agg.select(col("n").cast("long").as("n"), col("k").as("k_groups"),
      when(col("n_degen") === 0 && sp2 > 0, round(t / c, 4)).as("t_stat"),
      when(col("n_degen") === 0 && sp2 > 0 &&
          col("k") >= 2 && col("k") <= 15,
        t / c > element_at(critArr, (col("k") - 1).cast("int")))
        .as("reject_95"))
  }

  /** DuckDB mirror of [[bartlett]]. */
  def bartlettSql(tbl: String, groupCol: String, valCol: String): String = {
    val critList = chiCrit95.mkString("[", ", ", "]")
    s"""WITH byg AS (SELECT $groupCol AS g, COUNT(*) AS ng,
           SUM(CAST($valCol AS DECIMAL(18,6))) AS sx,
           SUM(CAST($valCol AS DECIMAL(18,6)) * CAST($valCol AS DECIMAL(18,6))) AS sxx
         FROM $tbl GROUP BY 1 HAVING COUNT(*) >= 2),
       terms AS (SELECT ng,
           CAST(round((CAST(ng AS DOUBLE) - 1.0) *
             ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               / CAST(ng AS DOUBLE)) / (CAST(ng AS DOUBLE) - 1.0)), 6)
             AS DECIMAL(38,6)) AS ss,
           CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               / CAST(ng AS DOUBLE)) / (CAST(ng AS DOUBLE) - 1.0) > 0
             THEN CAST(round((CAST(ng AS DOUBLE) - 1.0) *
               ln((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(ng AS DOUBLE)) / (CAST(ng AS DOUBLE) - 1.0)), 9)
               AS DECIMAL(28,9)) END AS lg,
           CAST(round(1.0 / (CAST(ng AS DOUBLE) - 1.0), 9) AS DECIMAL(28,9)) AS inv
         FROM byg),
       agg AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, COUNT(*) AS k,
           SUM(ss) AS sst, SUM(lg) AS slg, SUM(inv) AS sinv,
           CAST(SUM(CASE WHEN lg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_degen
         FROM terms),
       f AS (SELECT n, k, n_degen,
           CAST(sst AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS sp2,
           (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
             * ln(CAST(sst AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
             - CAST(slg AS DOUBLE) AS t,
           1.0 + (CAST(sinv AS DOUBLE)
             - 1.0 / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
             / (3.0 * (CAST(k AS DOUBLE) - 1.0)) AS c
         FROM agg)
       SELECT n, k AS k_groups,
         CASE WHEN n_degen = 0 AND sp2 > 0 THEN round(t / c, 4) END AS t_stat,
         CASE WHEN n_degen = 0 AND sp2 > 0 AND k >= 2 AND k <= 15
           THEN t / c > ($critList)[CAST(k AS INT) - 1] END AS reject_95
       FROM f"""
  }

  /** Welch's heteroscedastic one-way ANOVA (Welch 1951): the k-group
    * generalization of Welch's t — does any group MEAN differ, without
    * [[oneWay]]'s equal-variance assumption. W* compares
    * variance-weighted means (w_g = n_g/s_g²); df₂ comes from the
    * Satterthwaite-style Λ term. The right default when [[bartlett]] /
    * [[brownForsythe]] reject. `reject_95` uses the χ²(k−1)/(k−1) limit
    * of F(k−1, df₂) — documented approximation, exact as df₂ → ∞.
    *
    * Same one-scan group-moment fold as [[oneWay]]; the weighted layers
    * are groups-bounded with round-then-DECIMAL terms.
    */
  def welchAnova(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val byG = Dedup.parallelize(df)
      .select(col(groupCol).as("g"), col(valCol).cast("decimal(18,6)").as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .where(col("ng") >= 2)
    val s2 = (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("ng"))) /
      (d(col("ng")) - lit(1.0))
    val t1 = byG.select(col("ng"), col("sx"), col("sxx"),
      when(s2 > 0, round(d(col("ng")) / s2, 9).cast("decimal(28,9)")).as("w"),
      (d(col("sx")) / d(col("ng"))).as("m"))
    val wm = t1.select(col("ng"), col("w"), col("m"),
      round(d(col("w")) * col("m"), 9).cast("decimal(38,9)").as("wm"))
    val tot = wm.agg(sum(col("w")).as("wt"), sum(col("wm")).as("wmt"),
      count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(when(col("w").isNull, 1L).otherwise(0L)).as("n_degen"))
    val joined = wm.crossJoin(broadcast(tot))
      .select(col("k"), col("n"), col("n_degen"), col("wt"),
        round(d(col("w")) *
          (col("m") - d(col("wmt")) / d(col("wt"))) *
          (col("m") - d(col("wmt")) / d(col("wt"))), 9)
          .cast("decimal(38,9)").as("num_t"),
        round((lit(1.0) - d(col("w")) / d(col("wt"))) *
          (lit(1.0) - d(col("w")) / d(col("wt"))) /
          (d(col("ng")) - lit(1.0)), 9).cast("decimal(28,9)").as("lam_t"))
    val agg = joined.groupBy("k", "n", "n_degen")
      .agg(sum(col("num_t")).as("snum"), sum(col("lam_t")).as("slam"))
    val k = d(col("k"))
    val lam = d(col("slam"))
    val w = (d(col("snum")) / (k - lit(1.0))) /
      (lit(1.0) + lit(2.0) * (k - lit(2.0)) / (k * k - lit(1.0)) * lam)
    val df2 = (k * k - lit(1.0)) / (lit(3.0) * lam)
    val critArr = array(chiCrit95.map(lit): _*)
    agg.select(col("n").cast("long").as("n"), col("k").as("k_groups"),
      when(col("n_degen") === 0, round(w, 4)).as("w_stat"),
      when(col("n_degen") === 0 && lam > 0, round(df2, 2)).as("df2"),
      when(col("n_degen") === 0 && col("k") >= 2 && col("k") <= 15,
        w * (k - lit(1.0)) >
          element_at(critArr, (col("k") - 1).cast("int"))).as("reject_95"))
  }

  /** DuckDB mirror of [[welchAnova]]. */
  def welchAnovaSql(tbl: String, groupCol: String, valCol: String): String = {
    val critList = chiCrit95.mkString("[", ", ", "]")
    s"""WITH byg AS (SELECT $groupCol AS g, COUNT(*) AS ng,
           SUM(CAST($valCol AS DECIMAL(18,6))) AS sx,
           SUM(CAST($valCol AS DECIMAL(18,6)) * CAST($valCol AS DECIMAL(18,6))) AS sxx
         FROM $tbl GROUP BY 1 HAVING COUNT(*) >= 2),
       t1 AS (SELECT ng,
           CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               / CAST(ng AS DOUBLE)) / (CAST(ng AS DOUBLE) - 1.0) > 0
             THEN CAST(round(CAST(ng AS DOUBLE)
               / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(ng AS DOUBLE)) / (CAST(ng AS DOUBLE) - 1.0)), 9)
               AS DECIMAL(28,9)) END AS w,
           CAST(sx AS DOUBLE) / CAST(ng AS DOUBLE) AS m
         FROM byg),
       wm AS (SELECT ng, w, m,
           CAST(round(CAST(w AS DOUBLE) * m, 9) AS DECIMAL(38,9)) AS wmv
         FROM t1),
       tot AS (SELECT SUM(w) AS wt, SUM(wmv) AS wmt, COUNT(*) AS k,
           CAST(SUM(ng) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_degen
         FROM wm),
       j AS (SELECT k, n, n_degen, wt,
           CAST(round(CAST(w AS DOUBLE)
             * (m - CAST(wmt AS DOUBLE) / CAST(wt AS DOUBLE))
             * (m - CAST(wmt AS DOUBLE) / CAST(wt AS DOUBLE)), 9)
             AS DECIMAL(38,9)) AS num_t,
           CAST(round((1.0 - CAST(w AS DOUBLE) / CAST(wt AS DOUBLE))
             * (1.0 - CAST(w AS DOUBLE) / CAST(wt AS DOUBLE))
             / (CAST(ng AS DOUBLE) - 1.0), 9) AS DECIMAL(28,9)) AS lam_t
         FROM wm CROSS JOIN tot),
       agg AS (SELECT k, n, n_degen, SUM(num_t) AS snum, SUM(lam_t) AS slam
         FROM j GROUP BY 1, 2, 3),
       f AS (SELECT n, k, n_degen, CAST(slam AS DOUBLE) AS lam,
           (CAST(snum AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
             / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
                / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                * CAST(slam AS DOUBLE)) AS w,
           (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
             / (3.0 * CAST(slam AS DOUBLE)) AS df2
         FROM agg)
       SELECT n, k AS k_groups,
         CASE WHEN n_degen = 0 THEN round(w, 4) END AS w_stat,
         CASE WHEN n_degen = 0 AND lam > 0 THEN round(df2, 2) END AS df2,
         CASE WHEN n_degen = 0 AND k >= 2 AND k <= 15
           THEN w * (CAST(k AS DOUBLE) - 1.0) > ($critList)[CAST(k AS INT) - 1]
           END AS reject_95
       FROM f"""
  }

  /** Studentized-range upper 5% critical values q(k, ∞) for k = 2..10
    * treatments (Harter 1960 tables, df → ∞ row) — the fixed-shape lookup
    * [[tukeyHsd]] compares against; finite-df corrections only push the
    * bar UP, so at corpus group sizes the ∞ row is the honest constant.
    */
  private val qCrit95Inf = Seq(2.772, 3.314, 3.633, 3.858, 4.030, 4.170,
    4.286, 4.387, 4.474)

  /** Tukey-Kramer HSD post-hoc (Tukey 1949): WHICH group pairs differ,
    * once [[oneWay]] says some pair does — every pairwise mean contrast
    * against the studentized range, with the family-wise error held at
    * 5% (running k² two-sample t-tests instead inflates it badly).
    * q = |m_i − m_j| / √(MSW/2 · (1/n_i + 1/n_j)), the Kramer form for
    * unequal n.
    *
    * One scan for group moments; the pair layer is a k²-bounded
    * self-join of the group relation (never of rows). MSW derives from
    * the same DECIMAL fold as [[oneWay]].
    */
  def tukeyHsd(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val byG = Dedup.parallelize(df)
      .select(col(groupCol).as("g"), col(valCol).cast("decimal(18,6)").as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val withBt = byG.select(col("g"), col("ng"), col("sx"),
      col("sxx"), round(d(col("sx")) * d(col("sx")) / d(col("ng")), 6)
        .cast("decimal(38,6)").as("bt"))
    val msw = withBt.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
        sum(col("sxx")).as("ss"), sum(col("bt")).as("sbt"))
      .select(col("k"),
        ((d(col("ss")) - d(col("sbt"))) / (d(col("n")) - d(col("k"))))
          .as("msw"))
    val a = withBt.select(col("g").as("g_a"), col("ng").as("na"),
      (d(col("sx")) / d(col("ng"))).as("ma"))
    val b = withBt.select(col("g").as("g_b"), col("ng").as("nb"),
      (d(col("sx")) / d(col("ng"))).as("mb"))
    val critArr = array(qCrit95Inf.map(lit): _*)
    val q = abs(col("ma") - col("mb")) /
      sqrt(col("msw") / lit(2.0) *
        (lit(1.0) / d(col("na")) + lit(1.0) / d(col("nb"))))
    a.join(b, col("g_a") < col("g_b"))
      .crossJoin(broadcast(msw))
      .select(col("g_a"), col("g_b"),
        round(col("ma") - col("mb"), 4).as("mean_diff"),
        when(col("msw") > 0, round(q, 4)).as("q_stat"),
        when(col("msw") > 0 && col("k") >= 2 && col("k") <= 10,
          q > element_at(critArr, (col("k") - 1).cast("int")))
          .as("significant_95"))
      .orderBy("g_a", "g_b")
  }

  /** DuckDB mirror of [[tukeyHsd]]. */
  def tukeyHsdSql(tbl: String, groupCol: String, valCol: String): String = {
    val critList = qCrit95Inf.mkString("[", ", ", "]")
    s"""WITH byg AS (SELECT $groupCol AS g, COUNT(*) AS ng,
           SUM(CAST($valCol AS DECIMAL(18,6))) AS sx,
           SUM(CAST($valCol AS DECIMAL(18,6)) * CAST($valCol AS DECIMAL(18,6))) AS sxx
         FROM $tbl GROUP BY 1),
       wb AS (SELECT g, ng, sx, sxx,
           CAST(round(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             / CAST(ng AS DOUBLE), 6) AS DECIMAL(38,6)) AS bt
         FROM byg),
       msw AS (SELECT COUNT(*) AS k,
           (CAST(SUM(sxx) AS DOUBLE) - CAST(SUM(bt) AS DOUBLE))
             / (CAST(SUM(ng) AS DOUBLE) - COUNT(*)) AS msw
         FROM wb),
       pairs AS (SELECT a.g AS g_a, b.g AS g_b,
           a.ng AS na, b.ng AS nb,
           CAST(a.sx AS DOUBLE) / a.ng AS ma,
           CAST(b.sx AS DOUBLE) / b.ng AS mb
         FROM wb a JOIN wb b ON a.g < b.g),
       f AS (SELECT g_a, g_b, ma, mb, k, msw,
           abs(ma - mb) / sqrt(msw / 2.0
             * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))) AS q
         FROM pairs CROSS JOIN msw)
       SELECT g_a, g_b, round(ma - mb, 4) AS mean_diff,
         CASE WHEN msw > 0 THEN round(q, 4) END AS q_stat,
         CASE WHEN msw > 0 AND k >= 2 AND k <= 10
           THEN q > ($critList)[CAST(k AS INT) - 1] END AS significant_95
       FROM f ORDER BY g_a, g_b"""
  }

  /** χ²(df) upper 5% critical values, df = 1..14 (Abramowitz & Stegun
    * table 26.8) — the same fixed-shape lookup the Friedman test uses.
    */
  private val chiCrit95 = Seq(3.841, 5.991, 7.815, 9.488, 11.070, 12.592,
    14.067, 15.507, 16.919, 18.307, 19.675, 21.026, 22.362, 23.685)

  /** Kruskal–Wallis H (Kruskal & Wallis 1952): the rank-based one-way
    * ANOVA — "does any source's length DISTRIBUTION sit higher than the
    * others" without [[oneWay]]'s normality assumption, so a heavy-tailed
    * source can't fake or mask a mean shift. Reported raw and
    * tie-corrected (H/C, C = 1 − Σ(t³−t)/(N³−N)).
    *
    * Rank arithmetic stays INTEGER in doubled ranks: the corpus collapses
    * to the distinct-value relation (value → per-group counts), a
    * cumulative window over it yields 2·avgrank = 2·cumBefore + t + 1,
    * and group rank sums fold back through the (value × group) relation —
    * the [[graft.operators.EventSeq.mannWhitney]] histogram discipline
    * generalized to k groups. No per-row rank window ever runs.
    */
  def kruskalWallis(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val vals = Dedup.parallelize(df).select(col(groupCol).as("g"),
      col(valCol).cast("decimal(18,6)").as("x"))
    val byXG = vals.groupBy("x", "g").agg(count(lit(1)).as("c"))
    val byX = byXG.groupBy("x").agg(sum(col("c")).as("t"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("x")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = byX
      .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      .select(col("x"), col("t"), (col("cum") * 2 + col("t") + 1).as("r2"))
    val byG = byXG.join(ranked.select("x", "r2"), Seq("x"))
      .groupBy("g").agg(sum(col("c")).as("ng"),
        sum((col("c") * col("r2")).cast("decimal(38,0)")).as("rsum2"))
    val terms = byG.select(col("ng"),
      round(d(col("rsum2")) * d(col("rsum2")) / (lit(4.0) * d(col("ng"))), 6)
        .cast("decimal(38,6)").as("tt"))
    val tie = ranked.agg(
      sum(col("t") * col("t") * col("t") - col("t")).as("tie3"),
      sum(col("t")).as("n"))
    val agg = terms.agg(count(lit(1)).as("k"), sum(col("tt")).as("st"))
    val n = d(col("n"))
    val k = d(col("k"))
    val h = lit(12.0) / (n * (n + lit(1.0))) * d(col("st")) -
      lit(3.0) * (n + lit(1.0))
    val corr = lit(1.0) - d(col("tie3")) / (n * n * n - n)
    val critArr = array(chiCrit95.map(lit): _*)
    agg.crossJoin(broadcast(tie))
      .select(col("n").cast("long").as("n"), col("k").as("k_groups"),
        round(h, 4).as("h"),
        when(corr > 0, round(h / corr, 4)).as("h_tied"),
        when(corr > 0 && col("k") >= 2 && col("k") <= 15,
          h / corr > element_at(critArr, (col("k") - 1).cast("int")))
          .as("reject_95"))
  }

  /** DuckDB mirror of [[kruskalWallis]]. */
  def kruskalWallisSql(tbl: String, groupCol: String, valCol: String): String = {
    val critList = chiCrit95.mkString("[", ", ", "]")
    s"""WITH vals AS (SELECT $groupCol AS g, CAST($valCol AS DECIMAL(18,6)) AS x
           FROM $tbl),
       byxg AS (SELECT x, g, COUNT(*) AS c FROM vals GROUP BY 1, 2),
       byx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS t FROM byxg GROUP BY x),
       ranked AS (SELECT x, t,
           COALESCE(SUM(t) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2 + t + 1 AS r2
         FROM byx),
       byg AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
           SUM(CAST(c * r2 AS DECIMAL(38,0))) AS rsum2
         FROM byxg JOIN ranked USING (x) GROUP BY g),
       terms AS (SELECT ng,
           CAST(round(CAST(rsum2 AS DOUBLE) * CAST(rsum2 AS DOUBLE)
             / (4.0 * CAST(ng AS DOUBLE)), 6) AS DECIMAL(38,6)) AS tt
         FROM byg),
       tie AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3,
           CAST(SUM(t) AS BIGINT) AS n FROM ranked),
       agg AS (SELECT COUNT(*) AS k, SUM(tt) AS st FROM terms),
       f AS (SELECT n, k,
           12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
             * CAST(st AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0) AS h,
           1.0 - CAST(tie3 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                - CAST(n AS DOUBLE)) AS corr
         FROM agg CROSS JOIN tie)
       SELECT n, k AS k_groups, round(h, 4) AS h,
         CASE WHEN corr > 0 THEN round(h / corr, 4) END AS h_tied,
         CASE WHEN corr > 0 AND k >= 2 AND k <= 15
           THEN h / corr > ($critList)[CAST(k AS INT) - 1] END AS reject_95
       FROM f"""
  }

  private def anovaSql(valsSql: String): String =
    s"""WITH vals AS ($valsSql),
       byg AS (SELECT g, COUNT(*) AS ng, SUM(x) AS sx, SUM(x * x) AS sxx
         FROM vals GROUP BY g),
       terms AS (SELECT ng, sx, sxx,
           CAST(round(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(ng AS DOUBLE), 6)
             AS DECIMAL(38,6)) AS bt
         FROM byg),
       agg AS (SELECT CAST(SUM(ng) AS BIGINT) AS n, COUNT(*) AS k,
           SUM(sx) AS s, SUM(sxx) AS ss, SUM(bt) AS sbt FROM terms),
       f AS (SELECT n, k,
           CAST(sbt AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS ssb,
           CAST(ss AS DOUBLE) - CAST(sbt AS DOUBLE) AS ssw
         FROM agg)
       SELECT n, k AS k_groups,
         round(ssb, 4) AS ss_between,
         round(ssw, 4) AS ss_within,
         CASE WHEN ssw > 0 AND k > 1 AND n > k
           THEN round((ssb / (CAST(k AS DOUBLE) - 1.0))
             / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 4) END AS f_stat,
         CASE WHEN ssb + ssw > 0
           THEN round(ssb / (ssb + ssw), 6) END AS eta_sq
       FROM f"""
}
