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
