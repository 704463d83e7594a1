package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier gating via median absolute deviation — the
  * filter a value-quality gate actually wants at 100 TB: mean/stddev are
  * themselves dragged by the outliers they're meant to catch; the median
  * and MAD have a 50% breakdown point. A value is flagged when
  * `|v − med| > k·MAD` with k = 3·1.4826 (1.4826 scales MAD to σ under
  * normality, so "3 sigma" keeps its usual meaning).
  *
  * Plan shape: two group-aggregation passes (median, then MAD of the
  * deviations) with the tiny per-group stats broadcast back onto the fact
  * scan each time — the facts are never shuffled; the `value_bands`
  * pattern applied twice. Both medians round to 4 (the percentiles-query
  * convention masking interpolation ulps), so the gate compare is
  * deterministic in both engines.
  */
object Robust {

  val DefaultK: Double = 3.0 * 1.4826

  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = DefaultK): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 4).as("med"))
    val withDev = df
      .select(col(groupCol), col(valueCol).cast("double").as("_mo_v"))
      .join(broadcast(med), groupCol)
      .withColumn("_mo_dev", abs(col("_mo_v") - col("med")))
    val mad = withDev.groupBy(groupCol)
      .agg(round(expr("percentile(_mo_dev, 0.5)"), 4).as("_mo_mad"))
    withDev
      .join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(when(col("_mo_dev") > lit(k) * col("_mo_mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        max(col("med")).as("med"),
        max(col("_mo_mad")).as("mad"))
  }

  /** Tukey boxplot fences per group (Tukey 1977): inner (1.5·IQR) and
    * outer (3·IQR) outlier counts on each side. The quartile-based
    * complement to [[madOutliers]] — the IQR rule is what every boxplot
    * and most data-quality dashboards mean by "outlier", it's asymmetric
    * (distinguishes a heavy RIGHT tail from a heavy left one), and it
    * degrades differently under skew than the symmetric MAD gate. Both
    * ship so a pipeline can report the number its consumers expect.
    *
    * Same two-pass value_bands shape: exact q1/q3 (rounded 4) broadcast,
    * then one counting scan. Swap the percentile for the histogram sketch
    * at petabyte group sizes; folds unchanged.
    */
  def tukeyFences(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    def d(c: Column) = c.cast("double")
    val q = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, array(0.25, 0.75))").as("_q"))
      .select(col(groupCol), round(col("_q").getItem(0), 4).as("q1"),
        round(col("_q").getItem(1), 4).as("q3"))
    val iqr = col("q3") - col("q1")
    df.select(col(groupCol), d(col(valueCol)).as("_tf_v"))
      .join(broadcast(q), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        max(round(iqr, 4)).as("iqr"),
        sum(when(col("_tf_v") < col("q1") - lit(1.5) * iqr, 1L).otherwise(0L))
          .as("n_low"),
        sum(when(col("_tf_v") > col("q3") + lit(1.5) * iqr, 1L).otherwise(0L))
          .as("n_high"),
        sum(when(col("_tf_v") < col("q1") - lit(3.0) * iqr, 1L).otherwise(0L))
          .as("n_low_far"),
        sum(when(col("_tf_v") > col("q3") + lit(3.0) * iqr, 1L).otherwise(0L))
          .as("n_high_far"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[tukeyFences]]. */
  def tukeyFencesSql(tbl: String, groupCol: String,
      valueCol: String): String =
    s"""WITH q AS (SELECT $groupCol,
           round(quantile_cont(CAST($valueCol AS DOUBLE), 0.25), 4) AS q1,
           round(quantile_cont(CAST($valueCol AS DOUBLE), 0.75), 4) AS q3
         FROM $tbl GROUP BY 1)
       SELECT t.$groupCol, COUNT(*) AS n,
         MAX(round(q3 - q1, 4)) AS iqr,
         CAST(SUM(CASE WHEN CAST($valueCol AS DOUBLE) < q1 - 1.5 * (q3 - q1)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
         CAST(SUM(CASE WHEN CAST($valueCol AS DOUBLE) > q3 + 1.5 * (q3 - q1)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
         CAST(SUM(CASE WHEN CAST($valueCol AS DOUBLE) < q1 - 3.0 * (q3 - q1)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_low_far,
         CAST(SUM(CASE WHEN CAST($valueCol AS DOUBLE) > q3 + 3.0 * (q3 - q1)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_high_far
       FROM $tbl t JOIN q USING ($groupCol)
       GROUP BY t.$groupCol ORDER BY t.$groupCol"""

  /** Jarque–Bera normality test (Jarque & Bera 1980) per group: skewness
    * and excess kurtosis from exact central moments, combined as
    * JB = n/6·(S² + (K−3)²/4) ~ χ²(2) under normality. The gate that says
    * whether a t/z readout (value A/B tests, CUPED, diff-in-diff) can
    * lean on its normal approximation for THIS metric, per segment.
    *
    * Two passes: per-group (n, Σx) in DECIMAL gives an exact-derived mean
    * broadcast back; the deviation powers d², d³, d⁴ round to 6 and fold
    * as DECIMAL(38,6) — partition-order-immune, one fixed double shape at
    * the end. Group-bounded output.
    */
  def jarqueBera(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.Column
    def d(c: Column) = c.cast("double")
    val base = Dedup.parallelize(df).select(col(groupCol).as("g"),
      col(valueCol).cast("decimal(18,6)").as("x"))
    val mean = base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .select(col("g"), col("n"), (d(col("sx")) / d(col("n"))).as("m"))
    val dev = base.join(broadcast(mean), "g")
      .withColumn("dv", d(col("x")) - col("m"))
    val mom = dev.groupBy("g")
      .agg(max(col("n")).as("n"),
        sum(round(col("dv") * col("dv"), 6).cast("decimal(38,6)")).as("s2"),
        sum(round(col("dv") * col("dv") * col("dv"), 6)
          .cast("decimal(38,6)")).as("s3"),
        sum(round(col("dv") * col("dv") * col("dv") * col("dv"), 6)
          .cast("decimal(38,6)")).as("s4"))
    val n = d(col("n"))
    val m2 = d(col("s2")) / n
    val m3 = d(col("s3")) / n
    val m4 = d(col("s4")) / n
    val skew = m3 / pow(m2, 1.5)
    val kurt = m4 / (m2 * m2)
    val jb = n / lit(6.0) * (skew * skew +
      (kurt - lit(3.0)) * (kurt - lit(3.0)) / lit(4.0))
    mom.where(col("s2") > 0)
      .select(col("g").as(groupCol), col("n"),
        round(skew, 4).as("skewness"),
        round(kurt, 4).as("kurtosis"),
        round(jb, 4).as("jb"),
        (jb > 5.991).as("reject_95"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[jarqueBera]]. */
  def jarqueBeraSql(tbl: String, groupCol: String, valueCol: String): String =
    s"""WITH base AS (SELECT $groupCol AS g, CAST($valueCol AS DECIMAL(18,6)) AS x
           FROM $tbl),
       mn AS (SELECT g, COUNT(*) AS n,
           CAST(SUM(x) AS DOUBLE) / COUNT(*) AS m FROM base GROUP BY g),
       dev AS (SELECT base.g, n, CAST(x AS DOUBLE) - m AS dv
         FROM base JOIN mn USING (g)),
       mom AS (SELECT g, MAX(n) AS n,
           SUM(CAST(round(dv * dv, 6) AS DECIMAL(38,6))) AS s2,
           SUM(CAST(round(dv * dv * dv, 6) AS DECIMAL(38,6))) AS s3,
           SUM(CAST(round(dv * dv * dv * dv, 6) AS DECIMAL(38,6))) AS s4
         FROM dev GROUP BY g),
       f AS (SELECT g, n,
           CAST(s3 AS DOUBLE) / n / pow(CAST(s2 AS DOUBLE) / n, 1.5) AS skew,
           (CAST(s4 AS DOUBLE) / n)
             / ((CAST(s2 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)) AS kurt
         FROM mom WHERE s2 > 0),
       jbq AS (SELECT g, n, skew, kurt,
           CAST(n AS DOUBLE) / 6.0
             * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jb
         FROM f)
       SELECT g AS $groupCol, n, round(skew, 4) AS skewness,
         round(kurt, 4) AS kurtosis, round(jb, 4) AS jb,
         jb > 5.991 AS reject_95
       FROM jbq ORDER BY $groupCol"""

  /** DuckDB mirror — same k interpolated, same rounding points. */
  def madOutliersSql(table: String, groupCol: String, valueCol: String,
      k: Double = DefaultK): String =
    s"""WITH med AS (SELECT $groupCol, round(quantile_cont($valueCol, 0.5), 4) AS med
           FROM $table GROUP BY 1),
       d AS (SELECT t.$groupCol, med,
             abs(CAST($valueCol AS DOUBLE) - med) AS dev
           FROM $table t JOIN med USING ($groupCol)),
       mad AS (SELECT $groupCol, round(quantile_cont(dev, 0.5), 4) AS mad
           FROM d GROUP BY 1)
       SELECT d.$groupCol, COUNT(*) AS n,
         CAST(SUM(CASE WHEN dev > $k * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         MAX(med) AS med, MAX(mad) AS mad
       FROM d JOIN mad USING ($groupCol)
       GROUP BY d.$groupCol ORDER BY d.$groupCol"""
}
