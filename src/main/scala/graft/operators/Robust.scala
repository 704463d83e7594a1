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
