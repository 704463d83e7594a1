package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over the event stream: the Kaplan–Meier estimator
  * with RIGHT-CENSORING, applied to inter-event gaps — "what fraction of
  * waiting periods survive past t hours without the next event?" This is
  * the bias-corrected companion of [[Temporal.gapQuantiles]]: plain gap
  * quantiles silently DROP every user's final open gap (the wait that
  * hadn't ended when the corpus did), which biases the distribution
  * short exactly when engagement is decaying; KM counts those open gaps
  * as censored observations in the risk set.
  *
  * Model: each consecutive-event gap is a complete observation at
  * t = ⌊gap/bucket⌋; each user's last-event→corpus-end wait is a CENSORED
  * observation at its floored duration. KM over distinct complete-gap
  * times t ascending: S(t) = Π_{u ≤ t} (1 − d_u / n_u), n_u = gaps with
  * observed duration ≥ u (at risk), d_u = completed gaps at u.
  *
  * Cross-engine exactness: d and n are integers; each factor (1 − d/n)
  * is one double division → round 6; its ln → round 6; the running
  * product is exp of the DECIMAL-exact cumulative sum of the rounded
  * logs (cumulative window sums are order-fixed in both engines, DECIMAL
  * addition is exact) → round 6.
  *
  * Plan shape: one lag window per user (the gapQuantiles shuffle), then
  * everything lives on the bucketed duration relation (≤ span/bucket
  * rows): risk counts via a reverse cumulative sum, bounded windows.
  */
object Survival {

  def kmGapSurvival(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "kmGapSurvival: bucketSeconds > 0")
    // order by the FULL-precision ts (the gapQuantiles convention) — the
    // epoch-ms projection would reorder sub-millisecond ties
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val span = df.agg(max(unix_millis(col(tsCol))).as("tmax"))
    val gaps = df
      .select(col(userCol), col(tsCol), unix_millis(col(tsCol)).as("ms"),
        col(idCol))
      .withColumn("_km_next", lead(col("ms"), 1).over(w))
      .crossJoin(broadcast(span))
      .select(
        (when(col("_km_next").isNotNull, col("_km_next"))
          .otherwise(col("tmax")) - col("ms")).as("gap_ms"),
        col("_km_next").isNull.as("censored"))
      // integer DIV (not double /): a quotient one ulp under an integer
      // would truncate differently from the oracle's exact BIGINT //
      .select(expr(s"gap_ms DIV ${bucketSeconds * 1000L}").as("t"),
        col("censored"))
    val byT = gaps.groupBy("t")
      .agg(count(lit(1)).as("n_obs"),
        sum(when(!col("censored"), 1L).otherwise(0L)).as("d_done"))
    val wRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT.withColumn("n_risk", sum(col("n_obs")).over(wRisk))
      .where(col("d_done") > 0)
    val factor = round(lit(1.0) -
      col("d_done").cast("double") / col("n_risk").cast("double"), 6)
    risk
      .withColumn("factor", factor)
      // terminal step: when every at-risk gap completes (d == n) the
      // factor is 0 and S drops to 0 — ln is undefined there, so the
      // zero rides a cumulative-min flag instead of the log chain
      .withColumn("_km_lf", when(col("factor") > 0,
        round(log(col("factor")), 6)).otherwise(lit(0.0)))
      .withColumn("_km_zero", min(col("factor")).over(wCum))
      .withColumn("survival", when(col("_km_zero") === 0, lit(0.0))
        .otherwise(round(exp(sum(col("_km_lf").cast("decimal(18,6)"))
          .over(wCum).cast("double")), 6)))
      .select(col("t").as("t_buckets"), col("n_risk"), col("d_done"),
        col("factor"), col("survival"))
      .orderBy("t_buckets")
  }

  /** DuckDB mirror of [[kmGapSurvival]]. */
  def kmGapSurvivalSql(tbl: String, userCol: String, tsCol: String,
      idCol: String, bucketSeconds: Long = 3600L): String =
    s"""WITH sp AS (SELECT MAX(epoch_ms($tsCol)) AS tmax FROM $tbl),
       g AS (SELECT
           COALESCE(lead(epoch_ms($tsCol), 1) OVER (PARTITION BY $userCol
             ORDER BY $tsCol, $idCol), tmax) - epoch_ms($tsCol) AS gap_ms,
           lead(epoch_ms($tsCol), 1) OVER (PARTITION BY $userCol
             ORDER BY $tsCol, $idCol) IS NULL AS censored
         FROM $tbl CROSS JOIN sp),
       b AS (SELECT CAST(gap_ms // ${bucketSeconds * 1000L} AS BIGINT) AS t,
           censored FROM g),
       byt AS (SELECT t, COUNT(*) AS n_obs,
           CAST(SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d_done
         FROM b GROUP BY t),
       risk AS (SELECT t, d_done,
           CAST(SUM(n_obs) OVER (ORDER BY t DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk
         FROM byt),
       f AS (SELECT t, n_risk, d_done,
           round(CAST(1.0 AS DOUBLE)
             - CAST(d_done AS DOUBLE) / CAST(n_risk AS DOUBLE), 6) AS factor
         FROM risk WHERE d_done > 0),
       l AS (SELECT *, CASE WHEN factor > 0
             THEN CAST(round(ln(factor), 6) AS DECIMAL(18,6))
             ELSE CAST(0 AS DECIMAL(18,6)) END AS lf FROM f)
       SELECT t AS t_buckets, n_risk, d_done, factor,
         CASE WHEN MIN(factor) OVER (ORDER BY t ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0 THEN 0.0
           ELSE round(exp(CAST(SUM(lf) OVER (ORDER BY t ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)
           END AS survival
       FROM l ORDER BY t_buckets"""
}
