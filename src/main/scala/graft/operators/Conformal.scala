package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Vovk's inductive conformal
  * construction; Lei et al., JASA 2018 exposition): hold out a calibration
  * half, fit the trivially-exchangeable predictor (the per-group
  * calibration mean), take the ceil((n+1)(1−α))-th smallest absolute
  * calibration residual as the radius q̂, and the interval mean ± q̂ then
  * covers a fresh exchangeable point with probability ≥ 1−α — a
  * finite-sample, distribution-free guarantee. The readout every model-based
  * data-quality gate (perplexity bands, score thresholds) should carry: not
  * "the score is 0.7" but "the 90% band is this wide, and here is its
  * realized coverage on the held-out half".
  *
  * Determinism/exactness discipline (the [[Cuped]] / [[Drift.ksDrift]]
  * contract): the calibration/eval split is the salted-md5 parity of the id
  * column; calibration sums are DECIMAL-exact so the group mean is one
  * fixed double expression; residuals are rounded to 6 dp BEFORE ranking
  * and coverage comparison, so the order statistic and the ≤ q̂ test
  * evaluate on identical values in both engines.
  *
  * Scale shape: one scan splits the halves; per-group DECIMAL mean (map-side
  * partials over a type-table-bounded group count) broadcasts back; the
  * order statistic is a window partitioned BY GROUP over calibration rows
  * only (per-group sort, never a global one); coverage is a second
  * broadcast-join scan. No self-joins, no collect.
  */
object Conformal {

  /** One row per group: calibration/eval sizes, the conformal radius
    * `qhat` at level `alpha`, the interval width, and the realized coverage
    * of mean ± q̂ on the eval half.
    *
    * k = ceil((1−α)(n_cal+1)) clamped to n_cal (the standard finite-sample
    * index; the clamp means tiny groups degrade to the max residual rather
    * than an undefined +∞ radius).
    */
  def intervals(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, alpha: Double = 0.1, salt: String = "conf"): DataFrame = {
    val half = (conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("half")
    val base = df.select(col(groupCol).as("g"), half,
      col(valCol).cast("decimal(18,6)").as("v"))
    val stats = base.where(col("half") === 0)
      .groupBy("g")
      .agg(sum(col("v")).as("sx"), count(lit(1)).as("n_cal"))
      .withColumn("mean", col("sx").cast("double") / col("n_cal").cast("double"))
    val cal = base.where(col("half") === 0)
      .join(broadcast(stats), "g")
      .withColumn("r", round(abs(col("v").cast("double") - col("mean")), 6))
    val w = Window.partitionBy("g").orderBy("r")
    val k = least(ceil(lit(1.0 - alpha) * (col("n_cal") + lit(1)).cast("double"))
      .cast("bigint"), col("n_cal"))
    val qhat = cal
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === k)
      .groupBy("g").agg(min(col("r")).as("qhat"))
    val eval_ = base.where(col("half") === 1)
      .join(broadcast(stats.select("g", "mean")), "g")
      .join(broadcast(qhat), "g")
      .groupBy("g")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(round(abs(col("v").cast("double") - col("mean")), 6)
          <= col("qhat"), 1L).otherwise(0L)).as("covered"))
    stats.select(col("g"), col("n_cal"), round(col("mean"), 6).as("mean"))
      .join(qhat, "g")
      .join(eval_, "g")
      .select(col("g").as(groupCol), col("n_cal"), col("n_eval"),
        col("mean"), col("qhat"),
        round(col("qhat") * 2.0, 6).as("width"),
        round(col("covered").cast("double") / col("n_eval").cast("double"), 6)
          .as("coverage"))
  }

  /** DuckDB mirror of [[intervals]]. */
  def intervalsSql(tbl: String, groupCol: String, idCol: String,
      valCol: String, alpha: Double = 0.1, salt: String = "conf"): String =
    s"""WITH base AS (SELECT $groupCol AS g,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($idCol AS VARCHAR)),1,2) AS INT) % 2 AS half,
           CAST($valCol AS DECIMAL(18,6)) AS v
         FROM $tbl),
       stats AS (SELECT g, SUM(v) AS sx, COUNT(*) AS n_cal,
           CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean
         FROM base WHERE half = 0 GROUP BY g),
       cal AS (SELECT base.g, round(abs(CAST(v AS DOUBLE) - mean), 6) AS r, n_cal
         FROM base JOIN stats ON base.g = stats.g WHERE half = 0),
       ranked AS (SELECT g, r, n_cal,
           row_number() OVER (PARTITION BY g ORDER BY r) AS rn
         FROM cal),
       qh AS (SELECT g, MIN(r) AS qhat FROM ranked
         WHERE rn = least(CAST(ceil(${1.0 - alpha} * CAST(n_cal + 1 AS DOUBLE)) AS BIGINT), n_cal)
         GROUP BY g),
       ev AS (SELECT base.g, COUNT(*) AS n_eval,
           CAST(SUM(CASE WHEN round(abs(CAST(v AS DOUBLE) - mean), 6) <= qhat
             THEN 1 ELSE 0 END) AS BIGINT) AS covered
         FROM base JOIN stats ON base.g = stats.g JOIN qh ON base.g = qh.g
         WHERE half = 1 GROUP BY base.g)
       SELECT stats.g AS $groupCol, n_cal, n_eval, round(mean, 6) AS mean, qhat,
         round(qhat * 2.0, 6) AS width,
         round(CAST(covered AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS coverage
       FROM stats JOIN qh ON stats.g = qh.g JOIN ev ON stats.g = ev.g"""
}
