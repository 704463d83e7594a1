package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based association between corpus signals.
  *
  * Spearman's ρ answers "do these two quality signals agree on the ORDERING
  * of documents?" — the question behind consolidating redundant gates (two
  * signals at ρ ≈ 1 ⇒ one is dead weight) and sanity-checking a new scorer
  * against an established one, without assuming linearity the way Pearson
  * does.
  */
object Correlation {

  /** Spearman rank correlation between two numeric expressions, with the
    * statistically correct AVERAGE (fractional) rank for ties.
    *
    * Shape (the [[Audit.scoreAuc]] discipline): each signal collapses to
    * its distinct-value TYPE relation with per-value counts — one hash agg
    * — and the average rank is a cumulative window over that bounded
    * relation: avg_rank×2 = 2·(count below) + (count at) + 1, an INTEGER.
    * Ranks join back value-keyed (hash join, corpus scans once per
    * signal); every Pearson moment over the ×2 ranks is an integer summed
    * through DECIMAL(38,0) — exact under any partition order, the ×2
    * cancels between numerator and denominator. One double formula at the
    * end, round(6).
    *
    * Output: one row (n, rho).
    */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("double").as("_sp_x"), y.cast("double").as("_sp_y"))
    def rank2(vCol: String): DataFrame = {
      val w = Window.orderBy(vCol).rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(col(vCol)).agg(count(lit(1)).as("_sp_c"))
        .select(col(vCol),
          (coalesce(sum(col("_sp_c")).over(w), lit(0L)) * 2 + col("_sp_c") + 1)
            .as(s"${vCol}_r2"))
    }
    val ranked = base
      .join(rank2("_sp_x"), "_sp_x")
      .join(rank2("_sp_y"), "_sp_y")
    def s(c: Column): Column = sum(c.cast("decimal(38,0)")).cast("double")
    ranked.agg(
        count(lit(1)).as("n"),
        s(col("_sp_x_r2")).as("_sx"), s(col("_sp_y_r2")).as("_sy"),
        s(col("_sp_x_r2") * col("_sp_y_r2")).as("_sxy"),
        s(col("_sp_x_r2") * col("_sp_x_r2")).as("_sxx"),
        s(col("_sp_y_r2") * col("_sp_y_r2")).as("_syy"))
      .select(col("n"),
        // a constant signal has no ranking: NULL, not 0/0
        when((col("n") * col("_sxx") - col("_sx") * col("_sx")) > 0 &&
             (col("n") * col("_syy") - col("_sy") * col("_sy")) > 0,
          round((col("n") * col("_sxy") - col("_sx") * col("_sy")) /
            sqrt((col("n") * col("_sxx") - col("_sx") * col("_sx")) *
                 (col("n") * col("_syy") - col("_sy") * col("_sy"))), 6))
          .as("rho"))
  }

  /** DuckDB mirror of [[spearman]]. `xySql` yields columns (x, y). */
  def spearmanSql(xySql: String): String =
    s"""WITH base AS (SELECT CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y FROM ($xySql)),
       rx AS (SELECT x, COALESCE(SUM(c) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2 + c + 1 AS xr2
              FROM (SELECT x, COUNT(*) AS c FROM base GROUP BY x)),
       ry AS (SELECT y, COALESCE(SUM(c) OVER (ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2 + c + 1 AS yr2
              FROM (SELECT y, COUNT(*) AS c FROM base GROUP BY y)),
       r AS (SELECT xr2, yr2 FROM base JOIN rx USING (x) JOIN ry USING (y)),
       a AS (SELECT COUNT(*) AS n,
               CAST(SUM(CAST(xr2 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(yr2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(xr2 * yr2 AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(xr2 * xr2 AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(yr2 * yr2 AS DECIMAL(38,0))) AS DOUBLE) AS syy
             FROM r)
       SELECT n,
         CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
           round((n * sxy - sx * sy) /
             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         END AS rho
       FROM a"""
}
