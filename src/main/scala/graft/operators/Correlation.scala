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

  /** Rank-Biased Overlap (Webber et al. 2010), truncated at `depth`:
    * top-weighted agreement between two document rankings — the IR-native
    * complement of [[spearman]] (which weights every rank equally; two
    * quality scorers that agree on the head but scramble the tail should
    * read as "interchangeable for top-k curation", and RBO is the metric
    * that says so). RBO = (1−p)·Σ_{d≤D} p^{d−1}·|A_d ∩ B_d|/d.
    *
    * Scale contract: only the top-`depth` of each ranking is ever
    * materialized (TakeOrderedAndProject — no global rank window); the
    * depth sweep is an explode over a ≤2·depth-row relation. The geometric
    * weights (1−p)·p^{d−1} are computed ONCE in Scala and interpolated
    * into both engines as literals (two independent pow() chains could
    * split by an ulp); per-depth terms round to 9 and sum through DECIMAL.
    *
    * Output: one row (depth, overlap_at_depth, rbo).
    */
  def rboOverlap(df: DataFrame, idCol: String, scoreA: Column, scoreB: Column,
      depth: Int = 50, p: Double = 0.9): DataFrame = {
    val spark = df.sparkSession
    val weights = Array.tabulate(depth)(d => (1 - p) * math.pow(p, d)) // d = rank-1
    val wCol = array(weights.map(lit): _*)
    def top(score: Column, rankName: String): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      df.select(col(idCol).as("id"), score.as("s"))
        .orderBy(col("s").desc, col("id"))
        .limit(depth)
        .withColumn(rankName,
          row_number().over(Window.orderBy(col("s").desc, col("id"))))
        .drop("s")
    }
    val pos = top(scoreA, "ra").join(top(scoreB, "rb"), Seq("id"), "full")
    val depths = spark.range(1, depth + 1).select(col("id").cast("int").as("d"))
    val terms = pos.join(broadcast(depths),
        col("ra") <= col("d") && col("rb") <= col("d"))
      .groupBy("d").agg(count(lit(1)).as("ov"))
    terms
      .select(col("d"), col("ov"),
        round(element_at(wCol, col("d")) * col("ov").cast("double") /
          col("d").cast("double"), 9).cast("decimal(28,9)").as("_rbo_t"))
      .agg(max(when(col("d") === depth, col("ov"))).as("overlap_at_depth"),
        sum(col("_rbo_t")).cast("double").as("_rbo"))
      .select(lit(depth).as("depth"), col("overlap_at_depth"),
        round(col("_rbo"), 6).as("rbo"))
  }

  /** DuckDB mirror of [[rboOverlap]]. `scoredSql` yields (id, sa, sb);
    * the geometric weights are interpolated from the SAME Scala doubles.
    */
  def rboOverlapSql(scoredSql: String, depth: Int = 50,
      p: Double = 0.9): String = {
    val weights = Array.tabulate(depth)(d => (1 - p) * math.pow(p, d))
    val wList = weights.map(w => s"CAST($w AS DOUBLE)").mkString("[", ",", "]")
    s"""WITH sc AS ($scoredSql),
       ta AS (SELECT id, row_number() OVER (ORDER BY sa DESC, id) AS ra
              FROM (SELECT id, sa FROM sc ORDER BY sa DESC, id LIMIT $depth)),
       tb AS (SELECT id, row_number() OVER (ORDER BY sb DESC, id) AS rb
              FROM (SELECT id, sb FROM sc ORDER BY sb DESC, id LIMIT $depth)),
       pos AS (SELECT COALESCE(ta.id, tb.id) AS id, ra, rb
               FROM ta FULL OUTER JOIN tb ON ta.id = tb.id),
       ds AS (SELECT CAST(unnest(range(1, ${depth + 1})) AS INT) AS d),
       terms AS (SELECT d, COUNT(*) AS ov FROM pos JOIN ds
                   ON ra <= d AND rb <= d GROUP BY d),
       t2 AS (SELECT d, ov,
                CAST(round(($wList)[d] * CAST(ov AS DOUBLE) / CAST(d AS DOUBLE), 9)
                  AS DECIMAL(28,9)) AS t
              FROM terms)
       SELECT $depth AS depth,
         MAX(CASE WHEN d = $depth THEN ov END) AS overlap_at_depth,
         round(CAST(SUM(t) AS DOUBLE), 6) AS rbo
       FROM t2"""
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

  /** Kendall's τ-b from the BUCKETED contingency grid — rank correlation
    * with the tie correction [[spearman]] lacks a significance story for,
    * computed without ranking any row: bucket both variables (fixed
    * widths, so the grid is value-range-bounded), then count concordant /
    * discordant pairs as products over strictly-ordered CELL pairs.
    *
    *   τ_b = 2(C − D) / sqrt( (n(n−1) − Σ t_x(t_x−1)) (n(n−1) − Σ t_y(t_y−1)) )
    *
    * Everything is integer (DECIMAL(38,0) products — pair counts reach
    * n²) until the one sqrt/division. Scale: the corpus collapses to the
    * grid in one aggregation; the cell-pair join is grid², never rows².
    * Bucketing coarsens τ toward its grouped-data value — that is the
    * documented estimator (Kendall on grouped data), not an approximation
    * of the raw-value τ.
    */
  def kendallTauGrid(df: DataFrame, x: Column, y: Column,
      xWidth: Long, yWidth: Long): DataFrame = {
    require(xWidth > 0 && yWidth > 0, "kendallTauGrid: bad bucket widths")
    val grid = Dedup.parallelize(df)
      .select(floor(x / xWidth).as("bx"), floor(y / yWidth).as("by"))
      .groupBy("bx", "by").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    def dec(c: Column) = c.cast("decimal(19,0)")
    val g1 = grid.select(col("bx"), col("by"), col("c"))
    val g2 = grid.select(col("bx").as("bx2"), col("by").as("by2"),
      col("c").as("c2"))
    val pairs = g1.join(broadcast(g2), col("bx2") > col("bx"))
      .select(
        when(col("by2") > col("by"), (dec(col("c")) * dec(col("c2"))).cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)")).as("conc"),
        when(col("by2") < col("by"), (dec(col("c")) * dec(col("c2"))).cast("decimal(38,0)"))
          .otherwise(lit(0).cast("decimal(38,0)")).as("disc"))
      .agg(sum(col("conc")).as("cc"), sum(col("disc")).as("dd"))
    val n = grid.agg(sum(col("c")).as("n"), count(lit(1)).as("n_cells"))
    val tx = grid.groupBy("bx").agg(sum(col("c")).as("t"))
      .agg(sum((dec(col("t")) * (dec(col("t")) - lit(1))).cast("decimal(38,0)")).as("tiex"))
    val ty = grid.groupBy("by").agg(sum(col("c")).as("t"))
      .agg(sum((dec(col("t")) * (dec(col("t")) - lit(1))).cast("decimal(38,0)")).as("tiey"))
    def d(c: Column) = c.cast("double")
    val nn = d(col("n")) * (d(col("n")) - lit(1.0))
    val den = sqrt((nn - d(col("tiex"))) * (nn - d(col("tiey"))))
    n.crossJoin(broadcast(pairs)).crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .select(col("n"), col("n_cells"),
        col("cc").cast("long").as("concordant"),
        col("dd").cast("long").as("discordant"),
        when(den > 0,
          round(lit(2.0) * (d(col("cc")) - d(col("dd"))) / den, 6)).as("tau_b"))
  }

  /** DuckDB mirror of [[kendallTauGrid]]; `xySql` yields (x, y). */
  def kendallTauGridSql(xySql: String, xWidth: Long, yWidth: Long): String =
    s"""WITH xy AS ($xySql),
       grid AS (SELECT CAST(floor(x / $xWidth) AS BIGINT) AS bx,
           CAST(floor(y / $yWidth) AS BIGINT) AS by, COUNT(*) AS c
         FROM xy GROUP BY 1, 2),
       pairs AS (SELECT
           SUM(CASE WHEN b.by > a.by
             THEN CAST(CAST(a.c AS DECIMAL(19,0)) * CAST(b.c AS DECIMAL(19,0)) AS DECIMAL(38,0))
             ELSE CAST(0 AS DECIMAL(38,0)) END) AS cc,
           SUM(CASE WHEN b.by < a.by
             THEN CAST(CAST(a.c AS DECIMAL(19,0)) * CAST(b.c AS DECIMAL(19,0)) AS DECIMAL(38,0))
             ELSE CAST(0 AS DECIMAL(38,0)) END) AS dd
         FROM grid a JOIN grid b ON b.bx > a.bx),
       nrow AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_cells FROM grid),
       tx AS (SELECT SUM(CAST(CAST(t AS DECIMAL(19,0)) * (CAST(t AS DECIMAL(19,0)) - 1) AS DECIMAL(38,0))) AS tiex
         FROM (SELECT bx, SUM(c) AS t FROM grid GROUP BY bx)),
       ty AS (SELECT SUM(CAST(CAST(t AS DECIMAL(19,0)) * (CAST(t AS DECIMAL(19,0)) - 1) AS DECIMAL(38,0))) AS tiey
         FROM (SELECT by, SUM(c) AS t FROM grid GROUP BY by))
       SELECT n, n_cells,
         CAST(cc AS BIGINT) AS concordant,
         CAST(dd AS BIGINT) AS discordant,
         CASE WHEN sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) - CAST(tiex AS DOUBLE))
                * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) - CAST(tiey AS DOUBLE))) > 0
           THEN round(2.0 * (CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) - CAST(tiex AS DOUBLE))
                  * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) - CAST(tiey AS DOUBLE))), 6)
           END AS tau_b
       FROM nrow CROSS JOIN pairs CROSS JOIN tx CROSS JOIN ty"""
}
