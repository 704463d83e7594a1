package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Isotonic (monotone) calibration of a binary outcome against an ordered
  * score bucket — the calibration-curve smoother behind "does this quality
  * score actually rank keep-rate monotonically, and what monotone rate
  * should each bucket report?" (the PAV step every calibrated classifier
  * release runs; here over corpus gates).
  *
  * Algorithm WITHOUT the sequential pool-adjacent-violators loop: the PAV
  * solution has the closed minimax characterization (Barlow et al. 1972)
  *   fit(i) = min_{k ≥ i} max_{j ≤ i} mean(y[j..k])
  * with weighted bucket means from prefix sums — an O(B³) formula that is
  * pure relational algebra over the BUCKET relation (B rows, e.g. 16), so
  * both engines evaluate the identical finite max/min over identical
  * doubles. The corpus-sized work is one scan folding docs into buckets;
  * everything after is bounded self-joins on a broadcast-sized relation.
  */
object Isotonic {

  /** `df` carries an integer bucket column (ordered) and a 0/1 outcome
    * column. Output per bucket: n, raw rate, isotonic (monotone
    * non-decreasing) calibrated rate.
    */
  def calibrate(df: DataFrame, bucketCol: String,
      outcomeCol: String): DataFrame = {
    val b = df.groupBy(col(bucketCol).cast("long").as("b"))
      .agg(count(lit(1)).as("n"),
        sum(col(outcomeCol).cast("long")).as("s"))
    val wCum = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // prefix sums over the bounded bucket relation
    val pre = b.select(col("b"), col("n"), col("s"),
      sum(col("n")).over(wCum).as("cn"), sum(col("s")).over(wCum).as("cs"))
    val hi = pre.select(col("b").as("k"), col("cn").as("cn_k"), col("cs").as("cs_k"))
    val lo = pre.select(col("b").as("j"),
      (col("cn") - col("n")).as("cn_j0"), (col("cs") - col("s")).as("cs_j0"))
    // mean over buckets j..k (inclusive), weighted by doc counts
    val pairs = broadcast(lo).join(broadcast(hi), col("j") <= col("k"))
      .select(col("j"), col("k"),
        ((col("cs_k") - col("cs_j0")).cast("double") /
          (col("cn_k") - col("cn_j0")).cast("double")).as("m"))
    val grid = pre.select(col("b").as("i"))
    // inner max over j ≤ i (for each k ≥ i), then outer min over k
    val fit = broadcast(grid)
      .join(broadcast(pairs), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("k")).agg(max(col("m")).as("mx"))
      .groupBy(col("i")).agg(min(col("mx")).as("fit"))
    b.join(broadcast(fit), col("b") === col("i"))
      .select(col("b").as(bucketCol), col("n"),
        round(col("s").cast("double") / col("n").cast("double"), 6)
          .as("raw_rate"),
        round(col("fit"), 6).as("iso_rate"))
      .orderBy(bucketCol)
  }

  /** DuckDB mirror of [[calibrate]]. */
  def calibrateSql(tbl: String, bucketCol: String,
      outcomeCol: String): String =
    s"""WITH b AS (SELECT CAST($bucketCol AS BIGINT) AS b, COUNT(*) AS n,
           CAST(SUM(CAST($outcomeCol AS BIGINT)) AS BIGINT) AS s
         FROM $tbl GROUP BY 1),
       pre AS (SELECT b, n, s,
           CAST(SUM(n) OVER w AS BIGINT) AS cn,
           CAST(SUM(s) OVER w AS BIGINT) AS cs
         FROM b WINDOW w AS (ORDER BY b
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       pairs AS (SELECT lo.b AS j, hi.b AS k,
           CAST(hi.cs - (lo.cs - lo.s) AS DOUBLE)
             / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE) AS m
         FROM pre lo JOIN pre hi ON lo.b <= hi.b),
       fit AS (SELECT i, MIN(mx) AS fit FROM (
           SELECT g.b AS i, p.k, MAX(p.m) AS mx
           FROM pre g JOIN pairs p ON p.j <= g.b AND p.k >= g.b
           GROUP BY 1, 2) GROUP BY i)
       SELECT b AS $bucketCol, n,
         round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
         round(fit, 6) AS iso_rate
       FROM b JOIN fit ON b = i ORDER BY $bucketCol"""
}
