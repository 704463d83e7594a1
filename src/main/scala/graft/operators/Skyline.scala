package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, maximize both dimensions): rows not
  * dominated by any other row — `other.x >= x AND other.y >= y` with at
  * least one strict. The canonical "best tradeoff" query (price vs
  * recency, quality vs length) that naive SQL writes as a quadratic
  * NOT EXISTS self-join.
  *
  * Scale design — two-phase sweep, never all-pairs:
  *   1. LOCAL prune: rows hash-bucketed; within each bucket a per-level
  *      sort sweep keeps only the bucket's frontier. Domination is
  *      transitive-safe to prune early (a locally dominated row is
  *      globally dominated), and a random bucket's frontier is tiny
  *      (O(log n) expected for independent dims), so the candidate
  *      union entering phase 2 is ~buckets × frontier, not n.
  *   2. GLOBAL sweep: the same per-level computation over the candidate
  *      union in one partition — correct because phase 1 never drops a
  *      true frontier point, and cheap because the input is already
  *      frontier-sized.
  *
  * The sweep itself is ties-exact: per x-level keep max(y); a row
  * survives iff its y equals its level max (equal-x strict-y domination)
  * and the running max of level-maxes over STRICTLY higher x levels is
  * below its y (strictly-higher-x domination — `>= y` there dominates
  * because x is already strictly greater). Exact (x, y) duplicates
  * dominate neither and both survive, matching the NOT EXISTS
  * definition.
  */
object Skyline {

  private def sweep(df: DataFrame, xCol: String, yCol: String,
      part: Seq[String]): DataFrame = {
    val pcols = part.map(col)
    val lvl = df.groupBy(pcols :+ col(xCol): _*)
      .agg(max(col(yCol)).as("_sk_lvlmax"))
    val byXDesc = Window.partitionBy(pcols: _*).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val lv2 = lvl.withColumn("_sk_higher", max(col("_sk_lvlmax")).over(byXDesc))
    df.join(lv2, part :+ xCol)
      .where(col(yCol) === col("_sk_lvlmax") &&
        (col("_sk_higher").isNull || col("_sk_higher") < col(yCol)))
      .drop("_sk_lvlmax", "_sk_higher")
  }

  /** Frontier of `df` maximizing (xCol, yCol). `buckets` sizes the local
    * prune fan-out (phase-2 input is ≤ buckets × local frontier).
    */
  def frontier(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"Skyline: buckets must be >= 1, got $buckets")
    val bucketed = df.withColumn("_sk_b",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(buckets)))
    val local = sweep(bucketed, xCol, yCol, Seq("_sk_b")).drop("_sk_b")
    sweep(local, xCol, yCol, Seq.empty)
  }

  /** DuckDB mirror — the single-pass sweep (the oracle corpus fits one
    * sort); phase structure differs, the frontier set cannot.
    */
  def frontierSql(table: String, keyCols: String, xCol: String,
      yCol: String): String =
    s"""WITH lvl AS (SELECT $xCol AS x, max($yCol) AS lvlmax
           FROM $table GROUP BY 1),
         lv2 AS (SELECT x, lvlmax,
           max(lvlmax) OVER (ORDER BY x DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS higher
           FROM lvl)
       SELECT $keyCols, $xCol, $yCol
       FROM $table JOIN lv2 ON $xCol = x
       WHERE $yCol = lvlmax AND (higher IS NULL OR higher < $yCol)"""
}
