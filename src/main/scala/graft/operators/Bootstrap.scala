package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals — uncertainty quantification for
  * corpus statistics WITHOUT materializing resamples. The classical
  * bootstrap draws B resamples of N rows (B·N copies — impossible at
  * 100 TB); the Poisson bootstrap (the standard distributed reformulation)
  * observes that each row's multiplicity in a resample is ≈ Poisson(1)
  * independently, so ONE scan can emit every replica's weighted
  * contribution: per row, B deterministic Poisson weights derived from md5
  * uniforms, map-side-combined into B running (Σw·x, Σw) pairs. The whole
  * job is one scan + a B-row aggregate + order statistics over B values.
  *
  * Determinism/oracle: the uniform for (row, replica) is the row id's md5
  * 15-hex-digit fraction (the KMV hash discipline); the Poisson(1) inverse
  * CDF is a CASE chain over cumulative probabilities INTERPOLATED from one
  * set of Scala-computed constants, so both engines draw identical
  * weights. Replica means accumulate via DECIMAL (order-free), and the CI
  * bounds are exact percentiles over the B-row replica relation.
  */
object Bootstrap {

  private val Domain = math.pow(2, 60)

  /** P(Poisson(1) ≤ k) for k = 0..8 — cumulative e⁻¹ Σ 1/j!. */
  private[operators] val poissonCdf: Seq[Double] = {
    val e = math.exp(-1.0)
    val fact = Seq(1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0, 5040.0, 40320.0)
    fact.indices.map(k => (0 to k).map(j => e / fact(j)).sum)
  }

  /** Poisson(1) weight for uniform `u`: smallest k with cdf(k) ≥ u. */
  private def weight(u: Column): Column =
    poissonCdf.zipWithIndex.foldRight(lit(poissonCdf.length.toLong): Column) {
      case ((p, k), acc) => when(u <= lit(p), lit(k.toLong)).otherwise(acc)
    }

  /** CI of the mean of `valCol` over `df`, from B Poisson replicas keyed by
    * `idCol`. Output: one row (n, b, mean, ci_lo, ci_hi) with the point
    * mean DECIMAL-exact and the bounds at the `alpha/2` tails.
    */
  def meanCi(df: DataFrame, idCol: String, valCol: String, b: Int = 64,
      alpha: Double = 0.05): DataFrame = {
    require(b >= 8, "Bootstrap: need b >= 8 replicas")
    // explode the replica INDEX first, then one md5/weight expression over
    // the exploded rows: a per-row array of b (md5 + 9-branch CASE) structs
    // blows past whole-stage-codegen method limits (measured 24 s at sf0.1
    // in that form — interpreted fallback); this shape keeps ONE compact
    // codegen'd expression evaluated b·N times with map-side combine
    // straight down to b rows per partition
    // one md5 per (row, replica). A measured dead end: deriving TWO
    // uniforms per digest (branch-selected substring halves) regressed
    // 4× — the branch-dependent substring defeats codegen subexpression
    // elimination, so the digest evaluates once per branch and the
    // conditional kicks the projection out of whole-stage codegen.
    val u = conv(substring(md5(concat(lit("boot:"), col("r").cast("string"),
      lit(":"), col("_bt_id"))), 1, 15), 16, 10)
      .cast("long").cast("double") / Domain
    val replica = Dedup.parallelize(df)
      .select(col(idCol).cast("string").as("_bt_id"),
        col(valCol).cast("decimal(18,6)").as("_bt_v"),
        explode(sequence(lit(0L), lit(b - 1L))).as("r"))
      .select(col("r"), (weight(u) * col("_bt_v")).as("_bt_wx"), weight(u).as("_bt_w"))
      .groupBy(col("r"))
      .agg((sum(col("_bt_wx")).cast("double") /
        sum(col("_bt_w")).cast("double")).as("rep_mean"))
    val lo = alpha / 2
    val hi = 1 - alpha / 2
    // round(4): interpolated percentiles carry engine ulps (the
    // percentiles-query convention)
    val ci = replica.agg(
      round(expr(s"percentile(rep_mean, $lo)"), 4).as("ci_lo"),
      round(expr(s"percentile(rep_mean, $hi)"), 4).as("ci_hi"))
    val base = df.agg(count(lit(1)).as("n"),
      round(sum(col(valCol).cast("decimal(18,6)")).cast("double") /
        count(lit(1)), 6).as("mean"))
    base.crossJoin(broadcast(ci))
      .select(col("n"), lit(b.toLong).as("b"), col("mean"),
        col("ci_lo"), col("ci_hi"))
  }

  /** DuckDB mirror of [[meanCi]]. */
  def meanCiSql(tbl: String, idCol: String, valCol: String, b: Int = 64,
      alpha: Double = 0.05): String = {
    val cdfCase = poissonCdf.zipWithIndex
      .map { case (p, k) => s"WHEN u <= $p THEN $k" }
      .mkString(" ")
    val lo = alpha / 2
    val hi = 1 - alpha / 2
    s"""WITH reps AS (SELECT r, $valCol AS v,
           CAST(('0x' || substr(md5('boot:' || CAST(r AS VARCHAR) || ':' ||
             CAST($idCol AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) / $Domain AS u
         FROM $tbl CROSS JOIN range($b) AS t(r)),
       w AS (SELECT r, v, CASE $cdfCase ELSE ${poissonCdf.length} END AS w FROM reps),
       rm AS (SELECT r,
           CAST(SUM(w * CAST(v AS DECIMAL(18,6))) AS DOUBLE) /
             CAST(SUM(w) AS DOUBLE) AS rep_mean
         FROM w GROUP BY r),
       ci AS (SELECT round(quantile_cont(rep_mean, $lo), 4) AS ci_lo,
                     round(quantile_cont(rep_mean, $hi), 4) AS ci_hi FROM rm),
       base AS (SELECT COUNT(*) AS n,
           round(CAST(SUM(CAST($valCol AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean
         FROM $tbl)
       SELECT n, CAST($b AS BIGINT) AS b, mean, ci_lo, ci_hi
       FROM base CROSS JOIN ci"""
  }
}
