package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring via the Population Stability Index — the
  * "did this source's data change shape between snapshots" gate a corpus
  * refresh pipeline runs before retraining: PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)
  * over a bucketed feature, per source. (<0.1 stable, 0.1–0.25 drifting,
  * >0.25 shifted — the standard scorecard bands.)
  *
  * The two populations compared here are the deterministic md5-halves of
  * the corpus ([[Sampling.splitByte]] parity of the id) — in production the
  * two sides are consecutive snapshots; the halving makes the operator
  * self-contained and its expected PSI ≈ 0 (sampling noise only), so any
  * non-trivial score in the fixture output is real structure.
  *
  * Shape: ONE corpus scan → (source, side, bucket) counts (map-side
  * combinable), per-(source, side) totals folded FROM that relation (no
  * second scan), one bucket-keyed join of two tiny relations, bounded agg.
  * Zero-count buckets on one side clamp to `eps` (the standard PSI floor)
  * — deterministic in both engines. Cross-engine exactness: proportions
  * are double divisions of exact integers, each bucket term rounds to 6
  * then sums as DECIMAL (partition-order-proof), final round 6.
  */
object Drift {

  /** Per-source PSI between the corpus's even/odd md5-halves over a
    * power-of-two length bucketing of `textCol` tokens.
    */
  def psiDrift(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, minCap: Int = 16, maxCap: Int = 512,
      eps: Double = 1e-6): DataFrame = {
    val n = TextAnalysis.tokenCount(col(textCol))
    val caps = Iterator.iterate(minCap)(_ * 2).takeWhile(_ < maxCap).toSeq
    val bucket = caps.foldRight(lit(maxCap.toLong)) { (c, rest) =>
      when(n <= c, lit(c.toLong)).otherwise(rest)
    }
    val side = (Sampling.splitByte(col(idCol), "psi") % 2).cast("int")
    val counts = Dedup.parallelize(df)
      .select(col(sourceCol).as("source"), side.as("side"), bucket.as("bucket"))
      .groupBy("source", "side", "bucket").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("source", "side").agg(sum("c").as("tot"))
    val sided = counts.join(totals, Seq("source", "side"))
      .select(col("source"), col("bucket"), col("side"),
        (col("c").cast("double") / col("tot").cast("double")).as("p"))
    val a = sided.where(col("side") === 0).select(col("source"), col("bucket"), col("p").as("pa"))
    val b = sided.where(col("side") === 1).select(col("source"), col("bucket"), col("p").as("pb"))
    a.join(b, Seq("source", "bucket"), "full_outer")
      .select(col("source"),
        greatest(coalesce(col("pa"), lit(0.0)), lit(eps)).as("pa"),
        greatest(coalesce(col("pb"), lit(0.0)), lit(eps)).as("pb"))
      .select(col("source"),
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6)
          .cast("decimal(18,6)").as("term"))
      .groupBy("source")
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
      .orderBy("source")
  }

  /** DuckDB mirror of [[psiDrift]]. */
  def psiDriftSql(table: String, idCol: String, sourceCol: String,
      textCol: String, minCap: Int = 16, maxCap: Int = 512,
      eps: Double = 1e-6): String = {
    val caps = Iterator.iterate(minCap)(_ * 2).takeWhile(_ < maxCap).toSeq
    val chain = caps.map(c => s"WHEN n <= $c THEN $c").mkString(" ")
    s"""WITH base AS (SELECT $sourceCol AS source,
           CAST('0x'||substr(md5('psi:'||CAST($idCol AS VARCHAR)),1,2) AS INT) % 2 AS side,
           CAST(CASE $chain ELSE $maxCap END AS BIGINT) AS bucket
         FROM (SELECT $idCol, $sourceCol,
                 len(string_split_regex(trim($textCol),'\\s+')) AS n FROM $table)),
       counts AS (SELECT source, side, bucket, COUNT(*) AS c
                  FROM base GROUP BY 1, 2, 3),
       tot AS (SELECT source, side, SUM(c) AS tot FROM counts GROUP BY 1, 2),
       sided AS (SELECT source, bucket, side,
                   CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS p
                 FROM counts JOIN tot USING (source, side)),
       ab AS (SELECT source, bucket,
                greatest(COALESCE(MAX(p) FILTER (side = 0), 0.0), $eps) AS pa,
                greatest(COALESCE(MAX(p) FILTER (side = 1), 0.0), $eps) AS pb
              FROM sided GROUP BY 1, 2)
       SELECT source,
         round(CAST(SUM(CAST(round((pa - pb) * ln(pa / pb), 6) AS DECIMAL(18,6)))
           AS DOUBLE), 6) AS psi
       FROM ab GROUP BY source ORDER BY source"""
  }
}
