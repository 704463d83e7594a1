package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count sketching — the bounded-memory answer to "how many
  * distinct tokens/urls/ngrams per partition of a 100 TB corpus".
  *
  * KMV (k minimum values; Bar-Yossef et al. 2002, Beyer et al. 2007): hash
  * every distinct value uniformly into (0,1), keep only the k smallest
  * hashes per group; if the k-th smallest is v_k, the distinct count is
  * ≈ (k−1)/v_k. Unlike HyperLogLog the estimator is trivially engine-exact
  * (a deterministic function of the md5 order statistics — the reason this
  * sketch oracles bit-for-bit where approx_count_distinct never could),
  * still mergeable (union of sketches = sketch of union: keep the k
  * smallest of the union), and O(k) memory per group.
  */
object Sketch {

  /** 2^60 — the hash domain: 15 md5 hex chars parsed as an integer. */
  private val Domain = math.pow(2, 60)

  /** Per-group distinct-token estimate. The distinct (group, token)
    * relation is vocabulary-sized (orders of magnitude under the corpus),
    * so the per-group order-statistic window runs over sketch-sized input;
    * groups with fewer than k distinct values degrade to the EXACT count
    * (v_k undefined — the sketch holds the whole set).
    */
  def kmvDistinctTokens(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashed = Dedup.parallelize(df)
      .select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .distinct()
      .select(col("grp"), substring(md5(col("term")), 1, 15).as("h"))
    val w = Window.partitionBy("grp").orderBy("h")
    hashed
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy("grp")
      .agg(count(lit(1)).as("k_actual"),
        conv(max(col("h")), 16, 10).cast("long").as("hkl"))
      .select(col("grp").as(groupCol),
        when(col("k_actual") < k, col("k_actual").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("hkl").cast("double") / lit(Domain)))
          .as("est_distinct"))
  }

  /** The SQL-side hash-fraction mirror: interpolates the SAME Scala-computed
    * double constants the Column side uses, so both engines evaluate
    * identical literals (never fold constants independently in two
    * engines). */
  def kmvEstimateSql(k: Int): String =
    s"""CASE WHEN k_actual < $k THEN CAST(k_actual AS DOUBLE)
        ELSE ${(k - 1).toDouble} / (CAST(hkl AS DOUBLE) / ${Domain}) END"""
}
