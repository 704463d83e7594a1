package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): score every
  * raw-corpus document by how target-like its hashed n-gram distribution
  * is, `w(doc) = Σ_{g ∈ doc} log p_target(h(g)) − log p_raw(h(g))`, then
  * keep the highest-weight documents. The feature space is hashed bigrams
  * (B buckets), so both distributions are B-vectors regardless of corpus
  * size — the published trick that makes target-matching tractable at
  * pretraining scale.
  *
  * Plan shape at 100 TB: ONE explode pass over the corpus builds the
  * per-(doc, feature) term frequencies; the raw and target feature counts
  * come from the SAME relation via a conditional aggregate (no second
  * scan — target membership is a per-doc predicate riding the tf rows);
  * the log-ratio table is at most B rows and broadcasts back onto the tf
  * relation. Both aggregations are hash-partitioned with map-side
  * partials; nothing driver-side.
  *
  * Cross-engine exactness: feature ids are the first 8 md5 hex chars mod B
  * (integer arithmetic end to end); each per-feature log ratio is rounded
  * to 6 decimals and accumulated as DECIMAL(18,6) weighted by the exact
  * integer tf, so the per-doc sum is order-independent and bit-equal in
  * any engine.
  */
object Dsir {

  /** Per-feature target/raw log-ratio table: (feat, lr) with
    * `lr = round(ln(p_t(feat)/p_r(feat)), 6)` under Laplace smoothing
    * `p(f) = (c(f)+1)/(total+B)`. Only features observed in the raw corpus
    * appear (unseen features contribute nothing to any document's sum).
    */
  def featureLogRatios(tf: DataFrame, buckets: Int): DataFrame = {
    val feat = tf
      .groupBy("feat")
      .agg(sum(col("tf")).as("c_raw"),
        sum(when(col("is_target"), col("tf")).otherwise(lit(0L))).as("c_tgt"))
    val totals = feat.agg(sum(col("c_raw")).as("t_raw"), sum(col("c_tgt")).as("t_tgt"))
    feat
      .crossJoin(broadcast(totals))
      .select(col("feat"),
        round(
          log(((col("c_tgt").cast("double") + lit(1.0)) /
               (col("t_tgt").cast("double") + lit(buckets.toDouble))) /
              ((col("c_raw").cast("double") + lit(1.0)) /
               (col("t_raw").cast("double") + lit(buckets.toDouble)))),
          6).cast("decimal(18,6)").as("lr"))
  }

  /** Hashed-bigram importance weight per document. `targetPred` is a SQL
    * boolean over the input columns defining the target slice (e.g.
    * `lang = 'en'`). Output: (idCol, n_grams, weight) — weight is the
    * DECIMAL-exact Σ tf·lr cast to double at the edge.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, buckets: Int = 1024): DataFrame = {
    val id = col(idCol)
    val tf = Dedup.parallelize(df)
      .select(id, targetPred.as("is_target"),
        explode(graft.functions.MinHashExpr.shinglesArray(lower(col(textCol)), 2)).as("bg"))
      // <2-token docs yield their whole token string (no space): not a
      // bigram — dropped, mirroring the oracle's empty range(1, len)
      .where(instr(col("bg"), " ") > 0)
      .select(col("*"),
        (conv(substring(md5(col("bg")), 1, 8), 16, 10).cast("long") % buckets).as("feat"))
      .groupBy(id, col("is_target"), col("feat"))
      .agg(count(lit(1)).as("tf"))
    val ratios = featureLogRatios(tf, buckets)
    tf
      .join(broadcast(ratios), "feat")
      .groupBy(id)
      .agg(sum(col("tf")).as("n_grams"),
        sum(col("tf").cast("decimal(18,6)") * col("lr")).as("_w"))
      .select(id, col("n_grams"), col("_w").cast("double").as("weight"))
  }

  /** The DuckDB mirror of [[importanceWeights]], same constants
    * interpolated. `targetPredSql` must be the SQL spelling of the Spark
    * predicate.
    */
  def importanceWeightsSql(table: String, idCol: String, textCol: String,
      targetPredSql: String, buckets: Int = 1024): String =
    s"""WITH w AS (SELECT $idCol, ($targetPredSql) AS is_target,
             string_split_regex(trim(lower($textCol)),'\\s+') AS ws FROM $table),
       b AS (SELECT $idCol, is_target,
             unnest(list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1])) AS bg FROM w),
       tf AS (SELECT $idCol, is_target,
             ('0x'||substr(md5(bg),1,8))::BIGINT % $buckets AS feat, COUNT(*) AS tf
           FROM b GROUP BY 1, 2, 3),
       f AS (SELECT feat, SUM(tf) AS c_raw,
             SUM(CASE WHEN is_target THEN tf ELSE 0 END) AS c_tgt
           FROM tf GROUP BY feat),
       t AS (SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM f),
       r AS (SELECT feat,
             CAST(round(ln(((CAST(c_tgt AS DOUBLE) + 1.0) / (CAST(t_tgt AS DOUBLE) + ${buckets.toDouble}))
               / ((CAST(c_raw AS DOUBLE) + 1.0) / (CAST(t_raw AS DOUBLE) + ${buckets.toDouble}))), 6)
               AS DECIMAL(18,6)) AS lr
           FROM f CROSS JOIN t)
       SELECT $idCol, CAST(SUM(tf) AS BIGINT) AS n_grams,
         CAST(SUM(CAST(tf AS DECIMAL(18,6)) * lr) AS DOUBLE) AS weight
       FROM tf JOIN r USING (feat)
       GROUP BY $idCol ORDER BY $idCol"""
}
