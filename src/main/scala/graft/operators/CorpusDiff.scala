package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions (crawl N vs crawl N+1, raw vs
  * reprocessed): which documents were added, removed, or changed. The
  * incremental-pipeline primitive — recompute features/dedup only for the
  * delta instead of re-running the corpus.
  *
  * Shape at 100 TB: each side reduces to (id, fingerprint) in its scan
  * (md5 of the content — 16 bytes/doc crosses the shuffle, never text),
  * then ONE full-outer hash join on id classifies every doc; unchanged
  * docs (the overwhelming majority between adjacent snapshots) are
  * filtered before the result materializes.
  */
object CorpusDiff {

  /** (id, status) with status ∈ added | removed | changed. */
  def diff(a: DataFrame, b: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fa = a.select(col(idCol), md5(col(textCol)).as("_cd_fa"))
    val fb = b.select(col(idCol), md5(col(textCol)).as("_cd_fb"))
    fa.join(fb, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("_cd_fb").isNull, "removed")
          .when(col("_cd_fa").isNull, "added")
          .when(col("_cd_fa") =!= col("_cd_fb"), "changed"))
      .where(col("status").isNotNull)
      .select(col(idCol), col("status"))
  }

  /** DuckDB mirror over two snapshot SQL sources (subqueries or tables). */
  def diffSql(aSql: String, bSql: String, idCol: String, textCol: String): String =
    s"""WITH fa AS (SELECT $idCol, md5($textCol) AS f FROM ($aSql)),
       fb AS (SELECT $idCol, md5($textCol) AS f FROM ($bSql)),
       j AS (SELECT COALESCE(fa.$idCol, fb.$idCol) AS $idCol,
                    fa.f AS f_a, fb.f AS f_b
             FROM fa FULL OUTER JOIN fb ON fa.$idCol = fb.$idCol)
       SELECT $idCol,
              CASE WHEN f_b IS NULL THEN 'removed'
                   WHEN f_a IS NULL THEN 'added'
                   WHEN f_a <> f_b THEN 'changed' END AS status
       FROM j
       WHERE f_b IS NULL OR f_a IS NULL OR f_a <> f_b
       ORDER BY $idCol"""

  /** Pairwise Jensen–Shannon divergence (nats) between the per-source
    * unigram distributions — the standard corpus-similarity matrix for
    * mixture design (which sources are near-duplicates of each other,
    * which add genuinely new text).
    *
    * Computed by the entropy decomposition `JSD = H(m) − (H(p)+H(q))/2`
    * with `H(m)` split so NO per-pair outer join over the union vocabulary
    * is needed: per source, two type-table folds — `H = Σ −p·ln p` and
    * `G = Σ −(p/2)·ln(p/2)` — and per pair, ONE inner equi-join on the
    * term over the shared vocabulary contributing
    * `Σ [−m·ln m + (p/2)ln(p/2) + (q/2)ln(q/2)]` (terms private to either
    * side cancel exactly into G). So H(m) = G_a + G_b + Σ_shared[…].
    *
    * Engine-exact: every fold term is rounded to 8 decimals then summed as
    * DECIMAL (order-free); probabilities are exact-long tf ÷ total
    * divisions. Shape at 100 TB: one token scan into the (source, term,
    * tf) relation; the pair join is S²-bounded per term (sources are a
    * type table), never corpus-sized.
    */
  def jsDivergence(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    def decSum8(c: org.apache.spark.sql.Column) =
      sum(round(c, 8).cast("decimal(28,8)")).cast("double")
    val tf = Dedup.parallelize(df)
      .select(col(sourceCol), explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .groupBy(sourceCol, "term").agg(count(lit(1)).as("tf"))
    val probs = tf
      .join(tf.groupBy(sourceCol).agg(sum(col("tf")).as("_js_tot")), sourceCol)
      .select(col(sourceCol), col("term"),
        (col("tf").cast("double") / col("_js_tot").cast("double")).as("p"))
    val perSrc = probs.groupBy(sourceCol)
      .agg(decSum8(-col("p") * log(col("p"))).as("h"),
        decSum8(-(col("p") / 2) * log(col("p") / 2)).as("g"))
    val a = probs.select(col(sourceCol).as("src_a"), col("term"), col("p").as("pa"))
    val b = probs.select(col(sourceCol).as("src_b"), col("term"), col("p").as("pb"))
    val m = (col("pa") + col("pb")) / 2
    val shared = a.join(b, "term").where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(decSum8(-m * log(m) +
        (col("pa") / 2) * log(col("pa") / 2) +
        (col("pb") / 2) * log(col("pb") / 2)).as("d"))
    val sa = perSrc.select(col(sourceCol).as("src_a"), col("h").as("ha"), col("g").as("ga"))
    val sb = perSrc.select(col(sourceCol).as("src_b"), col("h").as("hb"), col("g").as("gb"))
    shared.join(broadcast(sa), "src_a").join(broadcast(sb), "src_b")
      .select(col("src_a"), col("src_b"),
        round(col("ga") + col("gb") + col("d") - (col("ha") + col("hb")) / 2, 6)
          .as("jsd"))
      .orderBy("src_a", "src_b")
  }

  /** DuckDB mirror of [[jsDivergence]] — same folds, rounding points, and
    * pair algebra.
    */
  def jsDivergenceSql(tbl: String, sourceCol: String, textCol: String): String =
    s"""WITH tf AS (SELECT $sourceCol AS src, term, COUNT(*) AS tf FROM (
           SELECT $sourceCol, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
           FROM $tbl) GROUP BY 1, 2),
       tot AS (SELECT src, CAST(SUM(tf) AS BIGINT) AS t FROM tf GROUP BY src),
       probs AS (SELECT src, term, CAST(tf AS DOUBLE) / CAST(t AS DOUBLE) AS p
           FROM tf JOIN tot USING (src)),
       per AS (SELECT src,
           CAST(SUM(CAST(round(-p * ln(p), 8) AS DECIMAL(28,8))) AS DOUBLE) AS h,
           CAST(SUM(CAST(round(-(p/2) * ln(p/2), 8) AS DECIMAL(28,8))) AS DOUBLE) AS g
           FROM probs GROUP BY src),
       shared AS (SELECT a.src AS src_a, b.src AS src_b,
           CAST(SUM(CAST(round(-((a.p + b.p)/2) * ln((a.p + b.p)/2)
             + (a.p/2) * ln(a.p/2) + (b.p/2) * ln(b.p/2), 8) AS DECIMAL(28,8))) AS DOUBLE) AS d
           FROM probs a JOIN probs b ON a.term = b.term AND a.src < b.src
           GROUP BY 1, 2)
       SELECT src_a, src_b,
         round(pa.g + pb.g + d - (pa.h + pb.h) / 2, 6) AS jsd
       FROM shared
       JOIN per pa ON src_a = pa.src
       JOIN per pb ON src_b = pb.src
       ORDER BY src_a, src_b"""
}
