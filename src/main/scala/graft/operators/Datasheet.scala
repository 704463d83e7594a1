package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-row corpus DATASHEET (Gebru et al., "Datasheets for Datasets"):
  * the headline numbers a dataset release publishes — volume, length
  * distribution, exact-duplicate rate, dominant language share, quality-
  * gate pass rate — composed from the same folds the dedicated operators
  * use, so the datasheet can never disagree with the detailed reports.
  *
  * Shape: two corpus scans (one plain aggregate; one distinct-md5 count
  * for the dup rate, 16-byte shuffle keys) + the bounded language and
  * gate aggregates; everything joins as broadcast one-row relations.
  */
object Datasheet {

  def summarize(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
      round(avg(length(col(textCol)).cast("double")), 2).as("mean_chars"),
      round(expr(s"percentile(length($textCol), 0.5)"), 1).as("p50_chars"))
    // unhex: 16-byte binary digest through the distinct's exchange (a
    // bijection of the hex string — the count is unchanged; guide §2.3)
    val distinctHash = docs.select(unhex(md5(col(textCol))).as("h")).distinct()
      .agg(count(lit(1)).as("n_distinct"))
    val lang = docs.groupBy(col(langCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(langCol))
      .limit(1)
      .select(col(langCol).as("top_lang"), col("n").as("_ln"))
    val gate = TextAnalysis.gopherRules(docs, idCol, textCol)
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("_keep"))
    base.crossJoin(broadcast(distinctHash))
      .crossJoin(broadcast(lang))
      .crossJoin(broadcast(gate))
      .select(col("n_docs"), col("n_tokens"), col("mean_chars"),
        col("p50_chars"),
        round(lit(1.0) -
          col("n_distinct").cast("double") / col("n_docs").cast("double"), 6)
          .as("exact_dup_rate"),
        col("top_lang"),
        round(col("_ln").cast("double") / col("n_docs").cast("double"), 6)
          .as("top_lang_share"),
        round(col("_keep").cast("double") / col("n_docs").cast("double"), 6)
          .as("gopher_pass_rate"))
  }

  /** DuckDB mirror of [[summarize]] — `gopherKeepSql` must yield
    * `(idCol, keep)` over the same table.
    */
  def summarizeSql(tbl: String, idCol: String, textCol: String,
      langCol: String, gopherKeepSql: String): String =
    s"""WITH base AS (SELECT COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim($textCol), '\\s+'))) AS BIGINT) AS n_tokens,
           round(AVG(CAST(length($textCol) AS DOUBLE)), 2) AS mean_chars,
           round(quantile_cont(length($textCol), 0.5), 1) AS p50_chars
         FROM $tbl),
       dh AS (SELECT COUNT(*) AS n_distinct FROM
         (SELECT DISTINCT md5($textCol) FROM $tbl)),
       lang AS (SELECT $langCol AS top_lang, COUNT(*) AS ln FROM $tbl
         GROUP BY 1 ORDER BY COUNT(*) DESC, $langCol LIMIT 1),
       gate AS (SELECT CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kp
         FROM ($gopherKeepSql))
       SELECT n_docs, n_tokens, mean_chars, p50_chars,
         round(CAST(1.0 AS DOUBLE)
           - CAST(n_distinct AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS exact_dup_rate,
         top_lang,
         round(CAST(ln AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS top_lang_share,
         round(CAST(kp AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS gopher_pass_rate
       FROM base CROSS JOIN dh CROSS JOIN lang CROSS JOIN gate"""
}
