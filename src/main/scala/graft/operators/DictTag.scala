package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dictionary tagging: per-document occurrence counts for a term list
  * (blocklist filtering, policy keyword flagging, PII keyword surfacing —
  * the "bad words" pass every web-scale corpus pipeline runs).
  *
  * One [[graft.functions.AhoCorasickExpr]] pass per document counts ALL K
  * terms simultaneously (O(text), automaton built once per executor), where
  * the compositional plan — K `contains`/`regexp_count` columns — rescans
  * every document K times. Matching is case-insensitive (both sides
  * lowercased), substring-level, overlap-counting, and nested terms fire
  * independently ("scan" also counts inside "table scan").
  */
object DictTag {

  /** (id, term, n) for every term with n ≥ 1 occurrences in the document. */
  def tagCounts(df: DataFrame, idCol: String, textCol: String, terms: Seq[String]): DataFrame = {
    val id = col(idCol)
    val termArr = array(terms.map(t => lit(t.toLowerCase)): _*)
    Dedup.parallelize(df)
      .select(id,
        graft.functions.AhoCorasickExpr
          .counts(lower(col(textCol)), terms.map(_.toLowerCase)).as("_dt_c"))
      .select(id, posexplode(col("_dt_c")).as(Seq("_dt_i", "n")))
      .where(col("n") > 0)
      .select(id, element_at(termArr, col("_dt_i") + 1).as("term"), col("n"))
  }

  /** DuckDB mirror of [[tagCounts]]: per-position substring probes (the
    * naive O(K·text) form the expression replaces), exact on overlaps.
    */
  def tagCountsSql(tbl: String, idCol: String, textCol: String, terms: Seq[String]): String = {
    val values = terms.map(t => s"('${t.toLowerCase.replace("'", "''")}')").mkString(", ")
    s"""WITH terms(term) AS (VALUES $values),
       t AS (SELECT $idCol, lower($textCol) AS tx FROM $tbl),
       m AS (SELECT $idCol, term,
               CAST(len(list_filter(range(1, len(tx) - len(term) + 2),
                 i -> tx[i : i + len(term) - 1] = term)) AS BIGINT) AS n
             FROM t CROSS JOIN terms)
       SELECT $idCol, term, n FROM m WHERE n > 0 ORDER BY $idCol, term"""
  }
}
