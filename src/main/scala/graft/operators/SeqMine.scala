package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential-pattern support over event streams — the discovery
  * counterpart of the fixed-funnel operator: instead of checking ONE
  * prescribed step order ([[EventSeq]] funnel), enumerate every ordered
  * event-type pair (a → b) and count how many users exhibit it, where
  * "exhibits" means the user's FIRST a strictly precedes their FIRST b
  * (the first-occurrence semantics of classic funnel mining; AprioriAll /
  * PrefixSpan restricted to length-2 patterns over first occurrences —
  * Agrawal & Srikant, ICDE 1995, without the unbounded-length lattice
  * that cannot ship at corpus scale).
  *
  * Scale shape: the corpus collapses ONCE to a (user, type, first_ts)
  * relation — at most |users| × |type table| rows, map-side partial min —
  * and the pair enumeration is a per-user self-join of that bounded
  * relation (fan-out ≤ T² per user for a type-table of size T, never a
  * fact-table self-join). Equal first timestamps count for NEITHER order
  * (strict precedence — deterministic without a tie-break on ids).
  */
object SeqMine {

  /** Support table for ordered first-occurrence pairs: one row per
    * (antecedent, consequent) with `n_seq` = users whose first antecedent
    * strictly precedes their first consequent, `n_both` = users having
    * both types at all, and their ratio.
    */
  def pairSupport(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String): DataFrame = {
    val firsts = df
      .groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("first_ts"))
    val a = firsts.select(col("u"), col("t").as("ante"), col("first_ts").as("ts_a"))
    val b = firsts.select(col("u"), col("t").as("cons"), col("first_ts").as("ts_b"))
    a.join(b, Seq("u"))
      .where(col("ante") =!= col("cons"))
      .groupBy("ante", "cons")
      .agg(
        sum(when(col("ts_a") < col("ts_b"), 1L).otherwise(0L)).as("n_seq"),
        count(lit(1)).as("n_both"))
      .select(col("ante"), col("cons"), col("n_seq"), col("n_both"),
        round(col("n_seq").cast("double") / col("n_both").cast("double"), 6)
          .as("seq_frac"))
  }

  /** DuckDB mirror of [[pairSupport]]. */
  def pairSupportSql(tbl: String, userCol: String, typeCol: String,
      tsCol: String): String =
    s"""WITH firsts AS (SELECT $userCol AS u, $typeCol AS t, MIN($tsCol) AS first_ts
         FROM $tbl GROUP BY 1, 2)
       SELECT a.t AS ante, b.t AS cons,
         CAST(SUM(CASE WHEN a.first_ts < b.first_ts THEN 1 ELSE 0 END) AS BIGINT) AS n_seq,
         COUNT(*) AS n_both,
         round(CAST(SUM(CASE WHEN a.first_ts < b.first_ts THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE), 6) AS seq_frac
       FROM firsts a JOIN firsts b ON a.u = b.u AND a.t <> b.t
       GROUP BY a.t, b.t"""
}
