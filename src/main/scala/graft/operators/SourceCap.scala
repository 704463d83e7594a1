package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source document caps (the RefinedWeb / C4 "domain cap" rule): keep at
  * most N documents per source, best-first by a caller-supplied score. Web
  * corpora are power-law by domain — a handful of sources contribute most
  * of the bytes — so the cap is both a diversity control and exactly the
  * skewed-key shape: the hot source IS the skew. Ranking goes through
  * [[TopK.perKey]] (salted two-phase), never a single per-source window
  * group.
  */
object SourceCap {

  /** (source, rank, id, score) for the ≤ n kept docs per source; rank is
    * 1-based best-first. `scoreOf` must rank deterministically given the
    * (score desc, id asc) tiebreak — any score expression works.
    */
  def capPerSource(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      scoreOf: Column,
      n: Int
  ): DataFrame = {
    val scored = df.select(
      col(sourceCol).as("source"),
      col(idCol).as("id"),
      scoreOf.cast("double").as("score"))
    TopK.perKey(scored, Seq("source"), Seq(col("score").desc, col("id").asc),
        saltFrom = col("id"), n = n)
      .select(col("source"), col("rank"), col("id"), col("score"))
  }

  /** DuckDB mirror — the naive single-window form. */
  def capPerSourceSql(tbl: String, idCol: String, sourceCol: String,
      scoreSql: String, n: Int): String =
    s"""SELECT source, rank, id, score FROM (
         SELECT $sourceCol AS source, $idCol AS id,
                CAST($scoreSql AS DOUBLE) AS score,
                CAST(row_number() OVER (
                  PARTITION BY $sourceCol
                  ORDER BY CAST($scoreSql AS DOUBLE) DESC, $idCol) AS BIGINT) AS rank
         FROM $tbl)
       WHERE rank <= $n ORDER BY source, rank"""
}
