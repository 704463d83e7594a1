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
}
