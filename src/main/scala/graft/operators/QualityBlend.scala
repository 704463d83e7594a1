package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank-normalized quality blending WITHOUT a global sort.
  *
  * FineWeb-style pipelines blend several per-document quality signals into
  * one score by rank-normalizing each signal first (raw signals live on
  * incomparable scales). The naive plan — `percent_rank()` per signal — is
  * one GLOBAL sort of the corpus per signal (Exchange SinglePartition +
  * Sort): at 100 TB that is S total sorts, each all-to-all. This operator
  * replaces exact ranks with a B-bucket empirical CDF, which needs only:
  *
  *   1. one scan for per-signal min/max — a single aggregate row read on
  *      the driver (2S doubles);
  *   2. one scan for the per-(signal, bucket) histogram — a map-side-
  *      combinable groupBy whose output is ≤ S·B rows, driver-collected;
  *   3. the running-sum CDF folded into S B-length LITERAL lookup arrays
  *      (≤ S·B doubles — driver-bounded by construction), applied in one
  *      scoring projection: the final plan is scan → project → sort, with
  *      ZERO joins (an earlier draft joined a tiny CDF relation back three
  *      times, and each broadcast leg re-executed the whole histogram
  *      subtree — literal lookup makes that shape impossible).
  *
  * Three corpus scans, zero corpus sorts, zero corpus-keyed shuffles, zero
  * joins. The CDF value of a doc is `cum_count(bucket ≤ own) / N` —
  * within-bucket ties share a rank, the documented approximation (error ≤
  * 1/B of the mass per signal; raise `buckets` to tighten).
  *
  * Signals are rounded to 6 decimals BEFORE bucketing and the bucket index
  * uses one fixed expression shape `((s - min) / (max - min)) * B` so a SQL
  * mirror (DuckDB) lands every doc in the same bucket bit-for-bit.
  */
object QualityBlend {

  /** Per-doc signal triple over a text column: token count, type-token
    * ratio, mean token length — all derived from ONE split-array projection.
    */
  private def signals(textCol: Column): Seq[(String, Column)] = {
    val ws = split(trim(textCol), "\\s+")
    val n = size(ws).cast("double")
    Seq(
      "tok" -> round(n, 6),
      "ttr" -> round(size(array_distinct(ws)).cast("double") / n, 6),
      "mwl" -> round(
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / n, 6)
    )
  }

  /** (doc_id, blend, decile): blend = mean of the S bucket-CDF values. */
  def blend(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 32): DataFrame = {
    val sigs = signals(col(textCol))
    val sigNames = sigs.map(_._1)

    // pass 1: per-signal min/max — ONE aggregate row on the driver
    val sr = df.agg(
      count(lit(1)).as("_n"),
      sigs.flatMap { case (nm, c) =>
        Seq(min(c).as(s"_min_$nm"), max(c).as(s"_max_$nm"))
      }: _*).head()
    val n = sr.getAs[Long]("_n")
    val rng = sigs.map { case (nm, _) =>
      nm -> ((sr.getAs[Double](s"_min_$nm"), sr.getAs[Double](s"_max_$nm")))
    }.toMap

    // shared bucket-index expression: identical arithmetic on the histogram
    // and scoring sides (and in the SQL mirror) so every doc lands once
    def bucketIdx(nm: String, c: Column): Column = {
      val (lo, hi) = rng(nm)
      if (hi == lo) lit(0L)
      else least(lit(buckets - 1L), floor(((c - lit(lo)) / lit(hi - lo)) * buckets))
    }
    def withB(base: DataFrame): DataFrame = base.select(
      col(idCol) +: sigs.map { case (nm, c) => bucketIdx(nm, c).as(s"_b_$nm") }: _*)

    // pass 2: histogram — map-side combined to ≤ S·B rows, driver-collected
    val hist = withB(df)
      .select(explode(array(sigNames.map(nm =>
        struct(lit(nm).as("sig"), col(s"_b_$nm").as("bucket"))): _*)).as("sb"))
      .groupBy(col("sb.sig").as("sig"), col("sb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect()

    // running-sum CDF per signal as a B-length literal lookup array
    val cdfArr: Map[String, Seq[Double]] = sigNames.map { nm =>
      val counts = hist.filter(_.getAs[String]("sig") == nm)
        .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("cnt")).toMap
      var cum = 0L
      nm -> (0 until buckets).map { b =>
        cum += counts.getOrElse(b.toLong, 0L)
        cum.toDouble / n
      }
    }.toMap

    // pass 3: scoring — a pure projection, zero joins
    withB(df)
      .select(col(idCol),
        round(sigNames.map(nm =>
            element_at(typedLit(cdfArr(nm)), col(s"_b_$nm").cast("int") + 1))
          .reduce(_ + _) / sigNames.size, 6).as("blend"))
      .withColumn("decile", least(lit(9L), floor(col("blend") * 10)))
      .orderBy(idCol)
  }

  /** DuckDB mirror of [[blend]] — same signals, bucket arithmetic, CDF. */
  def blendSql(table: String, idCol: String, textCol: String,
      buckets: Int = 32): String = {
    val b = buckets
    s"""WITH w AS (SELECT $idCol, string_split_regex(trim($textCol), '\\s+') AS ws FROM $table),
       sg AS (SELECT $idCol,
           round(CAST(len(ws) AS DOUBLE), 6) AS tok,
           round(CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE), 6) AS ttr,
           round(CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / CAST(len(ws) AS DOUBLE), 6) AS mwl
         FROM w),
       st AS (SELECT COUNT(*) AS n,
           MIN(tok) AS min_tok, MAX(tok) AS max_tok,
           MIN(ttr) AS min_ttr, MAX(ttr) AS max_ttr,
           MIN(mwl) AS min_mwl, MAX(mwl) AS max_mwl FROM sg),
       bi AS (SELECT $idCol,
           CASE WHEN max_tok = min_tok THEN 0
                ELSE least($b - 1, CAST(floor(((tok - min_tok) / (max_tok - min_tok)) * $b) AS BIGINT)) END AS b_tok,
           CASE WHEN max_ttr = min_ttr THEN 0
                ELSE least($b - 1, CAST(floor(((ttr - min_ttr) / (max_ttr - min_ttr)) * $b) AS BIGINT)) END AS b_ttr,
           CASE WHEN max_mwl = min_mwl THEN 0
                ELSE least($b - 1, CAST(floor(((mwl - min_mwl) / (max_mwl - min_mwl)) * $b) AS BIGINT)) END AS b_mwl
         FROM sg CROSS JOIN st),
       h AS (SELECT sig, bucket, COUNT(*) AS cnt FROM (
           SELECT 'tok' AS sig, b_tok AS bucket FROM bi
           UNION ALL SELECT 'ttr', b_ttr FROM bi
           UNION ALL SELECT 'mwl', b_mwl FROM bi) GROUP BY sig, bucket),
       cdf AS (SELECT sig, bucket,
           CAST(SUM(cnt) OVER (PARTITION BY sig ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / (SELECT n FROM st) AS cdfv
         FROM h)
       SELECT bi.$idCol,
         round((c1.cdfv + c2.cdfv + c3.cdfv) / 3, 6) AS blend,
         least(9, CAST(floor(round((c1.cdfv + c2.cdfv + c3.cdfv) / 3, 6) * 10) AS BIGINT)) AS decile
       FROM bi
       JOIN cdf c1 ON c1.sig = 'tok' AND c1.bucket = bi.b_tok
       JOIN cdf c2 ON c2.sig = 'ttr' AND c2.bucket = bi.b_ttr
       JOIN cdf c3 ON c3.sig = 'mwl' AND c3.bucket = bi.b_mwl
       ORDER BY bi.$idCol"""
  }
}
