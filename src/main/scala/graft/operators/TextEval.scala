package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-quality metrics over reference/hypothesis text pairs —
  * the eval side of a training-data pipeline (BLEU here; the retrieval
  * twin is `Search.ndcgAtK`).
  *
  * The board query has no model outputs to score, so the hypothesis is
  * SYNTHESIZED deterministically from the reference (drop every k-th
  * token, k = 3 + doc_id % 5 — the format_sniff/mojibake_scan corruption
  * discipline, built identically in both engines), which makes corpus
  * BLEU oracle-checkable end to end: every n-gram count is an integer in
  * both engines, and only the final BP/geometric-mean arithmetic is
  * floating point (one fixed op order, rounded at 6 dp).
  */
object TextEval {

  /** Corpus BLEU-N (Papineni et al. 2002): clipped n-gram precision for
    * n = 1..maxN plus the brevity penalty, computed corpus-level (sum of
    * per-document clipped matches over sum of hypothesis n-gram totals —
    * NOT an average of per-doc scores).
    *
    * Shape at scale: one scan builds both token arrays; the gram relation
    * is (doc, n, gram)-keyed and the clip is a single hash join on that
    * key — per-doc gram types never leave their partition group, and the
    * output is maxN partial sums. Nothing driver-side.
    *
    * Output: one row — match_n / total_n for each n, corpus lengths,
    * brevity penalty and BLEU (6 dp).
    */
  def bleuEval(df: DataFrame, idCol: String, textCol: String,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"bleuEval: maxN out of range: $maxN")
    val base = Dedup.parallelize(df).select(
      col(idCol).as("_b_id"),
      split(trim(lower(col(textCol))), "\\s+").as("_b_ref"),
      (lit(3) + pmod(col(idCol), lit(5))).cast("int").as("_b_k"))
    // hypothesis: drop every k-th token (0-based lambda index, so i+1 is
    // the 1-based position — DuckDB's lambda index is already 1-based)
    val withHyp = base.withColumn("_b_hyp",
      filter(col("_b_ref"), (t, i) => ((i + lit(1)) % col("_b_k")) =!= lit(0)))
    val lens = withHyp.agg(
      sum(size(col("_b_ref"))).as("ref_len"),
      sum(size(col("_b_hyp"))).as("hyp_len"))

    def gramCounts(arrCol: String, out: String): DataFrame =
      withHyp
        .select(col("_b_id"), col(arrCol).as("_b_arr"),
          explode(sequence(lit(1), lit(maxN))).as("n"))
        .select(col("_b_id"), col("n"),
          explode(when(size(col("_b_arr")) >= col("n"),
            transform(
              sequence(lit(1), size(col("_b_arr")) - col("n") + lit(1)),
              i => array_join(slice(col("_b_arr"), i, col("n")), " ")))
            .otherwise(array().cast("array<string>"))).as("gram"))
        .groupBy("_b_id", "n", "gram")
        .agg(count(lit(1)).as(out))

    val refC = gramCounts("_b_ref", "_b_rc")
    val hypC = gramCounts("_b_hyp", "_b_hc")
    val matches = hypC
      .join(refC, Seq("_b_id", "n", "gram"), "left")
      .groupBy("n")
      .agg(sum(least(col("_b_hc"), coalesce(col("_b_rc"), lit(0L)))).as("m"))
    val totals = withHyp
      .select(explode(sequence(lit(1), lit(maxN))).as("n"),
        size(col("_b_hyp")).as("_b_hl"))
      .groupBy("n")
      .agg(sum(greatest(col("_b_hl") - col("n") + lit(1), lit(0))).as("t"))

    def pick(src: String, v: String, n: Int): Column =
      max(when(col("n") === n, col(v))).as(s"${src}_$n")
    val mRow = matches.agg(
      pick("match", "m", 1), (2 to maxN).map(pick("match", "m", _)): _*)
    val tRow = totals.agg(
      pick("total", "t", 1), (2 to maxN).map(pick("total", "t", _)): _*)

    def d(c: Column) = c.cast("double")
    val one = mRow.crossJoin(broadcast(tRow)).crossJoin(broadcast(lens))
    val bp = when(col("hyp_len") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - d(col("ref_len")) / d(col("hyp_len"))))
    val logSum = (1 to maxN)
      .map(n => log(d(col(s"match_$n")) / d(col(s"total_$n"))))
      .reduce(_ + _)
    // total_n = 0 (every hypothesis shorter than n tokens) leaves p_n
    // undefined — score 0 like unsmoothed sacrebleu, not NaN. A zero
    // MATCH count needs no guard: ln(0) = −∞ folds to exp(−∞) = 0 in
    // both engines.
    val defined = (1 to maxN).map(n => col(s"total_$n") > 0).reduce(_ && _)
    val outCols =
      (1 to maxN).map(n => col(s"match_$n")) ++
      (1 to maxN).map(n => col(s"total_$n")) ++
      Seq(col("ref_len"), col("hyp_len"),
        round(bp, 6).as("bp"),
        round(when(defined, bp * exp(lit(1.0 / maxN) * logSum))
          .otherwise(lit(0.0)), 6).as("bleu"))
    one.select(outCols: _*)
  }

  /** DuckDB mirror of [[bleuEval]] — 1-based lambda/list indexing where
    * Spark's is 0-based, identical arithmetic otherwise.
    */
  def bleuEvalSql(table: String, idCol: String, textCol: String,
      maxN: Int = 4): String = {
    val ns = (1 to maxN).mkString(",")
    val matchCols = (1 to maxN)
      .map(n => s"MAX(CASE WHEN n=$n THEN m END) AS match_$n").mkString(", ")
    val totalCols = (1 to maxN)
      .map(n => s"MAX(CASE WHEN n=$n THEN t END) AS total_$n").mkString(", ")
    val logSum = (1 to maxN)
      .map(n => s"ln(CAST(match_$n AS DOUBLE) / CAST(total_$n AS DOUBLE))")
      .mkString(" + ")
    val bp = s"""CASE WHEN hyp_len >= ref_len THEN 1.0
        ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / CAST(hyp_len AS DOUBLE)) END"""
    val sel = (1 to maxN).map(n => s"match_$n").mkString(", ") + ", " +
      (1 to maxN).map(n => s"total_$n").mkString(", ")
    s"""WITH base AS (SELECT $idCol AS id,
             string_split_regex(trim(lower($textCol)),'\\s+') AS ref,
             CAST(3 + $idCol % 5 AS INT) AS k
           FROM $table),
       h AS (SELECT id, ref, list_filter(ref, (x, i) -> (i % k) != 0) AS hyp
           FROM base),
       lens AS (SELECT SUM(len(ref)) AS ref_len, SUM(len(hyp)) AS hyp_len FROM h),
       rg AS (SELECT id, n, gram, COUNT(*) AS rc FROM (
           SELECT id, n, unnest(CASE WHEN len(ref) >= n
               THEN list_transform(range(1, len(ref)-n+2),
                 i -> array_to_string(ref[i:i+n-1], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS gram
             FROM (SELECT id, ref, unnest([$ns]) AS n FROM h))
         GROUP BY 1, 2, 3),
       hg AS (SELECT id, n, gram, COUNT(*) AS hc FROM (
           SELECT id, n, unnest(CASE WHEN len(hyp) >= n
               THEN list_transform(range(1, len(hyp)-n+2),
                 i -> array_to_string(hyp[i:i+n-1], ' '))
               ELSE CAST([] AS VARCHAR[]) END) AS gram
             FROM (SELECT id, hyp, unnest([$ns]) AS n FROM h))
         GROUP BY 1, 2, 3),
       mm AS (SELECT n, SUM(least(hc, COALESCE(rc, 0))) AS m
           FROM hg LEFT JOIN rg USING (id, n, gram) GROUP BY n),
       tt AS (SELECT n, SUM(greatest(len(hyp) - n + 1, 0)) AS t
           FROM (SELECT hyp, unnest([$ns]) AS n FROM h) GROUP BY n),
       mrow AS (SELECT $matchCols FROM mm),
       trow AS (SELECT $totalCols FROM tt)
       SELECT $sel, ref_len, hyp_len,
         round($bp, 6) AS bp,
         round(CASE WHEN ${(1 to maxN).map(n => s"total_$n > 0").mkString(" AND ")}
           THEN ($bp) * exp(${1.0 / maxN} * ($logSum)) ELSE 0.0 END, 6) AS bleu
       FROM mrow CROSS JOIN trow CROSS JOIN lens"""
  }
}
