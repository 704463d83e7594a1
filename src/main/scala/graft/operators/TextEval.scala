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

  /** Shared reference/hypothesis synthesis: tokens of the lowered text
    * plus the thinned hypothesis (drop every k-th token, k = 3 + id % 5).
    */
  private def refHyp(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.parallelize(df).select(
      col(idCol).as("_b_id"),
      split(trim(lower(col(textCol))), "\\s+").as("_b_ref"),
      (lit(3) + pmod(col(idCol), lit(5))).cast("int").as("_b_k"))
      .withColumn("_b_hyp",
        filter(col("_b_ref"), (t, i) => ((i + lit(1)) % col("_b_k")) =!= lit(0)))

  /** Per-(doc, n) clipped-match + totals for token n-grams, n = 1..maxN —
    * computed ROW-LOCALLY by [[graft.functions.TokenGramStatsExpr]] (the
    * per-doc gram bags never leave the row; only maxN tiny structs per doc
    * reach the per-n aggregation). Replaces the former exploded
    * (doc, n, gram) relation + hash aggregate whose key cardinality ≈ its
    * row count — at 100 TB that exchange was the metric's whole cost, and
    * at sf0.1 it was ~18M shuffled rows for a 1.5 MB corpus.
    * GramStatsSpec pins bit-equality against the relational form; the
    * DuckDB mirrors keep the relational spelling, so every board hash is
    * an equivalence proof too.
    */
  private def gramStatsPerN(withHyp: DataFrame, refCol: String,
      hypCol: String, maxN: Int): DataFrame =
    withHyp
      .select(explode(graft.functions.GramStatsExpr.tokenGramStats(
        col(refCol), col(hypCol), maxN)).as("_b_gs"))
      .groupBy(col("_b_gs.n").as("n"))
      .agg(sum(col("_b_gs.m")).as("_b_m"),
        sum(col("_b_gs.ht")).as("_b_ht"),
        sum(col("_b_gs.rt")).as("_b_rt"))

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
    // hypothesis: drop every k-th token (0-based lambda index, so i+1 is
    // the 1-based position — DuckDB's lambda index is already 1-based)
    val withHyp = refHyp(df, idCol, textCol)
    val perN = gramStatsPerN(withHyp, "_b_ref", "_b_hyp", maxN)
      .select(col("n"), col("_b_m").as("m"), col("_b_ht").as("t"),
        col("_b_rt").as("rt"))

    // coalesce: an n with no grams at all (corpus shorter than n) has no
    // perN row. ref_len/hyp_len = the n=1 totals (Σ len − 1 + 1 = Σ len;
    // a split() array is never empty, so n=1 rows exist iff the corpus
    // is non-empty, and the un-coalesced max keeps BP null on empty input
    // exactly like the former separate lens scan).
    def pick(src: String, v: String, n: Int): Column =
      coalesce(max(when(col("n") === n, col(v))), lit(0L)).as(s"${src}_$n")
    val one = perN.agg(
      pick("match", "m", 1),
      (2 to maxN).map(pick("match", "m", _)) ++
        (1 to maxN).map(pick("total", "t", _)) ++
        Seq(max(when(col("n") === 1, col("rt"))).as("ref_len"),
          max(when(col("n") === 1, col("t"))).as("hyp_len")): _*)

    def d(c: Column) = c.cast("double")
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
      .map(n => s"COALESCE(MAX(CASE WHEN n=$n THEN m END), 0) AS match_$n").mkString(", ")
    val totalCols = (1 to maxN)
      .map(n => s"COALESCE(MAX(CASE WHEN n=$n THEN t END), 0) AS total_$n").mkString(", ")
    val logSum = (1 to maxN)
      .map(n => s"ln(CAST(match_$n AS DOUBLE) / CAST(total_$n AS DOUBLE))")
      .mkString(" + ")
    val bp = s"""CASE WHEN hyp_len >= ref_len THEN 1.0
        ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / CAST(hyp_len AS DOUBLE)) END"""
    // CAST AS BIGINT: DuckDB SUM(int) lands HUGEINT, which oracle-harness
    // canonicalizers hash differently from Spark's LongType (round-7 driver
    // fail) — every landed integer column must be BIGINT
    val sel = (1 to maxN).map(n => s"CAST(match_$n AS BIGINT) AS match_$n").mkString(", ") + ", " +
      (1 to maxN).map(n => s"CAST(total_$n AS BIGINT) AS total_$n").mkString(", ")
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
       SELECT $sel, CAST(ref_len AS BIGINT) AS ref_len,
         CAST(hyp_len AS BIGINT) AS hyp_len,
         round($bp, 6) AS bp,
         round(CASE WHEN ${(1 to maxN).map(n => s"total_$n > 0").mkString(" AND ")}
           THEN ($bp) * exp(${1.0 / maxN} * ($logSum)) ELSE 0.0 END, 6) AS bleu
       FROM mrow CROSS JOIN trow CROSS JOIN lens"""
  }

  /** Corpus ROUGE-N (Lin 2004) over the same synthesized hypothesis:
    * clipped n-gram matches scored BOTH ways — precision against the
    * hypothesis total (BLEU's denominator) and recall against the
    * REFERENCE total (ROUGE's defining denominator) — plus their F1, for
    * n = 1..maxN. Same (doc, n, gram) single-join shape as [[bleuEval]];
    * the reference totals ride the same pass.
    *
    * Output: one row per n — match/hyp_total/ref_total, precision,
    * recall, f1 (6 dp).
    */
  def rougeEval(df: DataFrame, idCol: String, textCol: String,
      maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"rougeEval: maxN out of range: $maxN")
    val withHyp = refHyp(df, idCol, textCol)
    val perN = gramStatsPerN(withHyp, "_b_ref", "_b_hyp", maxN)
      .select(col("n"), col("_b_m").as("n_match"), col("_b_ht").as("hyp_total"),
        col("_b_rt").as("ref_total"))
    def dd(c: Column) = c.cast("double")
    val p = dd(col("n_match")) / dd(col("hyp_total"))
    val r = dd(col("n_match")) / dd(col("ref_total"))
    // n-spine: the former unconditional n-explode emitted every n row even
    // when no document reaches n tokens; a one-row probe of the source
    // rebuilds that guarantee (and an empty corpus still yields 0 rows)
    val spine = withHyp.limit(1)
      .select(explode(sequence(lit(1), lit(maxN))).as("n"))
    spine
      .join(perN, Seq("n"), "left")
      .select(col("n"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        coalesce(col("hyp_total"), lit(0L)).as("hyp_total"),
        coalesce(col("ref_total"), lit(0L)).as("ref_total"))
      .select(col("n"), col("n_match"), col("hyp_total"), col("ref_total"),
        round(when(col("hyp_total") > 0, p).otherwise(lit(0.0)), 6).as("prec"),
        round(when(col("ref_total") > 0, r).otherwise(lit(0.0)), 6).as("rec"),
        round(when(col("n_match") > 0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(0.0)), 6).as("f1"))
      .orderBy("n")
  }

  /** DuckDB mirror of [[rougeEval]]. */
  def rougeEvalSql(table: String, idCol: String, textCol: String,
      maxN: Int = 2): String = {
    val ns = (1 to maxN).mkString(",")
    s"""WITH base AS (SELECT $idCol AS id,
             string_split_regex(trim(lower($textCol)),'\\s+') AS ref,
             CAST(3 + $idCol % 5 AS INT) AS k
           FROM $table),
       h AS (SELECT id, ref, list_filter(ref, (x, i) -> (i % k) != 0) AS hyp
           FROM base),
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
       mm AS (SELECT n, SUM(least(hc, COALESCE(rc, 0))) AS n_match FROM hg
           LEFT JOIN rg USING (id, n, gram) GROUP BY n),
       ht AS (SELECT n, SUM(greatest(len(hyp) - n + 1, 0)) AS hyp_total
           FROM (SELECT hyp, unnest([$ns]) AS n FROM h) GROUP BY n),
       rt AS (SELECT n, SUM(greatest(len(ref) - n + 1, 0)) AS ref_total
           FROM (SELECT ref, unnest([$ns]) AS n FROM h) GROUP BY n),
       j AS (SELECT n, COALESCE(n_match, 0) AS n_match, hyp_total, ref_total
           FROM ht JOIN rt USING (n) LEFT JOIN mm USING (n))
       SELECT n, CAST(n_match AS BIGINT) AS n_match,
         CAST(hyp_total AS BIGINT) AS hyp_total,
         CAST(ref_total AS BIGINT) AS ref_total,
         round(CASE WHEN hyp_total > 0
           THEN CAST(n_match AS DOUBLE) / CAST(hyp_total AS DOUBLE) ELSE 0.0 END, 6) AS prec,
         round(CASE WHEN ref_total > 0
           THEN CAST(n_match AS DOUBLE) / CAST(ref_total AS DOUBLE) ELSE 0.0 END, 6) AS rec,
         round(CASE WHEN n_match > 0
           THEN 2.0 * (CAST(n_match AS DOUBLE) / CAST(hyp_total AS DOUBLE))
             * (CAST(n_match AS DOUBLE) / CAST(ref_total AS DOUBLE))
             / ((CAST(n_match AS DOUBLE) / CAST(hyp_total AS DOUBLE))
               + (CAST(n_match AS DOUBLE) / CAST(ref_total AS DOUBLE)))
           ELSE 0.0 END, 6) AS f1
       FROM j
       ORDER BY n"""
  }

  /** Corpus chrF (Popović 2015): character n-gram F-β over the same
    * synthesized hypothesis, n = 1..maxN (default 6), β = 2 (recall
    * weighted double) — the tokenizer-free eval metric that survives
    * morphology and segmentation differences BLEU's word n-grams break
    * on. Whitespace is removed entirely (sacrebleu's default), so the
    * character stream crosses token boundaries.
    *
    * Same clipped-count algebra as [[bleuEval]] at character granularity:
    * integer (doc, n, gram) counts, one hash join, maxN partial sums. The
    * gram relation is ~maxN× the character count — linear, partitioned,
    * and the dominant cost, which is inherent to the metric.
    *
    * Output: one row per n with match/totals/P/R/F_β, plus a summary row
    * n = 0 carrying the macro-averaged chrF in `fbeta` (counts NULL).
    */
  def chrfEval(df: DataFrame, idCol: String, textCol: String,
      maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 10, s"chrfEval: maxN out of range: $maxN")
    val withHyp = refHyp(df, idCol, textCol)
      .select(col("_b_id"),
        array_join(col("_b_ref"), "").as("_c_ref"),
        array_join(col("_b_hyp"), "").as("_c_hyp"))
    // same row-local shape as [[gramStatsPerN]], at character granularity
    // (the exploded (doc, n, gram) relation was the dominant cost of the
    // metric — ~6× the corpus character count, shuffled; the expression
    // keeps every gram inside its row)
    val aggN = withHyp
      .select(explode(graft.functions.GramStatsExpr.charGramStats(
        col("_c_ref"), col("_c_hyp"), maxN)).as("_c_gs"))
      .groupBy(col("_c_gs.n").as("n"))
      .agg(sum(col("_c_gs.m")).as("n_match"),
        sum(col("_c_gs.ht")).as("hyp_total"),
        sum(col("_c_gs.rt")).as("ref_total"))
    def dd(c: Column) = c.cast("double")
    val b2 = beta * beta
    val p = dd(col("n_match")) / dd(col("hyp_total"))
    val r = dd(col("n_match")) / dd(col("ref_total"))
    val fb = when(col("n_match") > 0,
      lit(1.0 + b2) * p * r / (lit(b2) * p + r)).otherwise(lit(0.0))
    // n-spine from a one-row probe so short-corpus n rows survive (the
    // former unconditional totals explode guaranteed all maxN rows)
    val spine = withHyp.limit(1)
      .select(explode(sequence(lit(1), lit(maxN))).as("n"))
    val perN = spine
      .join(aggN, Seq("n"), "left")
      .select(col("n"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        coalesce(col("hyp_total"), lit(0L)).as("hyp_total"),
        coalesce(col("ref_total"), lit(0L)).as("ref_total"))
      .select(col("n"), col("n_match"), col("hyp_total"), col("ref_total"),
        round(when(col("hyp_total") > 0, p).otherwise(lit(0.0)), 6).as("prec"),
        round(when(col("ref_total") > 0, r).otherwise(lit(0.0)), 6).as("rec"),
        round(fb, 6).as("fbeta"))
    // macro chrF: mean of the ROUNDED per-n F values (exact DECIMAL mean
    // of maxN 6-dp terms — engine-order-immune by construction)
    val summary = perN.agg(
      round(sum(col("fbeta").cast("decimal(18,6)")).cast("double") /
        lit(maxN.toDouble), 6).as("fbeta"))
      .select(lit(0).as("n"), lit(null).cast("long").as("n_match"),
        lit(null).cast("long").as("hyp_total"), lit(null).cast("long").as("ref_total"),
        lit(null).cast("double").as("prec"), lit(null).cast("double").as("rec"),
        col("fbeta"))
    perN.unionByName(summary).orderBy("n")
  }

  /** DuckDB mirror of [[chrfEval]]. */
  def chrfEvalSql(table: String, idCol: String, textCol: String,
      maxN: Int = 6, beta: Double = 2.0): String = {
    val ns = (1 to maxN).mkString(",")
    val b2 = beta * beta
    s"""WITH base AS (SELECT $idCol AS id,
             string_split_regex(trim(lower($textCol)),'\\s+') AS toks,
             CAST(3 + $idCol % 5 AS INT) AS k
           FROM $table),
       h AS (SELECT id, array_to_string(toks, '') AS ref,
             array_to_string(list_filter(toks, (x, i) -> (i % k) != 0), '') AS hyp
           FROM base),
       rg AS (SELECT id, n, gram, COUNT(*) AS rc FROM (
           SELECT id, n, unnest(CASE WHEN length(ref) >= n
               THEN list_transform(range(1, length(ref)-n+2),
                 i -> substr(ref, CAST(i AS INT), n))
               ELSE CAST([] AS VARCHAR[]) END) AS gram
             FROM (SELECT id, ref, unnest([$ns]) AS n FROM h))
         GROUP BY 1, 2, 3),
       hg AS (SELECT id, n, gram, COUNT(*) AS hc FROM (
           SELECT id, n, unnest(CASE WHEN length(hyp) >= n
               THEN list_transform(range(1, length(hyp)-n+2),
                 i -> substr(hyp, CAST(i AS INT), n))
               ELSE CAST([] AS VARCHAR[]) END) AS gram
             FROM (SELECT id, hyp, unnest([$ns]) AS n FROM h))
         GROUP BY 1, 2, 3),
       mm AS (SELECT n, SUM(least(hc, COALESCE(rc, 0))) AS n_match FROM hg
           LEFT JOIN rg USING (id, n, gram) GROUP BY n),
       ht AS (SELECT n, SUM(greatest(length(hyp) - n + 1, 0)) AS hyp_total
           FROM (SELECT hyp, unnest([$ns]) AS n FROM h) GROUP BY n),
       rt AS (SELECT n, SUM(greatest(length(ref) - n + 1, 0)) AS ref_total
           FROM (SELECT ref, unnest([$ns]) AS n FROM h) GROUP BY n),
       j AS (SELECT n, COALESCE(n_match, 0) AS n_match, hyp_total, ref_total
           FROM ht JOIN rt USING (n) LEFT JOIN mm USING (n)),
       pern AS (SELECT n, n_match, hyp_total, ref_total,
           round(CASE WHEN hyp_total > 0
             THEN CAST(n_match AS DOUBLE) / CAST(hyp_total AS DOUBLE) ELSE 0.0 END, 6) AS prec,
           round(CASE WHEN ref_total > 0
             THEN CAST(n_match AS DOUBLE) / CAST(ref_total AS DOUBLE) ELSE 0.0 END, 6) AS rec,
           round(CASE WHEN n_match > 0
             THEN ${1.0 + b2} * (CAST(n_match AS DOUBLE) / CAST(hyp_total AS DOUBLE))
               * (CAST(n_match AS DOUBLE) / CAST(ref_total AS DOUBLE))
               / ($b2 * (CAST(n_match AS DOUBLE) / CAST(hyp_total AS DOUBLE))
                 + (CAST(n_match AS DOUBLE) / CAST(ref_total AS DOUBLE)))
             ELSE 0.0 END, 6) AS fbeta
         FROM j)
       SELECT n, CAST(n_match AS BIGINT) AS n_match,
         CAST(hyp_total AS BIGINT) AS hyp_total,
         CAST(ref_total AS BIGINT) AS ref_total, prec, rec, fbeta FROM pern
       UNION ALL
       SELECT 0 AS n, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         round(CAST(SUM(CAST(fbeta AS DECIMAL(18,6))) AS DOUBLE) / ${maxN.toDouble}, 6)
       FROM pern
       ORDER BY n"""
  }
}
