package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level audit reports — the summary tables a data curator reads
  * before training, computed corpus-wide but with bounded outputs (rows ∝
  * sources², never documents).
  */
object Audit {

  /** Cross-source duplication matrix: for every unordered source pair, the
    * number of distinct k-token grams they share — the "how much of source B
    * is already in source A" audit (mirror-site detection, scrape-overlap
    * measurement, mixture double-counting) that per-document dedup reports
    * can't answer directly.
    *
    * Shape: one (source, gram-digest) distinct relation — explode + codegen
    * md5 + hash-partitioned distinct, exactly the [[Decontam]] gram plan —
    * then a self-join ON the digest. The join is hash-partitioned on `g`,
    * and its per-gram fan-out is bounded by the SOURCE count (a gram in all
    * s sources yields C(s,2) pairs), so candidate volume is ≤ C(s,2) ×
    * |distinct grams| worst-case and in practice ∝ shared grams only —
    * never documents². Output: ≤ C(s,2) rows.
    */
  def sourceOverlap(
      df: DataFrame,
      srcCol: String,
      textCol: String,
      k: Int = 8
  ): DataFrame = {
    // round-12 (guide §2.3, narrower types): unhex(md5) — 16 raw bytes,
    // not the 32-char hex string; a bijection, so the distinct and the
    // gram equi-join are row-identical, and g never reaches the output.
    // The (src, g) distinct + self-join shuffles were the query's bytes.
    val sg = Dedup.parallelize(df)
      .select(col(srcCol).as("src"),
        explode(graft.functions.MinHashExpr.shinglesArray(col(textCol), k)).as("gram"))
      .select(col("src"), unhex(md5(col("gram"))).as("g"))
      .distinct()
    sg.as("a")
      .join(sg.as("b"), col("a.g") === col("b.g") && col("a.src") < col("b.src"))
      .select(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** DuckDB SQL mirror of [[sourceOverlap]] over `tbl(srcCol, textCol)`. */
  def sourceOverlapSql(tbl: String, srcCol: String, textCol: String, k: Int): String = {
    val gramExpr = {
      val parts = (0 until k).map(d => s"ws[i+$d]").mkString("||' '||")
      s"""CASE WHEN len(ws) >= $k
            THEN list_transform(range(1, len(ws)-${k - 2}), i -> $parts)
            ELSE [array_to_string(ws, ' ')] END"""
    }
    s"""WITH w AS (SELECT $srcCol AS src, string_split_regex(trim($textCol),'\\s+') AS ws FROM $tbl),
       gr AS (SELECT src, unnest($gramExpr) AS gram FROM w),
       sg AS (SELECT DISTINCT src, md5(gram) AS g FROM gr)
       SELECT a.src AS source_a, b.src AS source_b, COUNT(*) AS n_shared
       FROM sg a JOIN sg b ON a.g = b.g AND a.src < b.src
       GROUP BY a.src, b.src ORDER BY source_a, source_b"""
  }

  /** Duplication inflation factor — the headline "how much of my corpus is
    * copies" number a dedup run is justified by: total token mass over the
    * token mass that would remain after keeping ONE representative (the
    * cluster label = min id, [[Dedup.nearDupClusters]]'s convention) per
    * near-dup cluster.
    *
    * Shape: the cluster relation (near-dup docs only — a small fraction of
    * the corpus) joins doc token counts once; removable mass folds per
    * cluster with a conditional sum (no window); the corpus total is one
    * map-side-combined agg. One row out.
    */
  def dupInflation(clusters: DataFrame, docTokens: DataFrame,
      idCol: String, tokCol: String): DataFrame = {
    val joined = clusters.join(docTokens, clusters("id") === docTokens(idCol))
    val perCluster = joined.groupBy("cluster_id")
      .agg(sum(col(tokCol)).as("_ct"),
        sum(when(col("id") === col("cluster_id"), col(tokCol)).otherwise(0L))
          .as("_keep"))
    val removable = perCluster
      .agg(coalesce(sum(col("_ct") - col("_keep")), lit(0L)).as("removable_tokens"))
    val total = docTokens.agg(sum(col(tokCol)).as("total_tokens"))
    total.crossJoin(broadcast(removable))
      .select(col("total_tokens"), col("removable_tokens"),
        round(col("total_tokens").cast("double") /
          (col("total_tokens") - col("removable_tokens")).cast("double"), 6)
          .as("inflation"))
  }

  /** Embedding-table hygiene report: per label, the counts and norm
    * statistics a vector pipeline gates ingest on — dimension consistency
    * (a ragged dim means a broken producer), zero vectors (cosine is
    * undefined on them; they silently poison ANN indexes), and the norm
    * range (collapsed or exploding norms flag a bad encoder checkpoint).
    *
    * Shape: ONE scan, one label-bounded aggregation; norms are the same
    * float→double left-fold [[Similarity.norm]] the retrieval operators
    * use, rounded to 6 decimals BEFORE aggregating so the DECIMAL(18,6)
    * mean is exact and partitioning-order-immune.
    */
  def embedHygiene(df: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val nrm = round(Similarity.norm(col(vecCol)), 6)
    df.select(col(labelCol).as("label"),
        size(col(vecCol)).cast("long").as("_dim"),
        nrm.as("_nrm"),
        when(nrm === 0.0, 1L).otherwise(0L).as("_z"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min("_dim").as("dim_min"), max("_dim").as("dim_max"),
        sum("_z").as("n_zero"),
        round(sum(col("_nrm").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
          .as("mean_norm"),
        min("_nrm").as("min_norm"), max("_nrm").as("max_norm"))
      .orderBy("label")
  }

  /** Token-mass concentration (Gini) per group — "is this source 10 000
    * uniform documents or three megadocs and dust?", the size-skew audit
    * that decides chunking and sampling policy. Exact Gini needs a
    * per-group SORT of all documents (an unsplittable skew hazard at
    * corpus scale); this uses the bucketized-Lorenz form on a B-bucket
    * histogram — the [[QualityBlend]] discipline — with the grouped-data
    * identity G = 1 − Σ w_b·(2·CumS_b − s_b) over value-ordered buckets
    * (within-bucket mass treated uniform: error ≤ 1/B of a bucket's
    * share; raise `buckets` to tighten). Per-bucket Gini terms round to 9
    * decimals then accumulate as DECIMAL, so the ≤B-term sum is immune to
    * partition order in both engines.
    */
  def giniConcentration(df: DataFrame, keyCol: String, value: Column,
      buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(keyCol).as("k"), value.cast("double").as("v"))
    val mm = base.agg(min(col("v")).as("lo"), max(col("v")).as("hi")).head()
    val (lo, hi) = (mm.getAs[Double]("lo"), mm.getAs[Double]("hi"))
    val b =
      if (hi == lo) lit(0L)
      else least(lit(buckets - 1L),
        floor(((col("v") - lit(lo)) / lit(hi - lo)) * buckets))
    val hist = base.select(col("k"), b.as("b"), col("v"))
      .groupBy("k", "b")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,6)")).as("m"))
    val w = Window.partitionBy("k").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("k")
    val terms = hist
      .withColumn("cumM", sum(col("m")).over(w))
      .withColumn("nT", sum(col("n")).over(tot))
      .withColumn("mT", sum(col("m")).over(tot))
      .select(col("k"), col("nT"), col("mT"),
        round((col("n").cast("double") / col("nT").cast("double")) *
          ((col("cumM").cast("double") / col("mT").cast("double")) * 2.0 -
            col("m").cast("double") / col("mT").cast("double")), 9)
          .cast("decimal(18,9)").as("term"))
    terms.groupBy(col("k").as(keyCol))
      .agg(max(col("nT")).as("n_docs"),
        round(max(col("mT")).cast("double"), 6).as("total_mass"),
        round(lit(1.0) - sum(col("term")).cast("double"), 6).as("gini"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[giniConcentration]] over a CTE `gc_base(k, v)` the
    * caller prepends. The oracle re-derives lo/hi in SQL — identical
    * doubles to the Column side's driver-read min/max (same set, same IEEE
    * subtraction), the [[QualityBlend]] mirror precedent.
    */
  def giniConcentrationSql(keyOut: String, buckets: Int = 64): String =
    s"""st AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM gc_base),
       h AS (SELECT k,
           CASE WHEN hi = lo THEN 0
                ELSE least(${buckets - 1},
                  CAST(floor(((v - lo) / (hi - lo)) * $buckets) AS BIGINT)) END AS b,
           COUNT(*) AS n,
           SUM(CAST(v AS DECIMAL(18,6))) AS m
         FROM gc_base CROSS JOIN st GROUP BY 1, 2),
       c AS (SELECT k, b, n, m,
           SUM(m) OVER (PARTITION BY k ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumM,
           SUM(n) OVER (PARTITION BY k) AS nT,
           SUM(m) OVER (PARTITION BY k) AS mT
         FROM h),
       t AS (SELECT k, nT, mT,
           CAST(round((CAST(n AS DOUBLE) / CAST(nT AS DOUBLE)) *
             ((CAST(cumM AS DOUBLE) / CAST(mT AS DOUBLE)) * 2.0 -
               CAST(m AS DOUBLE) / CAST(mT AS DOUBLE)), 9) AS DECIMAL(18,9)) AS term
         FROM c)
       SELECT k AS $keyOut, CAST(MAX(nT) AS BIGINT) AS n_docs,
         round(CAST(MAX(mT) AS DOUBLE), 6) AS total_mass,
         round(1.0 - CAST(SUM(term) AS DOUBLE), 6) AS gini
       FROM t GROUP BY k ORDER BY $keyOut"""

  /** Filter-agreement audit: the 2×2 confusion matrix and Cohen's kappa
    * between two document gates (e.g. a rule gate vs a statistical gate) —
    * the governance readout that tells a curator whether a cheap filter can
    * replace an expensive one, and how much of the corpus the gates fight
    * over. Kappa corrects raw agreement for chance agreement of the gates'
    * marginal keep-rates.
    *
    * Shape: one id-keyed join of two (id, flag) relations (compact booleans
    * — the gates themselves run in their own scans), one 4-cell aggregate,
    * one output row. Chance agreement multiplies counts as doubles so the
    * products cannot overflow at any corpus size.
    */
  def filterAgreement(gateA: DataFrame, gateB: DataFrame, idCol: String,
      aCol: String, bCol: String): DataFrame = {
    val j = gateA.select(col(idCol), col(aCol).cast("boolean").as("_fa_a"))
      .join(gateB.select(col(idCol), col(bCol).cast("boolean").as("_fa_b")),
        Seq(idCol))
    val cells = j.agg(
      count(lit(1)).as("n"),
      sum(when(col("_fa_a") && col("_fa_b"), 1L).otherwise(0L)).as("n11"),
      sum(when(col("_fa_a") && !col("_fa_b"), 1L).otherwise(0L)).as("n10"),
      sum(when(!col("_fa_a") && col("_fa_b"), 1L).otherwise(0L)).as("n01"),
      sum(when(!col("_fa_a") && !col("_fa_b"), 1L).otherwise(0L)).as("n00"))
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe = ((col("n11") + col("n10")).cast("double") *
        (col("n11") + col("n01")).cast("double") +
      (col("n01") + col("n00")).cast("double") *
        (col("n10") + col("n00")).cast("double")) / (nD * nD)
    cells.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(pe === 1.0, lit(1.0))
        .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** DuckDB mirror of [[filterAgreement]] over CTEs `ga(id, a)` and
    * `gb(id, b)` that the caller prepends (id column named `idCol`).
    */
  def filterAgreementSql(idCol: String): String =
    s"""j AS (SELECT ga.a AS a, gb.b AS b FROM ga JOIN gb USING ($idCol)),
       c AS (SELECT COUNT(*) AS n,
           CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
           CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
           CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
           CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
         FROM j),
       k AS (SELECT n, n11, n10, n01, n00,
           CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
           (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
            CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
         FROM c)
       SELECT n, n11, n10, n01, n00, round(po, 6) AS po, round(pe, 6) AS pe,
         CASE WHEN pe = 1.0 THEN 1.0
              ELSE round((po - pe) / (1.0 - pe), 6) END AS kappa
       FROM k"""

  /** McNemar's test (McNemar 1947) on two boolean gates over the SAME
    * docs: [[filterAgreement]]'s kappa says how often the gates agree;
    * McNemar asks the sharper paired question — among the DISAGREEMENTS,
    * is one gate systematically stricter? Only the off-diagonal cells
    * carry information: χ² = (|b−c|−1)²/(b+c) (continuity-corrected)
    * ~ χ²(1) under the null that disagreements split evenly. The test to
    * run before swapping gate A for gate B "because they mostly agree" —
    * mostly-agreeing gates can still drop disjoint corpus slices.
    *
    * Same id equi-join + one-row integer fold as [[filterAgreement]].
    */
  def mcnemarGates(gateA: DataFrame, gateB: DataFrame, idCol: String,
      aCol: String, bCol: String): DataFrame = {
    val j = gateA.select(col(idCol), col(aCol).cast("boolean").as("_mn_a"))
      .join(gateB.select(col(idCol), col(bCol).cast("boolean").as("_mn_b")),
        Seq(idCol))
    val cells = j.agg(count(lit(1)).as("n"),
      sum(when(col("_mn_a") && !col("_mn_b"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("_mn_a") && col("_mn_b"), 1L).otherwise(0L)).as("c"))
    def d(c: Column) = c.cast("double")
    val disc = d(abs(col("b") - col("c")))
    val chi2 = (disc - lit(1.0)) * (disc - lit(1.0)) /
      d(col("b") + col("c"))
    cells.select(col("n"), col("b").as("n_only_a"), col("c").as("n_only_b"),
      when(col("b") + col("c") > 0, round(chi2, 4)).as("chi2"),
      when(col("b") + col("c") > 0, chi2 > 3.841).as("reject_95"))
  }

  /** DuckDB mirror of [[mcnemarGates]] over caller-prepended CTEs
    * `ga(id, a)` / `gb(id, b)` — the [[filterAgreementSql]] convention.
    */
  def mcnemarGatesSql(idCol: String): String =
    s"""j AS (SELECT ga.a AS a, gb.b AS b FROM ga JOIN gb USING ($idCol)),
       c AS (SELECT COUNT(*) AS n,
           CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS c
         FROM j),
       f AS (SELECT n, b, c,
           (abs(CAST(b - c AS DOUBLE)) - 1.0)
             * (abs(CAST(b - c AS DOUBLE)) - 1.0)
             / CAST(b + c AS DOUBLE) AS chi2
         FROM c)
       SELECT n, b AS n_only_a, c AS n_only_b,
         CASE WHEN b + c > 0 THEN round(chi2, 4) END AS chi2,
         CASE WHEN b + c > 0 THEN chi2 > 3.841 END AS reject_95
       FROM f"""

  /** Cronbach's alpha (Cronbach 1951) over k boolean gate "items":
    * internal consistency — do the gates measure ONE underlying quality
    * axis (α → 1) or unrelated things (α → 0)? The scale-reliability
    * reading the agreement coefficients don't give: [[krippAlpha]] asks
    * "do raters agree per item", Cronbach asks "does the gate PANEL
    * cohere as a composite score". α = k/(k−1)·(1 − Σσ²ᵢ/σ²_T) with σ²_T
    * the variance of the summed score. One scan; integer sums until the
    * final ratios.
    */
  def cronbachAlpha(df: DataFrame, idCol: String,
      gateCols: Seq[String]): DataFrame = {
    require(gateCols.size >= 2, "cronbachAlpha: need >= 2 items")
    val k = gateCols.size
    def d(c: Column) = c.cast("double")
    val r = gateCols.map(g => when(col(g), 1L).otherwise(0L)).reduce(_ + _)
    val aggs =
      count(lit(1)).as("n") +: sum(r).as("sr") +: sum(r * r).as("srr") +:
      gateCols.zipWithIndex.map { case (g, i) =>
        sum(when(col(g), 1L).otherwise(0L)).as(s"c$i")
      }
    val cells = df.agg(aggs.head, aggs.tail: _*)
    val n = d(col("n"))
    // sample variances: item i is Bernoulli with cᵢ successes
    val itemVar = (0 until k).map { i =>
      (d(col(s"c$i")) - d(col(s"c$i")) * d(col(s"c$i")) / n) / (n - lit(1.0))
    }.reduce(_ + _)
    val totVar = (d(col("srr")) - d(col("sr")) * d(col("sr")) / n) /
      (n - lit(1.0))
    val alpha = lit(k.toDouble / (k - 1)) * (lit(1.0) - itemVar / totVar)
    cells.select(col("n"), lit(k).as("k_items"),
      round(totVar, 6).as("score_var"),
      when(totVar > 0, round(alpha, 6)).as("alpha"))
  }

  /** DuckDB mirror of [[cronbachAlpha]] over the `gj(id, g1..gk)` CTE
    * convention.
    */
  def cronbachAlphaSql(k: Int): String = {
    require(k >= 2 && k <= 6, "cronbachAlphaSql: k out of range")
    val r = (1 to k).map(g => s"CASE WHEN g$g THEN 1 ELSE 0 END")
      .mkString(" + ")
    val cSums = (1 to k).map(g =>
      s"CAST(SUM(CASE WHEN g$g THEN 1 ELSE 0 END) AS BIGINT) AS c$g")
      .mkString(", ")
    val itemVar = (1 to k).map(g =>
      s"(CAST(c$g AS DOUBLE) - CAST(c$g AS DOUBLE) * c$g / n) / (n - 1.0)")
      .mkString(" + ")
    s"""c AS (SELECT COUNT(*) AS n, CAST(SUM($r) AS BIGINT) AS sr,
           CAST(SUM(($r) * ($r)) AS BIGINT) AS srr, $cSums
         FROM gj),
       f AS (SELECT n,
           (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n) / (n - 1.0) AS totvar,
           $itemVar AS itemvar
         FROM c)
       SELECT n, $k AS k_items, round(totvar, 6) AS score_var,
         CASE WHEN totvar > 0 THEN round(
           ${k}.0 / ${k - 1} * (1.0 - itemvar / totvar), 6) END AS alpha
       FROM f"""
  }

  /** First-order partial correlation (Yule 1907): r of x,y with z held
    * fixed — r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)). The
    * collinearity audit behind feature panels: length and token count
    * both "predict" entropy until one is controlled for. One scan folds
    * every pairwise DECIMAL moment; the correlation algebra is a fixed
    * one-row double shape.
    */
  def partialCorr(df: DataFrame, xCol: String, yCol: String,
      zCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val base = Dedup.parallelize(df).select(
      col(xCol).cast("decimal(18,6)").as("x"),
      col(yCol).cast("decimal(18,6)").as("y"),
      col(zCol).cast("decimal(18,6)").as("z"))
    val mom = base.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("z")).as("sxz"), sum(col("y") * col("z")).as("syz"))
    val n = d(col("n"))
    def corr(sab: Column, sa: Column, sb: Column, saa: Column,
        sbb: Column) =
      (d(sab) - d(sa) * d(sb) / n) /
        sqrt((d(saa) - d(sa) * d(sa) / n) * (d(sbb) - d(sb) * d(sb) / n))
    val rxy = corr(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
    val rxz = corr(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
    val ryz = corr(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
    val part = (rxy - rxz * ryz) /
      sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
    mom.select(col("n"),
      round(rxy, 6).as("r_xy"), round(rxz, 6).as("r_xz"),
      round(ryz, 6).as("r_yz"),
      when(abs(rxz) < 1.0 && abs(ryz) < 1.0, round(part, 6))
        .as("r_xy_given_z"))
  }

  /** DuckDB mirror of [[partialCorr]]. */
  def partialCorrSql(tbl: String, xCol: String, yCol: String,
      zCol: String): String = {
    def c(sab: String, sa: String, sb: String, saa: String, sbb: String) =
      s"""(CAST($sab AS DOUBLE) - CAST($sa AS DOUBLE) * $sb / n)
         / sqrt((CAST($saa AS DOUBLE) - CAST($sa AS DOUBLE) * $sa / n)
              * (CAST($sbb AS DOUBLE) - CAST($sb AS DOUBLE) * $sb / n))"""
    s"""WITH base AS (SELECT CAST($xCol AS DECIMAL(18,6)) AS x,
           CAST($yCol AS DECIMAL(18,6)) AS y,
           CAST($zCol AS DECIMAL(18,6)) AS z FROM $tbl),
       mom AS (SELECT COUNT(*) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
           SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz,
           SUM(x * y) AS sxy, SUM(x * z) AS sxz, SUM(y * z) AS syz
         FROM base),
       f AS (SELECT n,
           ${c("sxy", "sx", "sy", "sxx", "syy")} AS rxy,
           ${c("sxz", "sx", "sz", "sxx", "szz")} AS rxz,
           ${c("syz", "sy", "sz", "syy", "szz")} AS ryz
         FROM mom)
       SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
         round(ryz, 6) AS r_yz,
         CASE WHEN abs(rxz) < 1.0 AND abs(ryz) < 1.0 THEN round(
           (rxy - rxz * ryz) / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
           END AS r_xy_given_z
       FROM f"""
  }

  /** Hash-uniformity audit: χ²(255) of the first-md5-byte bucket counts
    * against uniform. Every arm assignment, split, salt, and sampling
    * decision on this board rides md5 bucketing — this is the one query
    * that VALIDATES that foundation on the actual key population (a
    * pathological id scheme can't break md5, but a truncated or
    * whitespace-damaged key column can collapse buckets). Critical value
    * via Wilson–Hilferty, the [[graft.operators.Temporal.dispersionTest]]
    * closed form.
    */
  def hashUniformity(df: DataFrame, keyCol: String,
      salt: String = "arm"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val bucket = conv(substring(md5(concat(lit(salt + ":"),
      col(keyCol).cast("string"))), 1, 2), 16, 10).cast("int")
    val byB = df.select(col(keyCol)).distinct()
      .groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
    val agg = byB.agg(sum(col("c")).as("n"), count(lit(1)).as("k_seen"),
      sum((col("c").cast("decimal(19,0)") * col("c").cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("scc"),
      max(col("c")).as("cmax"), min(col("c")).as("cmin"))
    val n = d(col("n"))
    // χ² = 256/n·Σc² − n over the FULL 256-cell grid (absent cells add 0
    // to Σc² and their expectation is inside the −n term)
    val chi2 = lit(256.0) / n * d(col("scc")) - n
    val dfree = lit(255.0)
    val wh = lit(1.0) - lit(2.0) / (lit(9.0) * dfree) +
      lit(1.645) * sqrt(lit(2.0) / (lit(9.0) * dfree))
    val crit = dfree * wh * wh * wh
    agg.select(col("n").cast("long").as("n_keys"), col("k_seen"),
      col("cmax"), col("cmin"),
      round(chi2, 4).as("chi2"),
      (chi2 > crit).as("nonuniform_95"))
  }

  /** DuckDB mirror of [[hashUniformity]]. */
  def hashUniformitySql(tbl: String, keyCol: String,
      salt: String = "arm"): String =
    s"""WITH byb AS (SELECT
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($keyCol AS VARCHAR)),1,2) AS INT) AS b,
           COUNT(*) AS c
         FROM (SELECT DISTINCT $keyCol FROM $tbl) GROUP BY 1),
       agg AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS k_seen,
           SUM(CAST(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS scc,
           CAST(MAX(c) AS BIGINT) AS cmax, CAST(MIN(c) AS BIGINT) AS cmin
         FROM byb),
       f AS (SELECT n, k_seen, cmax, cmin,
           256.0 / n * CAST(scc AS DOUBLE) - n AS chi2,
           255.0 * pow(1.0 - 2.0 / (9.0 * 255.0)
             + 1.645 * sqrt(2.0 / (9.0 * 255.0)), 3) AS crit
         FROM agg)
       SELECT n AS n_keys, k_seen, cmax, cmin,
         round(chi2, 4) AS chi2, chi2 > crit AS nonuniform_95
       FROM f"""

  /** Cochran's Q (Cochran 1950): the k-gate generalization of McNemar —
    * do k binary quality gates pass systematically different FRACTIONS of
    * the same corpus? Q = (k−1)·(k·ΣC_j² − T²)/(k·T − ΣR_i²) ~ χ²(k−1),
    * with C_j the per-gate pass totals, R_i the per-doc pass counts, T the
    * grand total. The one-number governance check across a whole gate
    * panel before reading any pairwise kappa.
    *
    * Input: one relation carrying `idCol` and k boolean gate columns.
    * One scan; everything integer until the final ratio.
    */
  def cochranQ(df: DataFrame, idCol: String,
      gateCols: Seq[String]): DataFrame = {
    require(gateCols.size >= 2, "cochranQ: need >= 2 gates")
    val k = gateCols.size
    val gi = gateCols.map(g => when(col(g), 1L).otherwise(0L))
    val r = gi.reduce(_ + _)
    val aggs =
      count(lit(1)).as("n") +:
      sum(r).as("t") +:
      sum(r * r).as("sr2") +:
      gateCols.zipWithIndex.map { case (g, i) =>
        sum(when(col(g), 1L).otherwise(0L)).as(s"c$i")
      }
    val cells = df.agg(aggs.head, aggs.tail: _*)
    def d(c: Column) = c.cast("double")
    val sc2 = (0 until k).map(i => col(s"c$i") * col(s"c$i"))
      .reduce(_ + _)
    val num = lit((k - 1).toDouble) *
      (lit(k.toDouble) * d(sc2) - d(col("t")) * d(col("t")))
    val den = lit(k.toDouble) * d(col("t")) - d(col("sr2"))
    val q = num / den
    val crit = Seq(3.841, 5.991, 7.815, 9.488, 11.070)(k - 2)
    cells.select(col("n") +:
      (0 until k).map(i => col(s"c$i").as(s"pass_g${i + 1}")) :+
      when(den > 0, round(q, 4)).as("q") :+
      when(den > 0, q > crit).as("reject_95"): _*)
  }

  /** DuckDB mirror of [[cochranQ]] over a caller-prepended CTE
    * `gj(id, g1..gk)` with boolean gate columns named `g1`, `g2`, ….
    */
  def cochranQSql(k: Int): String = {
    require(k >= 2 && k <= 6, "cochranQSql: k out of range")
    val gs = (1 to k).map(i => s"g$i")
    val r = gs.map(g => s"CASE WHEN $g THEN 1 ELSE 0 END").mkString(" + ")
    val cSums = gs.zipWithIndex.map { case (g, i) =>
      s"CAST(SUM(CASE WHEN $g THEN 1 ELSE 0 END) AS BIGINT) AS c$i"
    }.mkString(", ")
    val sc2 = (0 until k).map(i => s"c$i * c$i").mkString(" + ")
    val crit = Seq(3.841, 5.991, 7.815, 9.488, 11.070)(k - 2)
    val passCols = (0 until k).map(i => s"c$i AS pass_g${i + 1}").mkString(", ")
    s"""c AS (SELECT COUNT(*) AS n, CAST(SUM($r) AS BIGINT) AS t,
           CAST(SUM(($r) * ($r)) AS BIGINT) AS sr2, $cSums
         FROM gj),
       f AS (SELECT *,
           ${k - 1}.0 * ($k.0 * CAST($sc2 AS DOUBLE)
             - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) AS num,
           $k.0 * CAST(t AS DOUBLE) - CAST(sr2 AS DOUBLE) AS den
         FROM c)
       SELECT n, $passCols,
         CASE WHEN den > 0 THEN round(num / den, 4) END AS q,
         CASE WHEN den > 0 THEN num / den > $crit END AS reject_95
       FROM f"""
  }

  /** Pareto concentration ("80/20") of a positive per-key total: the
    * share of total value held by keys above the p90/p80/p50 spend
    * percentiles. The one-row readout behind capacity planning and
    * whale-risk review — how much of the corpus value walks away with the
    * top decile of keys.
    *
    * Scale shape: one per-key agg, exact percentile THRESHOLDS (rounded
    * to 4, the percentiles convention) broadcast back as one row, then a
    * second threshold-compare agg — keys are never globally sorted (the
    * value_bands pattern; at petabyte key counts swap the percentile for
    * the histogram sketch, the folds are unchanged).
    */
  def paretoShare(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val spend = Dedup.parallelize(df)
      .select(col(keyCol).as("k"), col(valCol).cast("decimal(18,2)").as("v"))
      .groupBy("k").agg(sum(col("v")).as("s"))
    val th = spend
      .agg(percentile(d(col("s")),
        array(lit(0.9), lit(0.8), lit(0.5))).as("_q"))
      .select(round(col("_q").getItem(0), 4).as("t90"),
        round(col("_q").getItem(1), 4).as("t80"),
        round(col("_q").getItem(2), 4).as("t50"))
    spend.crossJoin(broadcast(th))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("s")).as("total"),
        sum(when(d(col("s")) >= col("t90"), col("s"))).as("s90"),
        sum(when(d(col("s")) >= col("t80"), col("s"))).as("s80"),
        sum(when(d(col("s")) >= col("t50"), col("s"))).as("s50"))
      .select(col("n_keys"),
        round(d(col("total")), 2).as("total"),
        round(d(col("s90")) / d(col("total")), 6).as("share_top10"),
        round(d(col("s80")) / d(col("total")), 6).as("share_top20"),
        round(d(col("s50")) / d(col("total")), 6).as("share_top50"))
  }

  /** DuckDB mirror of [[paretoShare]]. */
  def paretoShareSql(tbl: String, keyCol: String, valCol: String): String =
    s"""WITH spend AS (SELECT $keyCol AS k,
           SUM(CAST($valCol AS DECIMAL(18,2))) AS s FROM $tbl GROUP BY 1),
       th AS (SELECT round(quantile_cont(CAST(s AS DOUBLE), 0.9), 4) AS t90,
           round(quantile_cont(CAST(s AS DOUBLE), 0.8), 4) AS t80,
           round(quantile_cont(CAST(s AS DOUBLE), 0.5), 4) AS t50
         FROM spend),
       a AS (SELECT COUNT(*) AS n_keys, SUM(s) AS total,
           SUM(CASE WHEN CAST(s AS DOUBLE) >= t90 THEN s END) AS s90,
           SUM(CASE WHEN CAST(s AS DOUBLE) >= t80 THEN s END) AS s80,
           SUM(CASE WHEN CAST(s AS DOUBLE) >= t50 THEN s END) AS s50
         FROM spend CROSS JOIN th)
       SELECT n_keys, round(CAST(total AS DOUBLE), 2) AS total,
         round(CAST(s90 AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share_top10,
         round(CAST(s80 AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share_top20,
         round(CAST(s50 AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share_top50
       FROM a"""

  /** Krippendorff's alpha (Krippendorff 1970), nominal data, k raters per
    * item: the agreement coefficient that generalizes past two raters
    * (Cohen) without Fleiss's fixed-marginal assumption. Applied to the
    * quality-gate panel, the gates ARE the raters and their boolean
    * verdicts the codes: α = 1 − D_o/D_e over the pairable-values
    * coincidence matrix. α ≈ 0 means the panel agrees no better than its
    * pass-rate margins force; the reading [[cochranQ]]'s "rates differ"
    * verdict needs as its companion.
    *
    * For constant n_i = k binary verdicts:
    * α = 1 − [Σ_i r_i(k−r_i)·(n−1)] / [(k−1)·n_T·n_F], n = k·N — every
    * fold INTEGER until one final division.
    */
  def krippAlpha(df: DataFrame, idCol: String,
      gateCols: Seq[String]): DataFrame = {
    require(gateCols.size >= 2, "krippAlpha: need >= 2 raters")
    val k = gateCols.size
    val r = gateCols.map(g => when(col(g), 1L).otherwise(0L)).reduce(_ + _)
    val cells = df.agg(count(lit(1)).as("n_items"),
      sum(r).as("nt"), sum(r * (lit(k.toLong) - r)).as("dsum"))
    def d(c: Column) = c.cast("double")
    val nt = d(col("nt"))
    val nf = lit(k.toDouble) * d(col("n_items")) - nt
    val alpha = lit(1.0) -
      d(col("dsum")) * (lit(k.toDouble) * d(col("n_items")) - lit(1.0)) /
        (lit((k - 1).toDouble) * nt * nf)
    cells.select(col("n_items"), lit(k).as("k_raters"),
      col("nt").as("n_true"),
      when(col("nt") > 0 && col("nt") < lit(k.toLong) * col("n_items"),
        round(alpha, 6)).as("alpha"))
  }

  /** DuckDB mirror of [[krippAlpha]] over a caller-prepended CTE
    * `gj(id, g1..gk)` — the [[cochranQSql]] convention.
    */
  def krippAlphaSql(k: Int): String = {
    require(k >= 2 && k <= 6, "krippAlphaSql: k out of range")
    val r = (1 to k).map(g => s"CASE WHEN g$g THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""c AS (SELECT COUNT(*) AS n_items,
           CAST(SUM($r) AS BIGINT) AS nt,
           CAST(SUM(($r) * ($k - ($r))) AS BIGINT) AS dsum
         FROM gj)
       SELECT n_items, $k AS k_raters, nt AS n_true,
         CASE WHEN nt > 0 AND nt < $k * n_items THEN round(
           1.0 - CAST(dsum AS DOUBLE)
             * ($k.0 * CAST(n_items AS DOUBLE) - 1.0)
             / (${k - 1}.0 * CAST(nt AS DOUBLE)
                * ($k.0 * CAST(n_items AS DOUBLE) - CAST(nt AS DOUBLE))), 6)
           END AS alpha
       FROM c"""
  }

  /** Murphy decomposition of the Brier score (Murphy 1973):
    * Brier = reliability − resolution + uncertainty over probability
    * bins — splits a probabilistic gate's error into "its probabilities
    * are miscalibrated" (reliability, want 0) vs "it can't separate
    * outcomes" (resolution, want large). The companion to an ECE readout:
    * two gates with equal Brier can fail for opposite reasons.
    *
    * Input: a relation with `probCol` ∈ [0,1] (pre-rounded to 6 by the
    * caller for cross-engine determinism) and boolean `outcomeCol`.
    * Probabilities bin on a fixed 0.1 grid; every layer folds
    * round-then-DECIMAL over the ≤10-bin relation.
    */
  def brierDecomp(df: DataFrame, probCol: String,
      outcomeCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val base = Dedup.parallelize(df).select(
      col(probCol).cast("double").as("p"),
      when(col(outcomeCol), 1L).otherwise(0L).as("y"))
    val byBin = base
      .withColumn("bin", least(floor(col("p") * 10).cast("int"), lit(9)))
      .groupBy("bin")
      .agg(count(lit(1)).as("nb"),
        sum(round(col("p"), 6).cast("decimal(18,6)")).as("sp"),
        sum(col("y")).as("sy"),
        sum(round((col("p") - col("y")) * (col("p") - col("y")), 9)
          .cast("decimal(28,9)")).as("sb"))
    val tot = byBin.agg(sum(col("nb")).as("n"), sum(col("sy")).as("syt"),
      sum(col("sb")).as("sbt"))
    val terms = byBin.crossJoin(broadcast(tot))
      .select(col("n"), col("syt"), col("sbt"),
        round(d(col("nb")) *
          (d(col("sp")) / d(col("nb")) - d(col("sy")) / d(col("nb"))) *
          (d(col("sp")) / d(col("nb")) - d(col("sy")) / d(col("nb"))), 9)
          .cast("decimal(28,9)").as("rel_t"),
        round(d(col("nb")) *
          (d(col("sy")) / d(col("nb")) - d(col("syt")) / d(col("n"))) *
          (d(col("sy")) / d(col("nb")) - d(col("syt")) / d(col("n"))), 9)
          .cast("decimal(28,9)").as("res_t"))
    val ybar = d(col("syt")) / d(col("n"))
    terms.groupBy("n", "syt", "sbt")
      .agg(sum(col("rel_t")).as("srel"), sum(col("res_t")).as("sres"))
      .select(col("n").cast("long").as("n"),
        round(d(col("sbt")) / d(col("n")), 6).as("brier"),
        round(d(col("srel")) / d(col("n")), 6).as("reliability"),
        round(d(col("sres")) / d(col("n")), 6).as("resolution"),
        round(ybar * (lit(1.0) - ybar), 6).as("uncertainty"))
  }

  /** DuckDB mirror of [[brierDecomp]] over a caller-prepended CTE
    * `pb(p, y)` with p DOUBLE in [0,1] and y in {0,1}.
    */
  def brierDecompSql(): String =
    s"""byb AS (SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin,
           COUNT(*) AS nb,
           SUM(CAST(round(p, 6) AS DECIMAL(18,6))) AS sp,
           CAST(SUM(y) AS BIGINT) AS sy,
           SUM(CAST(round((p - y) * (p - y), 9) AS DECIMAL(28,9))) AS sb
         FROM pb GROUP BY 1),
       tot AS (SELECT CAST(SUM(nb) AS BIGINT) AS n,
           CAST(SUM(sy) AS BIGINT) AS syt, SUM(sb) AS sbt FROM byb),
       terms AS (SELECT n, syt, sbt,
           CAST(round(CAST(nb AS DOUBLE)
             * (CAST(sp AS DOUBLE) / nb - CAST(sy AS DOUBLE) / nb)
             * (CAST(sp AS DOUBLE) / nb - CAST(sy AS DOUBLE) / nb), 9)
             AS DECIMAL(28,9)) AS rel_t,
           CAST(round(CAST(nb AS DOUBLE)
             * (CAST(sy AS DOUBLE) / nb - CAST(syt AS DOUBLE) / n)
             * (CAST(sy AS DOUBLE) / nb - CAST(syt AS DOUBLE) / n), 9)
             AS DECIMAL(28,9)) AS res_t
         FROM byb CROSS JOIN tot),
       f AS (SELECT n, syt, sbt, SUM(rel_t) AS srel, SUM(res_t) AS sres
         FROM terms GROUP BY 1, 2, 3)
       SELECT n, round(CAST(sbt AS DOUBLE) / n, 6) AS brier,
         round(CAST(srel AS DOUBLE) / n, 6) AS reliability,
         round(CAST(sres AS DOUBLE) / n, 6) AS resolution,
         round((CAST(syt AS DOUBLE) / n) * (1.0 - CAST(syt AS DOUBLE) / n), 6)
           AS uncertainty
       FROM f"""

  /** DuckDB mirror of [[embedHygiene]]. */
  def embedHygieneSql(tbl: String, vecCol: String, labelCol: String): String =
    s"""WITH e AS (SELECT $labelCol AS label,
            CAST(len($vecCol) AS BIGINT) AS dim,
            round(sqrt(list_sum(list_transform($vecCol,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
          FROM $tbl)
        SELECT label, COUNT(*) AS n,
          MIN(dim) AS dim_min, MAX(dim) AS dim_max,
          CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
          round(CAST(SUM(CAST(nrm AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_norm,
          MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
        FROM e GROUP BY label ORDER BY label"""

  /** Lift/gain chart of a continuous score against a boolean outcome:
    * decile bands by score, per-band response rate, lift vs the overall
    * rate, and the cumulative gain reading from the BEST band down — the
    * table that answers "does this score actually rank the outcome?"
    * before anyone ships the score as a gate (a flat lift column means
    * the score is noise at ranking granularity even if its AUC looks
    * respectable).
    *
    * Determinism: band boundaries are exact percentiles rounded to 4
    * (the percentiles-query convention) broadcast as one row; banding
    * compares the raw score against those rounded thresholds — identical
    * comparisons in both engines; everything after lives on the ≤bands
    * relation.
    */
  def liftGain(scored: DataFrame, scoreCol: String, outcomeCol: String,
      bands: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bands >= 2, "liftGain: bands >= 2")
    val qs = (1 until bands).map(i => i.toDouble / bands)
    val th = scored.agg(
      transform(expr(s"percentile($scoreCol, array(${qs.mkString(",")}))"),
        q => round(q, 4)).as("_lg_q"))
    val banded = scored.crossJoin(broadcast(th))
      .select(
        (lit(1) + qs.indices.map(i =>
          when(col(scoreCol) >= element_at(col("_lg_q"), i + 1), 1)
            .otherwise(0)).reduce(_ + _)).as("band"),
        col(outcomeCol).cast("long").as("y"))
    val byBand = banded.groupBy("band")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val tot = Window.partitionBy()
    val wTop = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c: Column) = c.cast("double")
    byBand
      .withColumn("nT", sum(col("n")).over(tot))
      .withColumn("posT", sum(col("pos")).over(tot))
      .withColumn("cumPos", sum(col("pos")).over(wTop))
      .select(col("band"), col("n"), col("pos"),
        round(d(col("pos")) / d(col("n")), 6).as("rate"),
        // a corpus with ZERO positives (every gate false) must read as
        // NULL lift/gain, not a divide-by-zero under ANSI mode
        when(col("posT") > 0,
          round((d(col("pos")) / d(col("n"))) /
            (d(col("posT")) / d(col("nT"))), 4)).as("lift"),
        when(col("posT") > 0,
          round(d(col("cumPos")) / d(col("posT")), 6)).as("cum_gain"))
      .orderBy(col("band").desc)
  }

  /** DuckDB mirror of [[liftGain]] — `scoredSql` yields
    * (scoreCol, outcomeCol).
    */
  def liftGainSql(scoredSql: String, scoreCol: String, outcomeCol: String,
      bands: Int = 10): String = {
    val qs = (1 until bands).map(i => i.toDouble / bands)
    s"""WITH lgs AS ($scoredSql),
       th AS (SELECT list_transform(
           [${qs.map(q => s"quantile_cont($scoreCol, $q)").mkString(", ")}],
           q -> round(q, 4)) AS qarr FROM lgs),
       banded AS (SELECT
           1 + len(list_filter(qarr, t -> $scoreCol >= t)) AS band,
           CAST($outcomeCol AS BIGINT) AS y
         FROM lgs CROSS JOIN th),
       byb AS (SELECT band, COUNT(*) AS n,
           CAST(SUM(y) AS BIGINT) AS pos FROM banded GROUP BY band),
       c AS (SELECT band, n, pos,
           CAST(SUM(n) OVER () AS BIGINT) AS nt,
           CAST(SUM(pos) OVER () AS BIGINT) AS post,
           CAST(SUM(pos) OVER (ORDER BY band DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumpos
         FROM byb)
       SELECT CAST(band AS INT) AS band, n, pos,
         round(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
         CASE WHEN post > 0 THEN round((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(post AS DOUBLE) / CAST(nt AS DOUBLE)), 4) END AS lift,
         CASE WHEN post > 0
           THEN round(CAST(cumpos AS DOUBLE) / CAST(post AS DOUBLE), 6)
         END AS cum_gain
       FROM c ORDER BY band DESC"""
  }

  /** Exact AUC of a continuous score against a boolean outcome — the
    * threshold-free companion of [[liftGain]] (the gain table shows WHERE
    * the ranking pays; AUC is the single Mann–Whitney number reviews
    * compare). Computed WITHOUT the n_pos×n_neg pair stream: scores
    * collapse to their distinct-value TYPE relation with per-value
    * positive/negative counts, and AUC = Σ_s n⁺_s·(cumN⁻_{<s} + ½n⁻_s) /
    * (P·N) — one hash aggregation plus a value-type-bounded cumulative
    * window. All counts integer, one double division at the end.
    */
  /** Precision-recall AUC as average precision over the score ranking —
    * the imbalance-honest companion to [[scoreAuc]]: ROC AUC stays high
    * when negatives dominate because true-negative volume masks sloppy
    * top ranks; PR-AUC only rewards precision where the positives
    * actually sit. AP form: mean of precision@rank over the positive
    * rows, rank by score DESC with id ASC tie-break (total order, both
    * engines identical).
    *
    * Shape: one global rank window over the scored relation (the same
    * cost class as scoreAuc's rank construction) + one cumulative
    * window; terms round-then-DECIMAL.
    */
  def prAuc(scored: DataFrame, idCol: String, scoreCol: String,
      outcomeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val ranked = scored.select(col(idCol).as("_pr_id"),
        col(scoreCol).cast("double").as("s"),
        when(col(outcomeCol), 1L).otherwise(0L).as("y"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("s").desc, col("_pr_id"))))
    val w = Window.orderBy("rk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = ranked
      .withColumn("cum", sum(col("y")).over(w))
      .select(col("y"),
        when(col("y") === 1,
          round(d(col("cum")) / d(col("rk")), 9).cast("decimal(28,9)"))
          .as("p"))
    terms.agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("p")).as("sp"))
      .select(col("n"), col("n_pos"),
        round(d(col("n_pos")) / d(col("n")), 6).as("base_rate"),
        when(col("n_pos") > 0,
          round(d(col("sp")) / d(col("n_pos")), 6)).as("pr_auc"))
  }

  /** DuckDB mirror of [[prAuc]] over a caller-supplied scored relation
    * SQL producing (id, score, outcome-boolean).
    */
  def prAucSql(scoredSql: String, idCol: String, scoreCol: String,
      outcomeCol: String): String =
    s"""WITH sc AS ($scoredSql),
       ranked AS (SELECT CASE WHEN $outcomeCol THEN 1 ELSE 0 END AS y,
           row_number() OVER (ORDER BY CAST($scoreCol AS DOUBLE) DESC, $idCol) AS rk
         FROM sc),
       t AS (SELECT y,
           CASE WHEN y = 1 THEN CAST(round(
             CAST(SUM(y) OVER (ORDER BY rk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / rk, 9) AS DECIMAL(28,9)) END AS p
         FROM ranked)
       SELECT COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
         round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS base_rate,
         CASE WHEN SUM(y) > 0
           THEN round(CAST(SUM(p) AS DOUBLE) / SUM(y), 6) END AS pr_auc
       FROM t"""

  def scoreAuc(scored: DataFrame, scoreCol: String,
      outcomeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = scored.groupBy(col(scoreCol).cast("double").as("s"))
      .agg(sum(when(col(outcomeCol), 1L).otherwise(0L)).as("np"),
        sum(when(!col(outcomeCol), 1L).otherwise(0L)).as("nn"))
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    val tot = Window.partitionBy()
    def d(c: Column) = c.cast("double")
    // ×2 keeps the numerator INTEGER (the ½-tie term doubles away), so
    // the sum is exact under any partition order; DECIMAL(38,0) for
    // overflow headroom at corpus scale (terms are O(P·N))
    val terms = byV
      .withColumn("cumNegBelow", coalesce(sum(col("nn")).over(w), lit(0L)))
      .withColumn("p", sum(col("np")).over(tot))
      .withColumn("n", sum(col("nn")).over(tot))
      .select(col("p"), col("n"),
        (col("np") * (col("cumNegBelow") * 2 + col("nn")))
          .cast("decimal(38,0)").as("_auc_t2"))
    terms.agg(max(col("p")).as("n_pos"), max(col("n")).as("n_neg"),
        sum(col("_auc_t2")).as("_s2"))
      .select(col("n_pos"), col("n_neg"),
        // one-class corpora have no ranking to score: NULL, not a
        // divide-by-zero under ANSI mode
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(d(col("_s2")) /
            (d(col("n_pos")) * d(col("n_neg")) * 2.0), 6)).as("auc"))
  }

  /** DuckDB mirror of [[scoreAuc]]. `scoredSql` yields
    * (scoreCol, outcomeCol).
    */
  def scoreAucSql(scoredSql: String, scoreCol: String,
      outcomeCol: String): String =
    s"""WITH sa AS ($scoredSql),
       byv AS (SELECT CAST($scoreCol AS DOUBLE) AS s,
           CAST(SUM(CASE WHEN $outcomeCol THEN 1 ELSE 0 END) AS BIGINT) AS np,
           CAST(SUM(CASE WHEN $outcomeCol THEN 0 ELSE 1 END) AS BIGINT) AS nn
         FROM sa GROUP BY 1),
       c AS (SELECT np, nn,
           CAST(COALESCE(SUM(nn) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cnb,
           CAST(SUM(np) OVER () AS BIGINT) AS p,
           CAST(SUM(nn) OVER () AS BIGINT) AS n
         FROM byv)
       SELECT MAX(p) AS n_pos, MAX(n) AS n_neg,
         CASE WHEN MAX(p) > 0 AND MAX(n) > 0 THEN
           round(CAST(SUM(CAST(np * (cnb * 2 + nn) AS DECIMAL(38,0))) AS DOUBLE)
             / (CAST(MAX(p) AS DOUBLE) * CAST(MAX(n) AS DOUBLE) * 2.0), 6)
         END AS auc
       FROM c"""

  /** Fleiss' κ over G boolean gates (long format: one vote row per
    * (item, gate)) — the multi-rater generalization of the pairwise
    * Cohen κ in [[filterAgreement]]: with an ENSEMBLE of quality gates,
    * pairwise κ's G(G−1)/2 numbers obscure the one question ("do the
    * gates agree beyond chance as a panel?") this answers. Uses the
    * per-item-n generalized form, so a gate abstaining on some items
    * doesn't break the statistic.
    *
    * Exactness: per-item agreement P_i = [k(k−1)+(n−k)(n−k−1)]/(n(n−1))
    * is one fixed double shape from integers, rounded to 9 and summed as
    * DECIMAL (partition-order-immune — the [[giniConcentration]] term
    * discipline); the chance term derives from integer vote totals.
    * One item-keyed aggregation; one row out.
    */
  def fleissKappa(votes: DataFrame, idCol: String,
      voteCol: String): DataFrame = {
    val per = votes.groupBy(col(idCol))
      .agg(count(lit(1)).as("n"),
        sum(col(voteCol).cast("long")).as("k"))
      .where(col("n") >= 2) // agreement undefined on single-vote items
    def d(c: Column) = c.cast("double")
    val pi = (d(col("k")) * (d(col("k")) - 1.0) +
      (d(col("n")) - d(col("k"))) * (d(col("n")) - d(col("k")) - 1.0)) /
      (d(col("n")) * (d(col("n")) - 1.0))
    val agg = per.agg(
      count(lit(1)).as("n_items"),
      sum(col("n")).as("n_votes"),
      sum(col("k")).as("k_total"),
      sum(round(pi, 9).cast("decimal(18,9)")).as("_p_sum"))
    val p = d(col("k_total")) / d(col("n_votes"))
    val pbar = d(col("_p_sum")) / d(col("n_items"))
    val pe = p * p + (lit(1.0) - p) * (lit(1.0) - p)
    agg.select(col("n_items"), col("n_votes"),
      round(p, 6).as("p_pos"),
      round(pbar, 6).as("p_bar"),
      when(pe < 1.0, round((pbar - pe) / (lit(1.0) - pe), 4))
        .otherwise(lit(null).cast("double")).as("kappa"))
  }

  /** DuckDB mirror of [[fleissKappa]]. */
  def fleissKappaSql(votesSql: String, idCol: String,
      voteCol: String): String =
    s"""WITH fkv AS ($votesSql),
       per AS (SELECT $idCol, COUNT(*) AS n,
           CAST(SUM(CAST($voteCol AS BIGINT)) AS BIGINT) AS k
         FROM fkv GROUP BY $idCol HAVING COUNT(*) >= 2),
       a AS (SELECT COUNT(*) AS n_items,
           CAST(SUM(n) AS BIGINT) AS n_votes,
           CAST(SUM(k) AS BIGINT) AS k_total,
           SUM(CAST(round((CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)
             + (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE) - 1.0))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 9) AS DECIMAL(18,9))) AS p_sum
         FROM per),
       f AS (SELECT n_items, n_votes,
           CAST(k_total AS DOUBLE) / CAST(n_votes AS DOUBLE) AS p,
           CAST(p_sum AS DOUBLE) / CAST(n_items AS DOUBLE) AS pbar
         FROM a)
       SELECT n_items, n_votes, round(p, 6) AS p_pos, round(pbar, 6) AS p_bar,
         CASE WHEN p * p + (1.0 - p) * (1.0 - p) < 1.0
           THEN round((pbar - (p * p + (1.0 - p) * (1.0 - p)))
             / (1.0 - (p * p + (1.0 - p) * (1.0 - p))), 4)
         END AS kappa
       FROM f"""

  /** Benford first-digit audit of a positive numeric column: observed
    * leading-digit shares vs the Benford expectation log10(1 + 1/d), with
    * the χ² statistic — the fabricated-/truncated-data tripwire finance
    * and data-quality reviews run on amount columns (organically-grown
    * magnitudes follow Benford; capped, minimum-priced, or synthetic ones
    * visibly don't — the AUDIT is the point, not a pass).
    *
    * Digit extraction is float-free: the value rounds into DECIMAL cents
    * (the cross-engine-stable cast both engines share), lands in a
    * BIGINT, and the first digit comes from the INTEGER's string form —
    * identical in both engines, unlike log10/pow whose last-ulp at
    * exact powers of ten could flip a floor. One scan, a 9-row rollup.
    */
  def benford(df: DataFrame, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (col(valCol).cast("decimal(18,2)") * 100).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    // gate on the ROUNDED cents, not the raw value: (0, 0.005) rounds to 0
    // cents (whose "digit" 0 has Benford expectation ln(1+1/0) = Inf), and
    // values >= 1e16 overflow the DECIMAL(18,2) cast to a NULL digit — both
    // excluded identically here and in the mirror (cents >= 1 is NULL-false)
    val byD = df.where(cents >= 1)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    byD
      .withColumn("total", sum(col("n")).over(wAll))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6)
          .as("observed"),
        round((log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))), 6)
          .as("benford"),
        round(
          (col("n").cast("double") -
            col("total").cast("double") *
              (log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))) *
          (col("n").cast("double") -
            col("total").cast("double") *
              (log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))) /
          (col("total").cast("double") *
            (log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)))), 6)
          .as("chi2_term"))
      .orderBy("digit")
  }

  /** DuckDB mirror of [[benford]]. */
  def benfordSql(tbl: String, valCol: String): String =
    s"""WITH d AS (SELECT CAST(substr(CAST(CAST(CAST($valCol AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
         FROM $tbl WHERE CAST(CAST($valCol AS DECIMAL(18,2)) * 100 AS BIGINT) >= 1),
       byd AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
       t AS (SELECT digit, n, SUM(n) OVER () AS total FROM byd)
       SELECT digit, n,
         round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS observed,
         round((ln(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)) / ln(CAST(10.0 AS DOUBLE))), 6) AS benford,
         round((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * (ln(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)) / ln(CAST(10.0 AS DOUBLE))))
             * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * (ln(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)) / ln(CAST(10.0 AS DOUBLE))))
             / (CAST(total AS DOUBLE) * (ln(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)) / ln(CAST(10.0 AS DOUBLE)))), 6) AS chi2_term
       FROM t ORDER BY digit"""

  /** Pearson χ² test of independence between two categorical columns plus
    * Cramér's V effect size — the "is source confounded with language?"
    * audit a stratified-sampling plan runs first. Expected counts come
    * from the FULL r×c grid (absent cells still contribute e to χ²), built
    * by crossing the two bounded marginal relations; each χ² term is
    * rounded-then-DECIMAL so the sum is order-free and engine-exact; the
    * fact table shuffles once into the contingency counts.
    */
  def chi2Independence(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = obs.groupBy("a").agg(sum("o").as("na"))
    val cb = obs.groupBy("b").agg(sum("o").as("nb"))
    val n = obs.agg(sum("o")).head().getLong(0)
    val grid = ra.crossJoin(broadcast(cb))
      .join(obs, Seq("a", "b"), "left")
      .na.fill(0L, Seq("o"))
    val e = (col("na") * col("nb")).cast("double") / lit(n.toDouble)
    val term = round((col("o").cast("double") - e) * (col("o").cast("double") - e) / e, 9)
      .cast("decimal(28,9)")
    val rc = grid.agg(
      countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"),
      sum(term).as("chi2d")).head()
    val (r, c, chi2) = (rc.getLong(0), rc.getLong(1),
      rc.getDecimal(2).doubleValue())
    val dof = (r - 1) * (c - 1)
    val minDim = math.min(r - 1, c - 1)
    grid.sparkSession.range(1).select(
      lit(n).as("n"), lit(r).as("r"), lit(c).as("c"), lit(dof).as("dof"),
      round(lit(chi2), 6).as("chi2"),
      round(sqrt(lit(chi2) / lit((n * minDim).toDouble)), 6).as("cramers_v"))
  }

  /** DuckDB mirror of [[chi2Independence]]. */
  def chi2IndependenceSql(tbl: String, aCol: String, bCol: String): String =
    s"""WITH obs AS (SELECT $aCol AS a, $bCol AS b, COUNT(*) AS o FROM $tbl GROUP BY 1, 2),
       ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS na FROM obs GROUP BY a),
       cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS nb FROM obs GROUP BY b),
       tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
       grid AS (SELECT ra.a, cb.b, na, nb, COALESCE(obs.o, 0) AS o
         FROM ra CROSS JOIN cb LEFT JOIN obs ON obs.a = ra.a AND obs.b = cb.b),
       t AS (SELECT
           CAST(round((CAST(o AS DOUBLE) - CAST(na * nb AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE))
             * (CAST(o AS DOUBLE) - CAST(na * nb AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE))
             / (CAST(na * nb AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE)), 9) AS DECIMAL(28,9)) AS term,
           a, b
         FROM grid),
       agg AS (SELECT COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c,
           CAST(SUM(term) AS DOUBLE) AS chi2 FROM t)
       SELECT (SELECT n FROM tot) AS n, r, c, (r - 1) * (c - 1) AS dof,
         round(chi2, 6) AS chi2,
         round(sqrt(chi2 / CAST((SELECT n FROM tot) * least(r - 1, c - 1) AS DOUBLE)), 6) AS cramers_v
       FROM agg"""

  /** Cochran–Armitage trend test (Cochran 1954, Armitage 1955): does a
    * boolean outcome's rate move MONOTONICALLY across ordered buckets?
    * χ² independence treats buckets as unordered and wastes the ordering;
    * CA scores them 0..k−1 and tests the linear contrast
    * Z = Σsᵢ(rᵢ − nᵢp̄) / √(p̄(1−p̄)(Σsᵢ²nᵢ − (Σsᵢnᵢ)²/N)) — the
    * dose-response question "does quality degrade as docs get longer"
    * asked properly.
    *
    * Input provides an INTEGER `bucketCol` (the ordering is the score)
    * and boolean `outcomeCol`. One scan to the k-bounded bucket relation;
    * integer sums until the final ratio.
    */
  def trendTest(df: DataFrame, bucketCol: String,
      outcomeCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val byB = Dedup.parallelize(df)
      .select(col(bucketCol).cast("long").as("s"),
        when(col(outcomeCol), 1L).otherwise(0L).as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("nb"), sum(col("y")).as("rb"))
    val agg = byB.agg(sum(col("nb")).as("n"), sum(col("rb")).as("r"),
      count(lit(1)).as("k"),
      sum(col("s") * col("rb")).as("sr"),
      sum(col("s") * col("nb")).as("sn"),
      sum(col("s") * col("s") * col("nb")).as("ssn"))
    val p = d(col("r")) / d(col("n"))
    val num = d(col("sr")) - d(col("sn")) * p
    val varT = p * (lit(1.0) - p) *
      (d(col("ssn")) - d(col("sn")) * d(col("sn")) / d(col("n")))
    val z = num / sqrt(varT)
    agg.select(col("n"), col("k").as("k_buckets"),
      round(p, 6).as("overall_rate"),
      when(varT > 0, round(z, 4)).as("z"),
      when(varT > 0, abs(z) > 1.96).as("reject_95"),
      when(varT > 0,
        when(z > 0, lit("increasing")).otherwise(lit("decreasing")))
        .as("direction"))
  }

  /** DuckDB mirror of [[trendTest]]. */
  def trendTestSql(tbl: String, bucketCol: String,
      outcomeCol: String): String =
    s"""WITH byb AS (SELECT CAST($bucketCol AS BIGINT) AS s, COUNT(*) AS nb,
           CAST(SUM(CASE WHEN $outcomeCol THEN 1 ELSE 0 END) AS BIGINT) AS rb
         FROM $tbl GROUP BY 1),
       agg AS (SELECT CAST(SUM(nb) AS BIGINT) AS n, CAST(SUM(rb) AS BIGINT) AS r,
           COUNT(*) AS k,
           CAST(SUM(s * rb) AS BIGINT) AS sr,
           CAST(SUM(s * nb) AS BIGINT) AS sn,
           CAST(SUM(s * s * nb) AS BIGINT) AS ssn
         FROM byb),
       f AS (SELECT n, k, CAST(r AS DOUBLE) / n AS p,
           CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) * (CAST(r AS DOUBLE) / n) AS num,
           (CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
             * (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE) / n) AS vart
         FROM agg)
       SELECT n, k AS k_buckets, round(p, 6) AS overall_rate,
         CASE WHEN vart > 0 THEN round(num / sqrt(vart), 4) END AS z,
         CASE WHEN vart > 0 THEN abs(num / sqrt(vart)) > 1.96 END AS reject_95,
         CASE WHEN vart > 0 THEN
           CASE WHEN num / sqrt(vart) > 0 THEN 'increasing'
                ELSE 'decreasing' END END AS direction
       FROM f"""

  /** Mutual information (nats) between two categorical columns, with the
    * min-entropy-normalized form: the effect-size companion to
    * [[chi2Independence]] — χ² says WHETHER the columns associate, MI says
    * how many nats one carries about the other (and NMI puts it on [0,1]
    * so columns of different cardinality compare). The redundancy check
    * before keeping both columns as stratification keys.
    *
    * Zero cells contribute 0 to MI, so only OBSERVED cells are touched:
    * one (a,b) count agg, marginals broadcast back, terms
    * round-then-DECIMAL. Type-table-bounded throughout.
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    // barrier: the contingency table feeds ra/cb/tot/mi/dims — five
    // consumers; without it each re-expands the corpus scan+agg (measured
    // 41-Exchange plan). |a|×|b| rows — trivially bounded.
    val obs = Dedup.parallelize(df)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val ra = obs.groupBy("a").agg(sum("o").as("na"))
    val cb = obs.groupBy("b").agg(sum("o").as("nb"))
    val tot = obs.agg(sum("o").as("n"))
    val mi = obs.join(broadcast(ra), "a").join(broadcast(cb), "b")
      .crossJoin(broadcast(tot))
      .select(round((d(col("o")) / d(col("n"))) *
        log(d(col("o")) * d(col("n")) / (d(col("na")) * d(col("nb")))), 9)
        .cast("decimal(28,9)").as("t"))
      .agg(sum(col("t")).as("mi"))
    def entropyOf(m: DataFrame, cnt: String) = m.crossJoin(broadcast(tot))
      .select(round(-(d(col(cnt)) / d(col("n"))) *
        log(d(col(cnt)) / d(col("n"))), 9).cast("decimal(28,9)").as("t"))
      .agg(sum(col("t")).as("h"))
    val ha = entropyOf(ra, "na").select(col("h").as("ha"))
    val hb = entropyOf(cb, "nb").select(col("h").as("hb"))
    val dims = obs.agg(countDistinct(col("a")).as("r"),
      countDistinct(col("b")).as("c"))
    tot.crossJoin(broadcast(dims)).crossJoin(broadcast(mi))
      .crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("n"), col("r"), col("c"),
        round(d(col("mi")), 6).as("mi_nats"),
        when(least(d(col("ha")), d(col("hb"))) > 0,
          round(d(col("mi")) / least(d(col("ha")), d(col("hb"))), 6))
          .as("nmi"))
  }

  /** DuckDB mirror of [[mutualInfo]]. */
  def mutualInfoSql(tbl: String, aCol: String, bCol: String): String =
    s"""WITH obs AS (SELECT $aCol AS a, $bCol AS b, COUNT(*) AS o
           FROM $tbl GROUP BY 1, 2),
       ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS na FROM obs GROUP BY a),
       cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS nb FROM obs GROUP BY b),
       tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
       mi AS (SELECT SUM(CAST(round((CAST(o AS DOUBLE) / n)
             * ln(CAST(o AS DOUBLE) * n / (CAST(na AS DOUBLE) * nb)), 9)
           AS DECIMAL(28,9))) AS mi
         FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot),
       ha AS (SELECT SUM(CAST(round(-(CAST(na AS DOUBLE) / n)
             * ln(CAST(na AS DOUBLE) / n), 9) AS DECIMAL(28,9))) AS ha
         FROM ra CROSS JOIN tot),
       hb AS (SELECT SUM(CAST(round(-(CAST(nb AS DOUBLE) / n)
             * ln(CAST(nb AS DOUBLE) / n), 9) AS DECIMAL(28,9))) AS hb
         FROM cb CROSS JOIN tot),
       dims AS (SELECT COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c FROM obs)
       SELECT n, r, c, round(CAST(mi AS DOUBLE), 6) AS mi_nats,
         CASE WHEN least(CAST(ha AS DOUBLE), CAST(hb AS DOUBLE)) > 0
           THEN round(CAST(mi AS DOUBLE)
             / least(CAST(ha AS DOUBLE), CAST(hb AS DOUBLE)), 6) END AS nmi
       FROM tot CROSS JOIN dims CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb"""

  /** Weight of evidence + information value (the credit-scoring WOE/IV
    * audit, Siddiqi 2006) of a categorical column against a boolean
    * outcome: WOE_c = ln((good_c/G)/(bad_c/B)) says which way and how
    * hard category c leans; IV_c = (good_c/G − bad_c/B)·WOE_c sums to the
    * variable's total predictive value (rule of thumb: <0.02 useless,
    * >0.5 suspicious). The per-category readout behind "should `source`
    * be a feature or a leak?".
    *
    * One scan to category-bounded counts; totals broadcast back; terms
    * integer until the log. Categories with a zero side report NULL WOE
    * (the standard degenerate-cell treatment) rather than a fabricated
    * smoothing constant.
    */
  def woeIv(df: DataFrame, catCol: String, outcomeCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val byC = Dedup.parallelize(df)
      .select(col(catCol).as("category"),
        when(col(outcomeCol), 1L).otherwise(0L).as("y"))
      .groupBy("category")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_good"))
      .withColumn("n_bad", col("n") - col("n_good"))
    val tot = byC.agg(sum(col("n_good")).as("gt"), sum(col("n_bad")).as("bt"))
    val woe = log((d(col("n_good")) / d(col("gt"))) /
      (d(col("n_bad")) / d(col("bt"))))
    byC.crossJoin(broadcast(tot))
      .select(col("category"), col("n"), col("n_good"), col("n_bad"),
        when(col("n_good") > 0 && col("n_bad") > 0, round(woe, 4)).as("woe"),
        when(col("n_good") > 0 && col("n_bad") > 0,
          round((d(col("n_good")) / d(col("gt")) -
            d(col("n_bad")) / d(col("bt"))) * woe, 6)).as("iv_term"))
      .orderBy("category")
  }

  /** DuckDB mirror of [[woeIv]]. */
  def woeIvSql(tbl: String, catCol: String, outcomeCol: String): String =
    s"""WITH byc AS (SELECT $catCol AS category, COUNT(*) AS n,
           CAST(SUM(CASE WHEN $outcomeCol THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN $outcomeCol THEN 0 ELSE 1 END) AS BIGINT) AS n_bad
         FROM $tbl GROUP BY 1),
       tot AS (SELECT CAST(SUM(n_good) AS BIGINT) AS gt,
           CAST(SUM(n_bad) AS BIGINT) AS bt FROM byc),
       f AS (SELECT category, n, n_good, n_bad, gt, bt,
           ln((CAST(n_good AS DOUBLE) / gt) / (CAST(n_bad AS DOUBLE) / bt)) AS woe
         FROM byc CROSS JOIN tot)
       SELECT category, n, n_good, n_bad,
         CASE WHEN n_good > 0 AND n_bad > 0 THEN round(woe, 4) END AS woe,
         CASE WHEN n_good > 0 AND n_bad > 0 THEN round(
           (CAST(n_good AS DOUBLE) / gt - CAST(n_bad AS DOUBLE) / bt) * woe, 6)
           END AS iv_term
       FROM f ORDER BY category"""

  /** Wilson score interval per group for a boolean gate's pass rate — the
    * interval that stays inside [0,1] and behaves at small n / extreme p
    * where the naive normal interval fails, i.e. the right error bar for
    * "source X passes the quality gate 97% of the time (n=34)".
    *
    * One map-side-combined aggregation (two integer counts per group);
    * the closed-form double formula runs on identical integers in both
    * engines. z defaults to the 95% two-sided normal quantile.
    */
  def wilsonCi(df: DataFrame, groupCol: String, pass: Column,
      z: Double = 1.96): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(when(pass, 1L).otherwise(0L)).as("k"))
    def d(c: Column) = c.cast("double")
    val p = d(col("k")) / d(col("n"))
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / d(col("n"))
    val center = (p + z2 / (d(col("n")) * 2.0)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / d(col("n")) +
      z2 / (d(col("n")) * d(col("n")) * 4.0))) / denom
    agg.select(col(groupCol), col("n"), col("k"),
        round(p, 4).as("p_hat"),
        round(center - half, 4).as("ci_lo"),
        round(center + half, 4).as("ci_hi"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[wilsonCi]]. `passSql` is a boolean expression. */
  def wilsonCiSql(tbl: String, groupCol: String, passSql: String,
      z: Double = 1.96): String = {
    val z2 = z * z
    s"""WITH a AS (SELECT $groupCol, COUNT(*) AS n,
           CAST(SUM(CASE WHEN $passSql THEN 1 ELSE 0 END) AS BIGINT) AS k
         FROM $tbl GROUP BY $groupCol),
       f AS (SELECT $groupCol, n, k,
           CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           1.0 + $z2 / CAST(n AS DOUBLE) AS denom,
           (CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + $z2 / (CAST(n AS DOUBLE) * 2.0)) AS cnum,
           ($z * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
             + $z2 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 4.0))) AS hnum
         FROM a)
       SELECT $groupCol, n, k,
         round(p, 4) AS p_hat,
         round(cnum / denom - hnum / denom, 4) AS ci_lo,
         round(cnum / denom + hnum / denom, 4) AS ci_hi
       FROM f ORDER BY $groupCol"""
  }

  /** Leave-one-source-out (jackknife) influence of each source on the
    * corpus mean of a metric — the cheap data-ablation signal: "if I drop
    * source X, does mean document quality move?" Per-source exact
    * DECIMAL sums + one corpus total; LOO mean = (total − source) /
    * (n_total − n_source). Influence = overall mean − LOO mean (positive ⇒
    * the source pulls the metric UP).
    *
    * One aggregation over the corpus; the totals ride a window over the
    * source-bounded relation (never a second scan).
    */
  def jackknifeSource(df: DataFrame, sourceCol: String,
      value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = Window.partitionBy()
    def d(c: Column) = c.cast("double")
    val per = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(value.cast("decimal(28,6)")).as("_jk_s"))
      .withColumn("_jk_ts", sum(col("_jk_s")).over(tot))
      .withColumn("_jk_tn", sum(col("n_docs")).over(tot))
    per.select(col(sourceCol), col("n_docs"),
        round(d(col("_jk_s")) / d(col("n_docs")), 6).as("mean_src"),
        when(col("_jk_tn") > col("n_docs"),
          round(d(col("_jk_ts") - col("_jk_s")) /
            d(col("_jk_tn") - col("n_docs")), 6)).as("mean_loo"),
        when(col("_jk_tn") > col("n_docs"),
          round(d(col("_jk_ts")) / d(col("_jk_tn")) -
            d(col("_jk_ts") - col("_jk_s")) /
              d(col("_jk_tn") - col("n_docs")), 6)).as("influence"))
      .orderBy(sourceCol)
  }

  /** DuckDB mirror of [[jackknifeSource]]. `valueSql` is numeric. */
  def jackknifeSourceSql(tbl: String, sourceCol: String,
      valueSql: String): String =
    s"""WITH a AS (SELECT $sourceCol, COUNT(*) AS n_docs,
           SUM(CAST($valueSql AS DECIMAL(28,6))) AS s
         FROM $tbl GROUP BY $sourceCol),
       t AS (SELECT $sourceCol, n_docs, s,
           SUM(s) OVER () AS ts, SUM(n_docs) OVER () AS tn FROM a)
       SELECT $sourceCol, n_docs,
         round(CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_src,
         CASE WHEN tn > n_docs THEN
           round(CAST(ts - s AS DOUBLE) / CAST(tn - n_docs AS DOUBLE), 6)
         END AS mean_loo,
         CASE WHEN tn > n_docs THEN
           round(CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE)
             - CAST(ts - s AS DOUBLE) / CAST(tn - n_docs AS DOUBLE), 6)
         END AS influence
       FROM t ORDER BY $sourceCol"""

  /** Theil T inequality of a positive size column WITH its group
    * decomposition (Theil 1967): T = T_between + T_within, where
    * T_between = Σ_g (X_g/X)·ln((X_g/X)/(N_g/N)) is the share of
    * inequality explained by which GROUP a row is in. The additive story
    * a Gini cannot give: "how much of the length inequality is
    * source-vs-source, how much inside sources" — the former is a mixture
    * decision, the latter a filtering one.
    *
    * Per-row terms (xᵢ/X)·ln(xᵢ·N/X) round to 9 and fold as DECIMAL with
    * the corpus totals broadcast; the between layer is groups-bounded.
    * T_within is reported as T − T_between (the decomposition identity,
    * exact up to the declared 1e-9 term rounding).
    */
  def theilDecomp(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val rows = Dedup.parallelize(df)
      .select(col(groupCol).as("g"), col(valCol).cast("long").as("x"))
      .where(col("x") > 0)
    val tot = rows.agg(count(lit(1)).as("n"), sum(col("x")).as("xs"))
    val tTot = rows.crossJoin(broadcast(tot))
      .select(round((d(col("x")) / d(col("xs"))) *
        log(d(col("x")) * d(col("n")) / d(col("xs"))), 9)
        .cast("decimal(18,9)").as("term"))
      .agg(sum(col("term")).as("t_total"))
    val byG = rows.groupBy("g")
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("xg"))
    val tB = byG.crossJoin(broadcast(tot))
      .select(round((d(col("xg")) / d(col("xs"))) *
        log((d(col("xg")) / d(col("xs"))) / (d(col("ng")) / d(col("n")))), 9)
        .cast("decimal(18,9)").as("term"))
      .agg(sum(col("term")).as("t_between"), count(lit(1)).as("k_groups"))
    tot.crossJoin(broadcast(tTot)).crossJoin(broadcast(tB))
      .select(col("n"), col("k_groups"),
        round(d(col("t_total")), 6).as("theil_t"),
        round(d(col("t_between")), 6).as("t_between"),
        round(d(col("t_total")) - d(col("t_between")), 6).as("t_within"),
        when(d(col("t_total")) > 0,
          round(d(col("t_between")) / d(col("t_total")), 6)).as("share_between"))
  }

  /** DuckDB mirror of [[theilDecomp]]. */
  def theilDecompSql(tbl: String, groupCol: String, valCol: String): String =
    s"""WITH rows_ AS (SELECT $groupCol AS g, CAST($valCol AS BIGINT) AS x
           FROM $tbl WHERE $valCol > 0),
       tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS xs
         FROM rows_),
       tt AS (SELECT SUM(CAST(round((CAST(x AS DOUBLE) / CAST(xs AS DOUBLE))
             * ln(CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(xs AS DOUBLE)), 9)
           AS DECIMAL(18,9))) AS t_total
         FROM rows_ CROSS JOIN tot),
       byg AS (SELECT g, COUNT(*) AS ng, CAST(SUM(x) AS BIGINT) AS xg
         FROM rows_ GROUP BY g),
       tb AS (SELECT SUM(CAST(round((CAST(xg AS DOUBLE) / CAST(xs AS DOUBLE))
             * ln((CAST(xg AS DOUBLE) / CAST(xs AS DOUBLE))
               / (CAST(ng AS DOUBLE) / CAST(n AS DOUBLE))), 9)
           AS DECIMAL(18,9))) AS t_between, COUNT(*) AS k_groups
         FROM byg CROSS JOIN tot)
       SELECT n, k_groups,
         round(CAST(t_total AS DOUBLE), 6) AS theil_t,
         round(CAST(t_between AS DOUBLE), 6) AS t_between,
         round(CAST(t_total AS DOUBLE) - CAST(t_between AS DOUBLE), 6) AS t_within,
         CASE WHEN CAST(t_total AS DOUBLE) > 0
           THEN round(CAST(t_between AS DOUBLE) / CAST(t_total AS DOUBLE), 6)
           END AS share_between
       FROM tot CROSS JOIN tt CROSS JOIN tb"""
}
