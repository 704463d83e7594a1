package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: the split a
  * document lands in is a pure function of its id (first md5 byte of
  * "salt:id"), so it is stable across runs, engines, partitionings and
  * cluster sizes — re-running the pipeline or adding data never moves an
  * existing document between train and test. One md5 per row, codegen'd,
  * scan-parallel; the DuckDB oracle reproduces it exactly.
  */
object Sampling {

  /** md5-derived byte in [0, 256) for a record id. */
  def splitByte(idCol: Column, salt: String = "split"): Column =
    conv(substring(md5(concat(lit(salt + ":"), idCol.cast("string"))), 1, 2), 16, 10)
      .cast("int")

  /** train/valid/test ≈ 90/5/5 assignment (byte thresholds 230/243). */
  def splitOf(idCol: Column, salt: String = "split"): Column = {
    val b = splitByte(idCol, salt)
    when(b < 230, "train").when(b < 243, "valid").otherwise("test")
  }

  /** GROUP-aware split (scikit's GroupShuffleSplit discipline): the split
    * is a pure function of the GROUP key (source/domain/author), so every
    * document of a group lands in the same split — the leakage-prevention
    * rung doc-level splitting misses: near-dups inside one source
    * otherwise straddle train and test and inflate eval. Same md5-byte
    * mechanism as [[splitOf]], different salt so the two assignments are
    * independent.
    */
  def groupSplit(df: org.apache.spark.sql.DataFrame, idCol: String,
      groupCol: String, salt: String = "gsplit"): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), col(groupCol),
      splitOf(col(groupCol), salt).as("split"))

  /** Deterministic stratified sampling: EXACTLY `ceil(frac * |stratum|)`
    * rows from every stratum, chosen by md5 rank — so small strata are never
    * silently dropped (the failure mode of Bernoulli `sample()` on skewed
    * language/source distributions) and the selection is stable across
    * runs, engines and partitionings.
    *
    * One shuffle by stratum serves both windows (rank and stratum size);
    * the md5 order plus the id tie-break is a total order, so the picked
    * set is unique. Skewed strata put one stratum in one partition — the
    * documented mitigation at extreme scale is pre-splitting hot strata
    * with [[graft.operators.Skew]]-style salting and re-merging ranks,
    * which preserves the same selection because ranks only compare within
    * a stratum.
    */
  def stratifiedSample(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      stratumCol: String,
      frac: Double,
      salt: String = "sample"
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // withColumn would silently REPLACE same-named input columns and the
    // final drop would then remove the caller's data — refuse instead
    require(!df.columns.contains("_ss_rn") && !df.columns.contains("_ss_n"),
      "stratifiedSample: input already has a _ss_rn/_ss_n column")
    val key = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val byStratum = Window.partitionBy(col(stratumCol))
    df.withColumn("_ss_rn", row_number().over(byStratum.orderBy(key, col(idCol))))
      .withColumn("_ss_n", count(lit(1)).over(byStratum))
      .where(col("_ss_rn") <= ceil(col("_ss_n") * frac))
      .drop("_ss_rn", "_ss_n")
  }

  /** Temperature-flattened mixture sampling (the multilingual rebalancing
    * step: sample stratum l with probability ∝ p_l^(1/T) so rare
    * languages/sources are upweighted relative to their corpus share).
    * T = 2 specifically: the per-stratum target is
    * `ceil(min(n_l, c·sqrt(n_l)))` — inverse-sqrt flattening, which keeps
    * small strata whole and downsamples large ones toward c·sqrt(n).
    *
    * T = 2 is not arbitrary: sqrt is CORRECTLY ROUNDED under IEEE 754 in
    * every engine (unlike pow/exp, which are libm-dependent in the last
    * ulp), so `c * sqrt(n)` is bit-identical in Spark and DuckDB and the
    * ceil threshold can never flip between engines — the target count is
    * exactly reproducible, like everything else in this file.
    *
    * Same single-shuffle shape as [[stratifiedSample]]: one window per
    * stratum serves both the md5 rank and the stratum size; selection is a
    * pure function of ids. Skewed-stratum mitigation as documented there.
    */
  def temperatureSample(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      stratumCol: String,
      c: Double,
      salt: String = "sample"
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(c > 0, s"temperatureSample: need c > 0, got $c")
    require(!df.columns.contains("_ss_rn") && !df.columns.contains("_ss_n"),
      "temperatureSample: input already has a _ss_rn/_ss_n column")
    val key = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val byStratum = Window.partitionBy(col(stratumCol))
    df.withColumn("_ss_rn", row_number().over(byStratum.orderBy(key, col(idCol))).cast("long"))
      .withColumn("_ss_n", count(lit(1)).over(byStratum))
      .where(col("_ss_rn") <=
        ceil(least(col("_ss_n").cast("double"), lit(c) * sqrt(col("_ss_n").cast("double")))))
      .drop("_ss_rn", "_ss_n")
  }

  /** Deterministic mixture upsampling (the epoch-weighting step of corpus
    * assembly: "2.25 epochs of source A, 0.75 of source B"). Every document
    * of stratum s appears `floor(w_s)` or `ceil(w_s)` times such that the
    * stratum's output total is EXACTLY `floor(w_s)·n_s + ceil(frac(w_s)·n_s)`
    * — not "in expectation": the fractional epoch picks the
    * `ceil(frac·n)` md5-lowest-ranked documents of the stratum (the
    * [[stratifiedSample]] selection rule), so the extra-copy set is a pure
    * function of ids — stable across runs, engines and partitionings, and
    * `w < 1` degrades gracefully into exact fractional DOWNsampling (zero
    * copies for unranked docs).
    *
    * Each output row carries a 0-based `copy_idx` so a downstream global
    * shuffle ([[CorpusShuffle]]) separates the copies. Copies come from
    * exploding `sequence(0, n_copies−1)` — no join; one window shuffle per
    * stratum, the same single-shuffle shape as [[stratifiedSample]], then
    * the explode is scan-parallel. Weights ride as a map literal (a handful
    * of sources — at 100 TB still driver-sized: mixtures name sources, not
    * documents).
    *
    * Cross-engine exactness: quarter-step weights (.0/.25/.5/.75) are exact
    * doubles, so `frac·n` and its ceil can never flip between engines.
    */
  def mixUpsample(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      stratumCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      salt: String = "mix"
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "mixUpsample: weights must be >= 0")
    require(!df.columns.exists(Set("_mu_rn", "_mu_n", "_mu_w", "copy_idx")),
      "mixUpsample: input already has a _mu_*/copy_idx column")
    val key = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val byStratum = Window.partitionBy(col(stratumCol))
    val w =
      if (weights.isEmpty) lit(defaultWeight)
      else coalesce(
        element_at(typedlit(weights), col(stratumCol)), lit(defaultWeight))
    val copies = floor(col("_mu_w")) +
      when(col("_mu_rn") <= ceil((col("_mu_w") - floor(col("_mu_w"))) * col("_mu_n")),
        1L).otherwise(0L)
    df.withColumn("_mu_w", w)
      .withColumn("_mu_rn", row_number().over(byStratum.orderBy(key, col(idCol))).cast("long"))
      .withColumn("_mu_n", count(lit(1)).over(byStratum))
      .withColumn("copy_idx",
        explode(when(copies > 0, sequence(lit(0L), copies - 1))
          .otherwise(array().cast("array<long>"))))
      .drop("_mu_rn", "_mu_n", "_mu_w")
  }

  /** Weighted sampling WITHOUT replacement, deterministic: exactly `k` rows
    * where a row's inclusion probability at each draw is proportional to its
    * weight — the quality-weighted corpus subset selection step ("sample 1M
    * docs, prefer high-quality ones") done in one pass instead of k draws.
    *
    * Efraimidis–Spirakis (IPL 2006): assign each row the key u^(1/w) for
    * u ~ U(0,1) and take the k LARGEST keys — provably equivalent to
    * sequential weighted draws without replacement. Here u is the md5-unit
    * of the id (15 hex digits / 16^15 — the [[splitByte]] determinism
    * mechanism widened to 60 bits), so the sample is a pure function of ids
    * and weights: stable across runs, engines, partitionings.
    *
    * Ranking uses the order-equivalent ln(u)/w (descending) — no pow, whose
    * last-ulp is libm-dependent; ln's possible 1-ulp cross-engine skew is
    * masked by round(9) with the id as total-order tie-break. The float key
    * never reaches the output. Plan shape: one scan + TakeOrderedAndProject
    * (per-partition top-k, k rows to the driver side of the exchange) — no
    * global sort, no corpus-sized window.
    */
  def weightedSample(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String = "ws"
  ): org.apache.spark.sql.DataFrame = {
    val u = conv(
      substring(md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 15),
      // 16^15 = 2^60 as an exact double literal — not Math.pow, whose
      // last-ulp exactness libm does not guarantee cross-engine
      16, 10).cast("double") / lit((1L << 60).toDouble)
    val key = round(log(u) / weight.cast("double"), 9)
    df.where(weight > 0)
      .withColumn("_ws_key", key)
      .orderBy(col("_ws_key").desc, col(idCol))
      .limit(k)
      .drop("_ws_key")
  }

  /** Duplication-debiased sampling: weight each document by the inverse of
    * its near-duplicate CLUSTER size (singletons weigh 1), then draw the
    * deterministic Efraimidis–Spirakis sample — so a template farm that
    * near-duplicated itself 1000× contributes ~one expected draw, not
    * 1000, without hard-deleting anything (C4-style dedup-THEN-sample as
    * one soft operator; the keep-probability view of [[Dedup]]'s
    * representative picking).
    *
    * `clusters` is the (id, cluster-label) relation —
    * [[Dedup.nearDupClusters]] output; docs absent from it are singleton
    * clusters. The cluster-size table is |clusters|-bounded (≪ corpus) and
    * broadcast; the draw itself is the [[weightedSample]] TakeOrdered — no
    * global sort, no corpus-sized window.
    */
  def clusterBalancedSample(docs: org.apache.spark.sql.DataFrame,
      idCol: String, clusters: org.apache.spark.sql.DataFrame,
      clusterIdCol: String, clusterLabelCol: String, k: Int,
      salt: String = "cbs"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val sizes = clusters
      .groupBy(col(clusterLabelCol).as("_cb_l"))
      .agg(count(lit(1)).as("_cb_sz"))
    val labeled = clusters.select(col(clusterIdCol).cast("long").as("_cb_id"),
      col(clusterLabelCol).as("_cb_l"))
    val weighted = docs
      .join(broadcast(labeled), docs(idCol).cast("long") === col("_cb_id"), "left")
      .join(broadcast(sizes), Seq("_cb_l"), "left")
      .withColumn("_cb_w",
        lit(1.0) / coalesce(col("_cb_sz"), lit(1L)).cast("double"))
    weightedSample(weighted, idCol, col("_cb_w"), k, salt)
      .select(col(idCol), coalesce(col("_cb_sz"), lit(1L)).as("cluster_size"),
        round(col("_cb_w"), 6).as("weight"))
      .orderBy(idCol)
  }

  /** DoReMi-style mixture reweighting (Xie et al. 2023, simplified to one
    * proxy round): per-source token-weighted average unigram NLL under the
    * CORPUS-WIDE model, excess over the easiest source, and a softmax of
    * `eta * excess` as the next-epoch sampling weight — hard domains (high
    * excess loss) get upweighted, the DoReMi direction.
    *
    * Engine-exact discipline: the NLL fold is [[TextAnalysis.unigramLogprob]]
    * grouped AT SOURCE GRANULARITY (rounded-then-DECIMAL term sums — no
    * float-order sensitivity), the reference point is a MIN (order-free),
    * and the softmax terms are rounded to 8 decimals then summed as DECIMAL
    * before the one normalizing division. Shape: one corpus token scan into
    * a source x term relation; everything downstream is type-table-sized.
    */
  /** Data-budget epoch planner (the Muennighoff-style question: "with a
    * token budget B and sqrt-smoothed source mixture, how many EPOCHS of
    * each source will training see?"): per-source token mass → smoothed
    * sampling weight w_s ∝ √tokens_s → allocated tokens B·w_s → epochs =
    * allocated / available. Epochs > 1 flag the sources that will repeat
    * (and should worry a dedup-conscious curator); the √ smoothing is the
    * standard low-resource boost (α = 0.5 exactly, BECAUSE sqrt is
    * IEEE-correctly-rounded in every engine while pow(x, 0.55) is not).
    *
    * One token-count aggregation per source; the corpus total rides a
    * window over the source-bounded relation. √tokens rounds to 8 and
    * sums through DECIMAL — exact under any partition order.
    */
  def epochPlanner(df: DataFrame, sourceCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = Window.partitionBy()
    def d(c: Column) = c.cast("double")
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol))).as("n_tokens"))
      .withColumn("_ep_w", round(sqrt(d(col("n_tokens"))), 8))
      .withColumn("_ep_tot",
        sum(col("_ep_w").cast("decimal(28,8)")).over(tot).cast("double"))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(col("_ep_w") / col("_ep_tot"), 6).as("weight"),
        round(lit(budgetTokens.toDouble) * col("_ep_w") / col("_ep_tot"), 3)
          .as("alloc_tokens"),
        round(lit(budgetTokens.toDouble) * col("_ep_w") / col("_ep_tot") /
          d(col("n_tokens")), 4).as("epochs"))
      .orderBy(sourceCol)
  }

  /** DuckDB mirror of [[epochPlanner]]. */
  def epochPlannerSql(tbl: String, sourceCol: String, textCol: String,
      budgetTokens: Long): String =
    s"""WITH a AS (SELECT $sourceCol, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim($textCol), '\\s+'))) AS BIGINT) AS n_tokens
         FROM $tbl GROUP BY $sourceCol),
       w AS (SELECT $sourceCol, n_docs, n_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)), 8) AS ww FROM a),
       t AS (SELECT *, CAST(SUM(CAST(ww AS DECIMAL(28,8))) OVER () AS DOUBLE) AS tot FROM w)
       SELECT $sourceCol, n_docs, n_tokens,
         round(ww / tot, 6) AS weight,
         round(CAST($budgetTokens AS DOUBLE) * ww / tot, 3) AS alloc_tokens,
         round(CAST($budgetTokens AS DOUBLE) * ww / tot / CAST(n_tokens AS DOUBLE), 4) AS epochs
       FROM t ORDER BY $sourceCol"""

  def mixtureReweight(df: DataFrame, sourceCol: String, textCol: String,
      eta: Double = 1.0): DataFrame = {
    val perSource = TextAnalysis.unigramLogprob(df, sourceCol, textCol)
    val ref = broadcast(perSource.agg(min(col("avg_nll")).as("ref_nll")))
    perSource.crossJoin(ref)
      .withColumn("excess", col("avg_nll") - col("ref_nll"))
      .withColumn("_mw_raw",
        round(exp(lit(eta) * col("excess")), 8).cast("decimal(28,8)"))
      .withColumn("_mw_sum",
        sum(col("_mw_raw")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col(sourceCol), col("n_toks"),
        round(col("avg_nll"), 6).as("avg_nll"),
        round(col("excess"), 6).as("excess"),
        round(col("_mw_raw").cast("double") / col("_mw_sum").cast("double"), 6)
          .as("weight"))
      .orderBy(sourceCol)
  }

  /** DuckDB mirror of [[mixtureReweight]] -- the unigramLogprob fold at
    * source granularity, then the same min-ref/softmax arithmetic. */
  def mixtureReweightSql(tbl: String, sourceCol: String, textCol: String,
      eta: Double = 1.0): String =
    s"""WITH tf AS (SELECT $sourceCol AS src, term, COUNT(*) AS tf FROM (
           SELECT $sourceCol, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
           FROM $tbl) GROUP BY 1, 2),
       freq AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY term),
       tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t_total FROM freq),
       nll AS (SELECT term, CAST(round(ln(CAST((SELECT t_total FROM tot) AS DOUBLE) / CAST(cnt AS DOUBLE)), 4) AS DECIMAL(18,4)) AS nll FROM freq),
       ps AS (SELECT src, CAST(SUM(tf) AS BIGINT) AS n_toks,
           CAST(SUM(CAST(tf AS DECIMAL(18,4)) * nll) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE) AS avg_nll
         FROM tf JOIN nll USING (term) GROUP BY src),
       r AS (SELECT src, n_toks, avg_nll,
           avg_nll - (SELECT MIN(avg_nll) FROM ps) AS excess FROM ps),
       w AS (SELECT src, n_toks, avg_nll, excess,
           CAST(round(exp($eta * excess), 8) AS DECIMAL(28,8)) AS raw FROM r)
       SELECT src AS $sourceCol, n_toks,
         round(avg_nll, 6) AS avg_nll, round(excess, 6) AS excess,
         round(CAST(raw AS DOUBLE) / CAST((SELECT CAST(SUM(raw) AS DECIMAL(38,8)) FROM w) AS DOUBLE), 6) AS weight
       FROM w ORDER BY $sourceCol"""
}
