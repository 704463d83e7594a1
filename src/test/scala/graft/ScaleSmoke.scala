package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-up smoke (diagnostic main, not a spec): materializes a 10× slice of
  * the bench tables the 5 most expensive queries read (events, documents,
  * orders) and times each query at sf0.1 vs the 10× slice, printing a
  * markdown row per query. The claim under test is the plan-audit one —
  * no superlinear blowup: t(10×) ≲ 10 × t(1×) + constant overhead.
  *
  * The replicas are deterministic and STRUCTURE-PRESERVING:
  *   - unique keys (event_id, doc_id, o_orderkey) are offset per replica so
  *     cardinalities scale exactly 10×;
  *   - document text is word-salted per replica (`w` → `w_rN`) so the
  *     shingle sets of different replicas are DISJOINT — near-dup structure
  *     per replica is identical to the original instead of every replica
  *     pair colliding into a quadratic cross-replica candidate blowup
  *     (which would measure a data-shape change, not engine scaling);
  *   - events keep their user_id (per-user density ×10 — the as-of window
  *     partitions must absorb it) with ts perturbed +rep ns to break ties.
  */
object ScaleSmoke {

  private val QUERIES = Seq(
    "neardup_pairs", "neardup_clusters", "bfl_xml_helper", "percentiles", "asof_join",
    // round-4 session-2 additions: both decontamination shapes read only the
    // replicated documents slice
    "decontam_ngram", "decontam_neardup",
    // session-3 additions: the new heaviest documents-table shapes — span
    // detection + strip, the bloom-gated decontam, CDC chunking
    "dup_spans", "dup_spans_strip", "decontam_bloom", "cdc_chunks",
    // session-5 additions: the bigram relation (vocab² keys), BM25 ranking,
    // sketched overlap (all documents-table)
    "bigram_logprob", "bm25_search", "kmv_overlap",
    // session-6 additions: the new documents-table shapes — DSIR feature
    // scoring, the CMS counter matrix, positional phrase match
    "dsir_weights", "cms_heavy", "phrase_search",
    // round-5 additions: the new documents-table shapes — Aho-Corasick
    // dictionary pass, salted per-source caps/heavy-hitters, co-occurrence
    // + PMI, one-pass normalization, fingerprint-reduced snapshot diff
    "dict_tag", "source_cap", "per_source_heavy", "cooccur_counts", "pmi_top",
    "text_normalize", "corpus_diff",
    // round-5 session-2: the heaviest remaining LM stat, the embeddings
    // shapes (replica slice keeps vectors verbatim — ranking ties break on
    // id deterministically), keyness folds, events burstiness
    "kn_logprob", "source_keyness", "burstiness", "knn_label", "label_margin",
    // round-5 session-3: event-sequence shapes (user-keyed funnel chain,
    // transition window, cohort joins), the trigram type-table diversity,
    // hard-negative mining over the replicated embeddings, perplexity
    // bucketing (two corpus scans + type-table join)
    "funnel", "event_transitions", "cohort_retention", "decay_agg",
    "ngram_diversity", "hard_negatives", "ppl_buckets",
    // round-5 session-3 (cont.): Gram-matrix covariance accumulation,
    // per-user range-frame rolling window, driver-bounded PCA projection
    "cov_matrix", "rolling_7d", "pca_project",
    // rate-anomaly window over per-type bucket counts; Zipf OLS over the
    // per-source type table
    "rate_anomaly", "zipf_fit",
    // round-5 session-4: attribution/timing/RFM event shapes, journey
    // trigrams, exact APSS over shingle tf-idf, ES weighted sampling,
    // manifest agg over the pack_shards assignment
    "attribution", "funnel_timing", "rfm_scores", "path_trigrams",
    "apss_pairs", "weighted_sample", "shard_manifest",
    // triangle census over the near-dup graph; PRF expansion (feedback
    // semi-join + df fold); PSI drift (one-scan bounded aggs)
    "neardup_triangles", "prf_expand", "psi_drift", "simhash_pairs",
    "asof_join_fwd", "vocab_coverage", "shard_mix", "dup_inflation",
    "jm_logprob", "multimodal_dims", "contrastive_triplets",
    "ab_conversion",
    // round-5 session-5: SCD2 broadcast upsert, histogram-CDF blend (three
    // scans, zero corpus sorts), calibration over cold-built pairs; plus
    // gopher_rules (session-3, never smoked)
    "scd2_merge", "quality_blend", "minhash_calib", "gopher_rules",
    // gap-fill grid (per-key calendar windows), pivot/melt reshaping,
    // embedding hygiene scan
    "gap_fill", "pivot_counts", "unpivot_wide", "embed_hygiene",
    "filter_agreement", "incr_agg_merge", "time_folds", "profile_stats",
    "quantile_calib", "kmv_calib", "bootstrap_ci", "ab_value_ttest",
    "daily_trend", "dow_profile", "changepoint", "gini_tokens",
    "seasonal_residuals", "retrieval_eval", "theil_sen", "gap_quantiles",
    "dedup_sweep",
    // round-6 additions: CUPED + Markov attribution (event shapes), the
    // novelty type-table fold, cluster-derived sampling/decisions/sizes,
    // EWMA + KM gap survival (bounded calendar/bucket relations), privacy
    // rollups, readability/script scans, contamination report, the TPC-H
    // pushdown pair, the collected-pool MMR
    "cuped_adjust", "markov_attribution", "ngram_novelty",
    "cluster_balanced_sample", "dedup_decisions", "cluster_sizes",
    "ewma_daily", "km_gap_survival", "k_anonymity", "dp_counts",
    "readability", "script_profile", "embed_drift", "decontam_report",
    "q6_forecast", "q14_promo", "mmr_topk",
    // round-6 session-2: bucket-bounded calibration/trend/agreement/audit
    // shapes + the grid cross-correlation
    "isotonic_calib", "daily_xcorr", "benford_audit", "mann_kendall",
    "fleiss_kappa", "corpus_datasheet", "trimmed_mean_ab",
    "entropy_rate", "shuffle_runs", "wasserstein_drift", "lift_gain", "score_auc", "autocorr_daily", "stl_decompose",
    // round-7 additions: the integer-exact HLL sketch, encoding audit,
    // privacy/association/drift tests, and the new TPC-H fact shapes
    "hll_distinct", "mojibake_scan", "l_diversity", "t_closeness",
    "chi2_assoc", "ks_drift", "q4_priority", "q7_volume", "q10_returned",
    "q18_large_orders", "q19_brackets", "bfl_descent", "multimodal_pixels",
    "image_neardup",
    // round-7 session-2: the TPC-H completion — every remaining fact-table
    // shape (dims replicate verbatim, so broadcast sides stay small while
    // lineitem/orders scale 10×)
    "q2_mincost", "q8_share", "q9_profit", "q11_important", "q12_latestatus",
    "q13_custdist", "q15_top_supplier", "q16_supplier_cnt", "q17_small_qty",
    "q20_promo_suppliers", "q21_waiting", "q22_opportunity",
    // round-7 session-2: the late-batch pipeline ops, the MOSS overlap
    // join, the two-phase skyline, the NB classifier, the MP4 walk
    "dedup_weights", "split_leakage", "mixture_reweight", "loop_detector",
    "quality_funnel", "multimodal_mp4", "winnow_overlap", "skyline_orders",
    "nb_classify",
    // round-8 additions: the per-track MP4 walk (documents-derived assets)
    // and the windowed AP/MRR panel that replaced map_eval
    "mp4_tracks",
    // round-7 session-3: the density suite (board names serve the
    // AUTO-WIDTH path since round 9 — candidates/row bounded as n grows),
    // the hashing-trick embedding, vocab-growth/rank stats, the budget
    // planner
    "lof_outliers", "dbscan_clusters", "hubness", "hash_embed", "heaps_law",
    "spearman_corr", "tail_index", "rbo_overlap", "epoch_planner",
    "wilson_ci", "jackknife_source", "js_divergence",
    // round-7 session-3 (cont.): conformal bands + sequential A/B (event
    // rollups), first-occurrence pair mining, the two-sort nearest as-of,
    // the broadcast-panel ANN recall audit, source-keyed quantile
    // normalization, the Expand grouping-sets tally
    "conformal_intervals", "seq_support", "asof_nearest", "ann_recall",
    "quantile_norm", "msprt_ab", "grouping_sets_mix",
    // batch 2: per-group KS windows + BH step-up, the NB reliability pass
    // (docs×C posterior relation), DiD arm rollup, the one-pass sniffer
    "bh_fdr", "ece_reliability", "diff_in_diff", "format_sniff",
    // batch 3: per-doc Luhn candidate explode, the train/held-out unigram
    // split, arm-moment power closed form, the calendar self-join MASE
    "pii_luhn", "heldout_ppl", "power_planner", "mase_eval", "shard_digest",
    // graph diagnostics over the near-dup pair graph + the langid eval
    "two_hop_reach", "dup_assortativity", "lang_confusion",
    // real-decode multimodal: PCM16 feature pass (mapPartitions batch)
    "wav_features",
    // batch 5: set ops, chance-corrected agreement, token-mass quantiles
    // (per-source window), the dedup token-savings curve
    "intersect_except", "cohen_kappa", "weighted_quantiles", "dedup_savings",
    // session-4 eval-metric batch: clipped n-gram joins (token + char),
    // BM25 NDCG panel, the value-type-table rank-sum, the calendar Holt
    // fold, token-pair diversity; jw_linkage is dictionary-bounded (part
    // stays verbatim — flat ratio IS the claim)
    "bleu_eval", "rouge_eval", "chrf_eval", "ndcg_eval", "mann_whitney",
    "holt_linear", "simpson_diversity", "jw_linkage",
    // session-4 diversity/style batch: seasonal pair join, char type
    // table, window TTR, z-profile pairs, paragraph-hash semi-join
    "seasonal_mk", "char_entropy", "mattr_ttr", "burrows_delta", "para_dedup",
    // session-4 stat-test batch: confusion-matrix MCC, group-moment ANOVA
    // pair, the autocorr-panel portmanteau
    "mcc_eval", "anova_length", "levene_test", "ljung_box",
    // session-4 batch 5: grid tau, bigram type-table LLR, weekly block
    // maxima, local clustering over the near-dup graph
    "kendall_tau", "collocation_llr", "extreme_value", "clustering_coeff",
    // session-4 batch 6: doubled-rank Friedman, Theil decomposition,
    // R/S Hurst slope
    "friedman_test", "theil_decomp", "hurst_exponent",
    // session-4 batch 7: Kruskal-Wallis ranks, Jarque-Bera normality,
    // McNemar + Cochran gate tests, Wald-Wolfowitz runs
    "kruskal_wallis", "jarque_bera", "mcnemar_gates", "cochran_q",
    "runs_test",
    // session-4 batch 7b: rank-sensitive retrieval eval, k-core peel
    "kcore_dups",
    // session-4 batch 8: Bartlett, Welch ANOVA, permutation inference,
    // IVF silhouette
    "bartlett_test", "welch_anova", "permutation_test", "silhouette_ivf",
    // session-4 batch 9: cohort LTV curve, Pareto share, Krippendorff
    // alpha, Brier decomposition
    "cohort_ltv", "pareto_share", "kripp_alpha", "brier_decomp",
    // session-4 batch 10: Tukey post-hoc, categorical MI, WOE/IV
    "tukey_hsd", "mutual_info", "woe_iv",
    // session-4 batch 11: Kendall W, Chapman capture-recapture, OR/RR
    "kendall_w", "capture_recapture", "odds_ratio",
    // session-4 batch 12: dispersion index, basket lift, CA trend
    "dispersion_test", "basket_lift", "trend_test",
    // session-4 batch 13: POT/GPD tail class, Tukey fences
    "pot_tail", "tukey_fences",
    // session-4 batch 14: XmR control chart, Davies-Bouldin validity
    "xmr_chart", "davies_bouldin",
    // session-4 batch 15: AP/MRR panel, churn hazard
    "map_panel", "churn_hazard",
    // session-4 batch 16: Cronbach alpha, partial corr, SRM, Bayes A/B
    "cronbach_alpha", "partial_corr", "srm_check", "bayes_ab",
    // session-4 batch 17: Yule K, term burstiness, hash uniformity
    "yule_k", "term_burstiness", "hash_uniformity",
    // session-4 batch 18: post-stratification, Simpson's paradox alarm
    "post_strat", "simpsons_check",
    // session-4 batch 19: DAU/WAU/MAU, Cohen effect sizes
    "active_users", "effect_sizes",
    // session-4 batch 20: IVF reseed-stability ARI, Shapley attribution
    "ivf_stability", "shapley_attribution",
    // session-4 batch 21: Monroe log-odds keyness
    "logodds_keyness",
    // session-4 batch 22: Hyndman strength dials, PR-AUC
    "seasonal_strength", "pr_auc",
    // session-4 batch 23: von Neumann ratio, delta-method ratio metric
    "von_neumann", "ratio_metric_ab",
    // round-8: the FIXED-WIDTH density variants (spec-pinned since round 9,
    // board names serve auto — these keep the superlinear stress anchors
    // comparable across rounds) and the decode->box-resize thumbnail pass
    // (scan-parallel, join-free)
    "lof_fixed", "dbscan_fixed", "hubness_fixed", "image_resize",
    "audio_resample",
    // round-9: the auto-scaled IVF build (C = ⌈√n⌉ cells, sampled training)
    // and the composed corpus path (normalize → gate → dedup → decontam →
    // shuffle → chunk → pack → manifest)
    "ivf_auto", "pipeline_e2e",
    // round-10: the WRITTEN-index serving paths (literal pruning + the DPP
    // query panel), the auto IVF-PQ ADC probe + exact rerank, the drift
    // monitor's batch face, and the parquet-stage-table pipeline form
    "ivf_auto_served", "ivf_served_panel", "ivfpq_auto", "ivfpq_rerank",
    "index_residuals", "pipeline_staged",
    // round-11: IVF-PQ served from BOTH written tables (pruned code-table
    // ADC + point-read rerank against the written float index), its DPP
    // query-panel face, and the pointer-versioned serving path
    "ivfpq_served", "ivfpq_served_panel", "ivf_versioned_served",
    "neardup_incremental")

  /** Memo-bypassing smoke variants. `neardup_clusters` serves from a
    * per-(session, dir) memoized pair list in SparkEntry; timing it through
    * the memo makes the base side warm (serve-only) and the replica side
    * cold (build+serve) — unlike quantities — and parking checkpointed pair
    * blocks for BOTH dirs in storage memory distorts every later
    * measurement. The smoke times the cold build+serve composition on both
    * dirs instead.
    */
  private val OVERRIDES: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map(
      "neardup_clusters" -> ((s, dir) =>
        operators.Dedup.nearDupClusters(
            operators.Dedup.nearDupPairs(
              Tables.documents(s, dir), "doc_id", "text",
              k = 8, rowsPerBand = 2, threshold = 0.2))
          .orderBy("id")),
      // same memo-bypass rationale for the triangle census
      "neardup_triangles" -> ((s, dir) =>
        operators.Graph.triangles(
          operators.Dedup.nearDupPairs(
            Tables.documents(s, dir), "doc_id", "text",
            k = 8, rowsPerBand = 2, threshold = 0.2))),
      // ... and the triplet generator
      "contrastive_triplets" -> ((s, dir) =>
        operators.Contrastive.triplets(
          operators.Dedup.nearDupPairs(
            Tables.documents(s, dir), "doc_id", "text",
            k = 8, rowsPerBand = 2, threshold = 0.2),
          Tables.documents(s, dir), "doc_id")
          .orderBy("anchor", "positive")),
      // ... and the threshold sweep (cold pair build + sweep)
      "dedup_sweep" -> ((s, dir) =>
        operators.Dedup.thresholdSweep(
          operators.Dedup.nearDupPairs(Tables.documents(s, dir), "doc_id", "text",
            k = 8, rowsPerBand = 2, threshold = 0.2))),
      // ... and the calibration audit (cold pair build + calibrate)
      "minhash_calib" -> ((s, dir) => {
        val docs = Tables.documents(s, dir)
        operators.Dedup.minhashCalibration(
          operators.Dedup.nearDupPairs(docs, "doc_id", "text",
            k = 8, rowsPerBand = 2, threshold = 0.2),
          docs, "doc_id", "text", k = 8, buckets = 4)
      }),
      // fixed-width density trio (spec-pinned, off the board since round 9 —
      // same inputs/k/eps as the auto-width board entries; kept here so the
      // superlinear stress anchors stay comparable across rounds)
      "lof_fixed" -> ((s, dir) =>
        operators.Similarity.lofOutliers(
          Tables.embeddings(s, dir), "vec_id", "embedding", k = 5)),
      "dbscan_fixed" -> ((s, dir) =>
        operators.Similarity.dbscanClusters(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          eps = 0.68, minPts = 3)),
      "hubness_fixed" -> ((s, dir) =>
        operators.Similarity.hubness(
          Tables.embeddings(s, dir), "vec_id", "embedding", k = 5)),
      // ... and the inflation factor
      "dup_inflation" -> ((s, dir) => {
        val docs = Tables.documents(s, dir)
        operators.Audit.dupInflation(
          operators.Dedup.nearDupClusters(
            operators.Dedup.nearDupPairs(docs, "doc_id", "text",
              k = 8, rowsPerBand = 2, threshold = 0.2)),
          docs.select(org.apache.spark.sql.functions.col("doc_id"),
            operators.TextAnalysis.tokenCount(
              org.apache.spark.sql.functions.col("text")).as("tok")),
          "doc_id", "tok")
      }))

  private def queryOf(name: String): (org.apache.spark.sql.SparkSession, String) => DataFrame =
    OVERRIDES.getOrElse(name, SparkEntry.queries(name))

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DIR", "/root/repo/tmp/sf1-smoke")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPS", "10").toInt
    // comma-separated subset for targeted re-measurement (default: all)
    val only = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = QUERIES.filter(q => only.forall(_.contains(q)))
    val spark = Sessions.builder("local[32]", 32).appName("scale-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val rep = spark.range(reps).select(col("id").as("rep"))

    def replicate(df: DataFrame, key: String, salt: DataFrame => DataFrame): DataFrame = {
      val span = df.agg(max(col(key))).head().getLong(0) + 1
      salt(df.crossJoin(broadcast(rep)))
        .withColumn(key, col(key) + col("rep") * span)
        .drop("rep")
    }

    // ts tie-break per replica: the fixtures have carried ts as nanos-Long
    // and as TIMESTAMP_NTZ(µs) across generations — perturb in the column's
    // own unit either way (Tables.load normalizes both on read)
    val evTsSalt: DataFrame => DataFrame = df =>
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", col("ts") + col("rep"))
        case _ =>
          df.withColumn("ts", expr("timestampadd(MICROSECOND, rep, ts)"))
      }
    val ev = replicate(spark.read.parquet(s"$base/events.parquet"), "event_id", evTsSalt)
    val docs = replicate(spark.read.parquet(s"$base/documents.parquet"), "doc_id",
      _.withColumn("text",
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit("_r"), col("rep"))))))
    val ord = replicate(spark.read.parquet(s"$base/orders.parquet"), "o_orderkey", identity)
    // lineitem replicates fact-style (orderkey offset); part stays VERBATIM
    // — it's the dimension: facts scale 10×, the broadcast side must not
    val li = replicate(spark.read.parquet(s"$base/lineitem.parquet"), "l_orderkey", identity)
    // embeddings replicate with vectors VERBATIM (id-offset only): near-dup
    // structure per replica is identical, and cross-replica exact ties
    // break on id in every ranking path
    val emb = replicate(spark.read.parquet(s"$base/embeddings.parquet"), "vec_id", identity)

    // SPARK_GRAFT_SMOKE_REUSE=1 skips the (expensive at 100×+) slice write
    // when a prior run already materialized it — targeted re-measurement
    // after tuning driver memory must not pay the build again
    if (sys.env.get("SPARK_GRAFT_SMOKE_REUSE").contains("1") &&
        new java.io.File(s"$out/lineitem.parquet/_SUCCESS").exists()) {
      println(s"[smoke] reusing existing ${reps}x slice at $out")
    } else {
      ev.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")
      docs.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
      ord.repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
      li.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      // dimensions stay VERBATIM — facts scale 10×, broadcast sides must not
      Seq("part", "customer", "supplier", "nation", "region").foreach { t =>
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
      emb.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      println(s"[smoke] wrote ${reps}x slice to $out")
    }

    // min of N executions: the box is shared, and a single-shot timing mixes
    // co-tenant noise into a ratio meant to measure ENGINE scaling — the min
    // is the least-contended observation of the same deterministic plan
    val timedReps = sys.env.getOrElse("SPARK_GRAFT_SMOKE_TIMED_REPS", "3").toInt
    def time(name: String, dir: String): Double =
      (0 until timedReps).map { _ =>
        val t0 = System.nanoTime()
        queryOf(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
    // prime JVM/codegen once (untimed) so the first timed query isn't biased;
    // base only — memoized serving paths are overridden to their cold
    // composition above, so no per-dir memo state can skew a side
    queries.foreach { q =>
      try queryOf(q)(spark, base).count() catch { case _: Throwable => () }
    }

    println(f"| query | t(sf0.1) s | t(${reps}x) s | ratio |")
    println("|---|---|---|---|")
    queries.foreach { q =>
      val t1 = time(q, base)
      val t10 = time(q, out)
      println(f"| $q | $t1%.2f | $t10%.2f | ${t10 / t1}%.1fx |")
    }
    spark.stop()
  }
}
