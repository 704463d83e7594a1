package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB shape: everything is a hash-partitioned groupBy/join on compact
  * keys (md5 prefixes), never a cross join. MinHash uses md5-based signature
  * functions so the DuckDB oracle can reproduce them bit-for-bit.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct md5(text) with the
    * kept (minimum) id and the duplicate count. At scale: single
    * hash-partitioned aggregation, combiner-friendly, no skew (md5 keys are
    * uniform).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dupes"))

  /** Word n-gram shingles (default 3): `transform(sequence(...))` keeps it
    * inside codegen. Oracle mirror:
    * `list_transform(range(1, len(w)-1), i -> w[i]||' '||w[i+1]||' '||w[i+2])`.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = split(trim(text), "\\s+")
    when(
      size(ws) >= n,
      transform(
        sequence(lit(1), size(ws) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*)
      )
    ).otherwise(array(concat_ws(" ", ws)))
  }

  /** MinHash signature k hash functions, each `min(md5(seed || ':' || s))`
    * over the shingle multiset. Hex-string min is a valid uniform min-hash;
    * md5 makes it engine-portable. No distinct pass: the min over duplicates
    * equals the min over the set, and `array_distinct` on string arrays is
    * O(n²) interpreted — dropping it cut the sf0.1 near-dup run by an order
    * of magnitude.
    */
  def minhashSigs(shingleArr: Column, k: Int): Seq[Column] =
    (0 until k).map { seed =>
      array_min(transform(shingleArr, s => md5(concat(lit(s"$seed:"), s))))
        .as(s"mh$seed")
    }

  /** (id, mh0..mhk-1) signature table from ONE one-pass signature evaluation
    * per row. The k column references live above a Generate barrier
    * (`explode(array(sig))`): a generator consumes its input exactly once,
    * so CollapseProject cannot re-inline the expression into each
    * element_at the way it would across plain Projects (no CSE exists for
    * fallback expressions — the per-seed form this replaces re-ran the
    * SHINGLE pipeline k times per row, the round-2 minhash_sigs
    * 0.19 s → 1.2 s regression).
    */
  def signatureTable(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    parallelize(df)
      .select(col(idCol),
        explode(array(graft.functions.MinHashExpr.minhashArray(col(textCol), k))).as("__sig"))
      .select(col(idCol) +:
        (0 until k).map(i => element_at(col("__sig"), i + 1).as(s"mh$i")): _*)

  /** Minimum-parallelism guard ahead of CPU-heavy per-row compute: a tiny
    * input (one Parquet row group) otherwise runs the whole shingle+md5
    * pipeline on ONE task no matter how many cores the session has. A real
    * corpus arrives in many splits and passes through untouched — the guard
    * only fires when the scan has fewer partitions than the session's
    * parallelism, where the repartition shuffle is small by construction.
    */
  private[graft] def parallelize(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // toRdd, not .rdd: reads the planned partition count without building
    // the extra deserializing RDD plan a Dataset.rdd conversion adds
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  /** LSH banding: docs sharing any band (md5 over r consecutive signature
    * values) are near-dup candidates. Returns (id, band_idx, band_hash) in
    * long form, ready for a self-join on (band_idx, band_hash) — the
    * scale-out path: candidates are generated per-bucket, never all-pairs.
    * One [[graft.functions.MinHashBandsExpr]] evaluation per row produces all
    * bands (a generator consumes its input once, so nothing is recomputed).
    */
  def lshBands(df: DataFrame, idCol: String, textCol: String, k: Int, rowsPerBand: Int): DataFrame =
    parallelize(df).select(
      col(idCol),
      posexplode(graft.functions.MinHashExpr.bandArray(col(textCol), k, rowsPerBand))
        .as(Seq("band_idx", "band_hash")))

  /** Drop band BUCKETS whose occupancy exceeds `maxBucket` — the
    * production guard against boilerplate-driven quadratic blowup in the
    * banded self-join: a bucket of B docs contributes B(B−1)/2 candidate
    * pairs, so one million-doc boilerplate bucket is 5·10¹¹ pairs no AQE
    * skew split can absorb. Dropping a hot bucket costs recall only for
    * pairs ALL of whose shared bands are hot; with k/r independent bands a
    * genuinely near-dup pair keeps colliding in cooler bands (spec-pinned
    * on planted boilerplate + true twins). What a hot bucket actually
    * marks is template text — [[Boilerplate.stripBoilerplate]]'s job, not
    * pairwise dedup's. Shape: one (band_idx, band_hash) count agg + an
    * anti-join — both on the compact band relation, never the corpus.
    */
  def capBands(bands: DataFrame, maxBucket: Long): DataFrame = {
    require(maxBucket >= 2, s"capBands: maxBucket >= 2, got $maxBucket")
    val hot = bands.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("_cb_n"))
      .where(col("_cb_n") > maxBucket)
      .select("band_idx", "band_hash")
    bands.join(hot, Seq("band_idx", "band_hash"), "left_anti")
  }

  /** Bands from a materialized signature table (see [[signatureTable]]). */
  def lshBandsFrom(withSigs: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    val bands = k / rowsPerBand
    val bandCols = (0 until bands).map { b =>
      struct(
        lit(b).as("band_idx"),
        md5(concat_ws("|", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*))
          .as("band_hash")
      )
    }
    withSigs
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
  }

  /** Exact shingle-set Jaccard verification over a candidate pair list —
    * shared by the within-corpus ([[nearDupPairs]]) and cross-corpus
    * ([[graft.operators.Decontam.nearDupAcross]]) paths. Semi-joins each
    * side down to ids appearing in a candidate pair, projects each doc's
    * shingle array ONCE (the one-pass [[graft.functions.ShinglesExpr]];
    * the join is a CollapseProject barrier, so intersect+union above it
    * reference the array attribute instead of re-inlining the shingle
    * pipeline — round-1 measured 4 recomputes per pair without the
    * barrier, 21.9 s of a 58.7 s bench). No distinct pass:
    * array_intersect/array_union dedup internally, so set-jaccard over the
    * raw multiset arrays is identical.
    */
  private[operators] def verifyJaccard(
      cand: DataFrame,
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      leftKey: String,
      rightKey: String,
      threshold: Double
  ): DataFrame = {
    def shingled(df: DataFrame, ids: DataFrame) =
      df.join(ids, Seq(idCol), "left_semi")
        .select(col(idCol),
          graft.functions.MinHashExpr.shinglesArray(col(textCol)).as("sh"))
    // self-join case (within-corpus pairs): ONE shingle projection over the
    // union of both key columns feeds both sides; cross-corpus keeps a
    // projection per side
    val (shA, shB) =
      if (left eq right) {
        val ids = cand.select(col(leftKey).as(idCol))
          .union(cand.select(col(rightKey).as(idCol))).distinct()
        val sh = shingled(left, ids)
        (sh, sh)
      } else (
        shingled(left, cand.select(col(leftKey).as(idCol)).distinct()),
        shingled(right, cand.select(col(rightKey).as(idCol)).distinct()))
    cand
      .join(shA.select(col(idCol).as(leftKey), col("sh").as("sh_a")), leftKey)
      .join(shB.select(col(idCol).as(rightKey), col("sh").as("sh_b")), rightKey)
      .withColumn(
        "jaccard",
        round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))),
          6
        )
      )
      .where(col("jaccard") >= threshold)
      .select(col(leftKey), col(rightKey), col("jaccard"))
  }

  /** Candidate near-dup pairs via LSH, verified with exact shingle-set
    * Jaccard ≥ `threshold`. The join is per-bucket (hash-partitioned on
    * band_hash); Jaccard verification only touches candidate pairs.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5
  ): DataFrame = {
    // The band table is consumed by both sides of the self-join and (via the
    // candidate list) by three more joins below. localCheckpoint materializes
    // the COMPACT (id, band_idx, band_hash) form once so the MinHash scan
    // runs exactly once per document — blocks are reclaimed by the
    // ContextCleaner when the plan is GC'd (no CacheManager leak, unlike
    // persist without a matching unpersist). This is also the 100 TB shape:
    // signatures/bands are materialized once, everything downstream is a
    // hash-partitioned join on them.
    val bands = lshBands(df, idCol, textCol, k, rowsPerBand).localCheckpoint()
    nearDupPairsFromBands(bands, df, idCol, textCol, threshold)
  }

  /** [[nearDupPairs]] from an ALREADY-MATERIALIZED band table — the entry a
    * composed pipeline uses to run the MinHash scan once per corpus and
    * feed several tiers (`pipeline_e2e` shares one corpus-wide band pass
    * between its dedup and decontamination stages). `bands` must be
    * materialized by the caller (checkpoint or table) — it is consumed by
    * both sides of the self-join and the candidate list downstream.
    */
  def nearDupPairsFromBands(bands: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame = {
    val a = bands.as("a")
    val b = bands.as("b")
    val cand = a
      .join(b, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
      .localCheckpoint()

    // jaccard verification shingles only CANDIDATE docs (LSH keeps these a
    // tiny fraction of the corpus) — see verifyJaccard
    verifyJaccard(cand, docs, docs, idCol, textCol, "id_a", "id_b", threshold)
  }

  /** Persist a corpus's band table as a `band_hash`-BUCKETED catalog table
    * — the dedup signature index the ingest path probes, the
    * [[graft.operators.Similarity.writeIvfIndex]] discipline applied to
    * MinHash: build the bands once ([[lshBands]] — one corpus scan), pay
    * the band_hash shuffle once at write, and every incremental probe
    * ([[probeNearDups]]) joins a NEW batch's tiny band relation against it
    * with ZERO exchange on the corpus side (the bucket spec satisfies the
    * join's clustering; spec-pinned with broadcast disabled). At 100 TB
    * the band table is ~bands/doc rows of (long, byte, hash) — the thing
    * a crawl pipeline keeps hot, not the corpus text.
    */
  /** One joinable band bucket key: band_idx folded into the hash, so the
    * index's bucket column IS the probe's single join key (a two-key join
    * over a one-key bucket spec makes the planner disable the bucketed
    * scan — measured in BandIndexSpec's development; the fold keeps the
    * key exact, not probabilistic). */
  private def bandKey: Column =
    concat_ws(":", col("band_idx"), col("band_hash"))

  def writeBandIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int, rowsPerBand: Int, table: String, path: String,
      buckets: Int = 8): Unit =
    Bucketing.writeBucketed(
      lshBands(docs, idCol, textCol, k, rowsPerBand)
        .select(col(idCol), bandKey.as("band_key")),
      table, path, "band_key", buckets)

  /** Near-dups of a NEW batch against the WRITTEN band index — the
    * incremental form of [[nearDupPairs]] a production crawl runs every
    * batch ("is this arrival a dup of anything we already hold?"):
    * arrivals' bands (built in-plan — a batch-sized relation) join the
    * bucketed index on (band_idx, band_hash); only the BATCH shuffles, the
    * corpus side reads its buckets in place. Candidates are then verified
    * with exact shingle Jaccard ≥ `threshold`, shingling ONLY candidate
    * docs on each side (the [[verifyJaccard]] contract). Arithmetic is
    * [[nearDupPairsFromBands]]'s restricted to corpus×batch candidates, so
    * the incremental answer can never drift from the batch rebuild's
    * cross-pairs (oracle-shared).
    *
    * Output: (corpus_id, new_id, jaccard).
    */
  def probeNearDups(spark: org.apache.spark.sql.SparkSession, table: String,
      corpusDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String, k: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val newBands = lshBands(newDocs, idCol, textCol, k, rowsPerBand)
      .select(col(idCol).as("_new_id"), bandKey.as("band_key"))
    val cand = spark.table(table)
      .join(newBands, Seq("band_key"))
      .select(col(idCol).as("corpus_id"), col("_new_id").as("new_id"))
      .distinct()
      .localCheckpoint()
    verifyJaccard(cand, corpusDocs, newDocs, idCol, textCol,
      "corpus_id", "new_id", threshold)
  }

  /** Asymmetric CONTAINMENT over LSH candidates: for each candidate pair,
    * |S(A)∩S(B)| / |S(A)| and / |S(B)| over distinct 3-gram shingles —
    * the excerpt/quotation signal (a short doc embedded verbatim in a long
    * one scores containment ≈ 1 while resemblance Jaccard stays low, so a
    * Jaccard threshold alone never surfaces it). Pairs where either
    * direction reaches `threshold` are returned with both scores.
    *
    * Same architecture as [[nearDupPairs]]: bucketed band self-join for
    * candidates, exact verification over candidates only. Candidates still
    * come from RESEMBLANCE MinHash — the published caveat is that recall
    * for extreme size ratios needs more bands or smaller `rowsPerBand`
    * (P(share a band) decays with the Jaccard, which containment-heavy
    * pairs can keep low); parameters are exposed for exactly that.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5
  ): DataFrame = {
    val bands = lshBands(df, idCol, textCol, k, rowsPerBand).localCheckpoint()
    val a = bands.as("a")
    val b = bands.as("b")
    val cand = a
      .join(b, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val ids = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol))).distinct()
    // ONE distinct-shingle projection feeds both sides (self-join case)
    val sh = df.join(ids, Seq(idCol), "left_semi")
      .select(col(idCol),
        array_distinct(graft.functions.MinHashExpr.shinglesArray(col(textCol))).as("sh"))
    cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("_ct_i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"),
        round(col("_ct_i") / size(col("sh_a")), 6).as("cont_a_in_b"),
        round(col("_ct_i") / size(col("sh_b")), 6).as("cont_b_in_a"))
      .where(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
  }

  /** Connected components over near-dup PAIRS → one cluster label per doc
    * (the min reachable id), i.e. the dedup GROUPS a training pipeline
    * keeps one representative from. Distributed min-label propagation WITH
    * POINTER JUMPING: every node starts labeled with itself; each round
    * (a) joins labels across edges (both directions) and keeps the
    * minimum, then (b) path-halves — label ← label(label) — so long chains
    * collapse exponentially. Rounds needed = O(log diameter), not
    * diameter (a 1000-link near-dup chain converges in ~10 rounds, not
    * 1000 — density clustering at corpus scale produces exactly such
    * chains); each round is two hash joins + an aggregation,
    * localCheckpoint'ed to cut lineage — the standard Pregel-without-Pregel
    * shape that scales to billions of edges.
    */
  /** Eagerly drop a superseded localCheckpoint's blocks (the RDD inside its
    * LogicalRDD leaf — see ColumnBridge.checkpointedRdd for why `df.rdd`
    * wouldn't work).
    */
  private[operators] def releaseCheckpoint(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.ColumnBridge
      .checkpointedRdd(df)
      .foreach(_.unpersist(blocking = false))

  def nearDupClusters(pairs: DataFrame, maxRounds: Int = 64,
      localSolveMaxEdges: Long = 1000000L): DataFrame = {
    // materialize the pair list ONCE — both edge directions (and every
    // propagation round) read the checkpoint, not the upstream pipeline
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    // Adaptive local solve: counting the materialized checkpoint is free,
    // and when the EDGE RELATION (already orders of magnitude under the
    // corpus — it only holds verified near-dup pairs) is driver-bounded
    // (default 1M edges = 16 MB of longs, the ivf-centroid collect class),
    // union-find with path compression beats 5-10 distributed rounds of
    // fixed scheduler overhead by ~10×. The distributed
    // propagation+pointer-jumping loop below remains the >1M-edge path and
    // computes the identical min-id labeling (the spec pins both paths
    // against each other).
    val isLong = {
      import org.apache.spark.sql.types.LongType
      p.schema.fields.forall(_.dataType == LongType)
    }
    if (isLong && p.count() <= localSolveMaxEdges) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      p.collect().foreach { row =>
        val (x, y) = (row.getLong(0), row.getLong(1))
        if (!parent.containsKey(x)) parent.put(x, x)
        if (!parent.containsKey(y)) parent.put(y, y)
        val (rx, ry) = (find(x), find(y))
        // union by MIN id so the root IS the cluster label
        if (rx < ry) parent.put(ry, rx) else if (ry < rx) parent.put(rx, ry)
      }
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
      parent.keySet().forEach(id => out += ((id, find(id))))
      releaseCheckpoint(p)
      val spark = pairs.sparkSession
      import spark.implicits._
      return out.toSeq.toDF("id", "cluster_id")
    }
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    releaseCheckpoint(p)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = true
    var rounds = 0
    while (changed && rounds < maxRounds) {
      val viaEdges = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id2"))
        .agg(min(col("nl")).as("nmin"))
      val hopped = labels
        .join(viaEdges, labels("id") === viaEdges("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          col("label").as("_cc_prev"))
        .localCheckpoint() // read twice below (jump self-join): one compute
      // pointer jump (path halving): label ← label(label). Every label
      // value IS a node id in the same component (labels only ever move
      // down through existing ids), so the self-join is total; the jump
      // target's label is ≤ the current one by the monotone invariant.
      // The change flag compares against the PRE-ROUND label so a
      // jump-only improvement still counts as progress.
      val next = hopped
        .join(hopped.select(col("id").as("_cc_l"), col("label").as("_cc_l2")),
          hopped("label") === col("_cc_l"))
        .select(hopped("id"), col("_cc_l2").as("label"),
          (col("_cc_l2") < col("_cc_prev")).as("chg"))
        .localCheckpoint() // eager: materialized before the old snapshot dies
      releaseCheckpoint(hopped)
      changed = next.where(col("chg")).take(1).nonEmpty
      // the superseded snapshot is dead — release its blocks now instead of
      // waiting for the ContextCleaner (rounds × |nodes| lingering rows at
      // scale); must target the CHECKPOINTED RDD, `df.rdd` is a fresh
      // wrapper and unpersisting it is a no-op
      releaseCheckpoint(labels)
      labels = next
      rounds += 1
    }
    releaseCheckpoint(edges)
    // silent non-convergence would return intermediate labels that split
    // real clusters (and mismatch the recursive-closure oracle) — fail loud
    if (changed)
      throw new IllegalStateException(
        s"nearDupClusters did not converge in $maxRounds rounds")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Keep-BEST representative per near-dup cluster (real pipelines keep the
    * longest / highest-quality copy, not an arbitrary one — exact-dup
    * groups have identical copies, so argmax only matters HERE, where
    * cluster members genuinely differ). `scored` maps ids to a score
    * column; the representative is the (score desc, id asc) argmax, so
    * selection is total-ordered and engine-stable.
    *
    * Plan shape: one hash-partitioned window over the cluster relation
    * (cluster-sized, orders of magnitude under the corpus) joined with the
    * per-id scores; counts ride the same window partition.
    */
  def clusterRepresentatives(clusters: DataFrame, scored: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val j = clusters.join(
      scored.select(col(idCol).as("id"), col(scoreCol).as("_cr_score")), "id")
    val w = Window.partitionBy("cluster_id")
    j.withColumn("_cr_rn",
        row_number().over(w.orderBy(col("_cr_score").desc, col("id"))))
      .withColumn("n_members", count(lit(1)).over(w))
      .where(col("_cr_rn") === 1)
      .select(col("cluster_id"), col("id").as("keep_id"),
        col("_cr_score").as("keep_score"), col("n_members"))
  }

  /** Near-dup cluster SIZE SPECTRUM: how many clusters have exactly k
    * members, with the member and pairwise-comparison mass per size — the
    * shape readout behind dedup capacity planning (one 10k-member
    * template-farm cluster dominates verify cost quadratically; many
    * 2-clusters dominate representative churn). Two bounded aggregations
    * over the cluster relation; comparisons = k(k−1)/2 per cluster.
    */
  def clusterSizeSpectrum(clusters: DataFrame): DataFrame =
    clusters.groupBy("cluster_id").agg(count(lit(1)).as("k"))
      .groupBy(col("k").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_members"),
        // Spark's `/` is double division — k(k−1) is always even, so the
        // long cast is exact and matches the BIGINT oracle
        (col("cluster_size") * (col("cluster_size") - 1) / 2 *
          col("n_clusters")).cast("long").as("n_comparisons"))
      .orderBy("cluster_size")

  /** Per-document dedup DECISION record — the audit trail a production
    * dedup stage ships alongside the cleaned corpus (every drop must name
    * its keeper, or the pipeline can't be reviewed or reversed): exact
    * duplicates collapse to the min-id copy of their content hash,
    * near-dup cluster members collapse to the cluster's keep-best
    * representative, everything else is `keep`. Exact-dup wins when both
    * apply (a byte-identical copy is the stronger claim).
    *
    * Shape: one md5-groupBy for the exact tier (16-byte shuffle keys);
    * the near tier joins the cluster-bounded representative relation
    * (≪ corpus, broadcast); one left join stitches the verdicts.
    */
  def dedupDecisions(docs: DataFrame, idCol: String, textCol: String,
      clusters: DataFrame, scored: DataFrame, scoreCol: String): DataFrame = {
    val ex = docs.select(col(idCol).cast("long").as("_dd_id"),
      md5(col(textCol)).as("_dd_h"))
    val exKeep = ex.groupBy("_dd_h").agg(min("_dd_id").as("_dd_keep"))
    val exact = ex.join(exKeep, "_dd_h").select(col("_dd_id"), col("_dd_keep"))
    val reps = clusterRepresentatives(clusters, scored, idCol, scoreCol)
      .select(col("cluster_id"), col("keep_id"))
    val near = clusters.join(reps, "cluster_id")
      .select(col("id").as("_dd_nid"), col("keep_id").as("_dd_nkeep"))
    val isExactDup = col("_dd_keep") =!= col("_dd_id")
    val isNearDup = col("_dd_nkeep").isNotNull && col("_dd_nkeep") =!= col("_dd_id")
    exact.join(broadcast(near), col("_dd_id") === col("_dd_nid"), "left")
      .select(col("_dd_id").as(idCol),
        when(isExactDup, lit("exact_dup"))
          .when(isNearDup, lit("near_dup"))
          .otherwise(lit("keep")).as("decision"),
        when(isExactDup, col("_dd_keep"))
          .when(isNearDup, col("_dd_nkeep")).as("dup_of"))
      .orderBy(idCol)
  }

  /** 64-bit SimHash over tokens: per-token 64-bit hash (xxhash64 — Spark
    * native, codegen'd), bitwise vote, sign → bit. Near-dups have small
    * Hamming distance. (Engine-internal signature — no cross-engine oracle.)
    */
  /** One-pass expression form of [[simhash64]] taking the raw TEXT column —
    * bit-identical (same XXH64/seed, same tokenization) but one hash per
    * token instead of 64 interpreted aggregate lambdas per row.
    */
  def simhash64Fast(text: Column): Column =
    graft.functions.SimHashExpr.simhash64(text)

  /** Oracle-portable SimHash variant: md5-derived token hashes, 16-char hex
    * output (see [[graft.functions.SimHashMd5Expr]]). Use this form when the
    * signature must be reproducible outside Spark; [[simhash64Fast]]
    * (xxhash64) is the cheaper engine-internal form.
    */
  def simhashMd5Hex(text: Column): Column =
    graft.functions.SimHashExpr.simhashMd5Hex(text)

  def simhash64(tokensArr: Column): Column = {
    // votes: for each of 64 bits sum ±1 across token hashes
    val hashes = transform(tokensArr, t => xxhash64(t))
    val bitVotes = (0 until 64).map { bit =>
      aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
      )
    }
    bitVotes.zipWithIndex
      .map { case (v, i) => when(v > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)) }
      .reduce(_ bitwiseOR _)
  }

  /** Sketch-accuracy calibration: per estimated-similarity band, how far is
    * the MinHash ESTIMATE (matching signature components / k) from the exact
    * shingle-set Jaccard? Real pipelines pick thresholds from exactly this
    * readout before trusting the sketch at full scale — and it costs almost
    * nothing: everything is bounded by the CANDIDATE pair list (the verified
    * pairs already carry exact Jaccard), the signature relation is
    * semi-joined down to candidate docs, and the output is `buckets` rows.
    * All means accumulate via DECIMAL(18,6) (estimates are multiples of 1/k
    * and Jaccard is pre-rounded to 6 decimals, so the sums are exact and
    * partitioning-order-immune).
    */
  def minhashCalibration(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String, k: Int = 8, buckets: Int = 4): DataFrame = {
    val ids = pairs.select(col("id_a").as(idCol))
      .union(pairs.select(col("id_b").as(idCol))).distinct()
    val sigs = signatureTable(df.join(ids, Seq(idCol), "left_semi"),
      idCol, textCol, k)
    val a = sigs.select(col(idCol).as("id_a") +:
      (0 until k).map(i => col(s"mh$i").as(s"_ca$i")): _*)
    val b = sigs.select(col(idCol).as("id_b") +:
      (0 until k).map(i => col(s"mh$i").as(s"_cb$i")): _*)
    val est = (0 until k)
      .map(i => when(col(s"_ca$i") === col(s"_cb$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / k
    def decMean(c: Column, n: Column): Column =
      round(sum(c.cast("decimal(18,6)")).cast("double") / n, 6)
    pairs.join(a, "id_a").join(b, "id_b")
      .select(col("jaccard"), est.as("est"))
      .withColumn("bucket", least(lit(buckets - 1L), floor(col("est") * buckets)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        decMean(col("est"), count(lit(1))).as("mean_est"),
        decMean(col("jaccard"), count(lit(1))).as("mean_exact"),
        decMean(abs(col("est") - col("jaccard")), count(lit(1))).as("mae"))
      .orderBy("bucket")
  }

  /** Dedup-policy threshold sweep: for each candidate Jaccard threshold,
    * how many pairs survive and how many distinct documents they touch —
    * the curve a curator reads to PICK the dedup threshold (the knee where
    * affected-doc count stops falling) instead of inheriting 0.8 from a
    * paper with a different corpus. The calibration-audit discipline
    * applied to policy: everything is bounded by the verified pair list
    * (pairs × |thresholds| rows through one explode; affected docs via a
    * pair-bounded distinct), never the corpus.
    */
  def thresholdSweep(pairs: DataFrame,
      thresholds: Seq[Double] = Seq(0.3, 0.5, 0.7, 0.9, 0.95, 0.97, 0.99)): DataFrame = {
    require(thresholds.nonEmpty, "thresholdSweep: empty threshold list")
    val t = explode(array(thresholds.map(lit): _*)).as("threshold")
    val perT = pairs.select(col("id_a"), col("id_b"), col("jaccard"), t)
      .where(col("jaccard") >= col("threshold"))
    val counts = perT.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
    val docs = perT.select(col("threshold"), col("id_a").as("id"))
      .union(perT.select(col("threshold"), col("id_b").as("id")))
      .distinct()
      .groupBy("threshold").agg(count(lit(1)).as("n_docs_affected"))
    counts.join(docs, Seq("threshold"))
      .orderBy("threshold")
  }

  /** SimHash near-dup PAIRS within `maxHamming` bits — the Manku/Jain/
    * Sarma web-dedup shape (WWW'07): split each 64-bit signature into 4
    * 16-bit blocks; by pigeonhole, two signatures within hamming 3 agree
    * on at least one block, so candidates are exactly the pairs colliding
    * on some (block_idx, block_value) — a fixed-width equi-join, never
    * all-pairs — and each candidate is verified with two popcounts.
    *
    * Complements [[nearDupPairs]] (MinHash estimates set Jaccard; SimHash
    * hamming tracks weighted cosine of the token multiset) at a fraction
    * of the signature cost: 8 bytes/doc vs k hex minima.
    *
    * Scale shape: signatures materialize once (one scan, one expression);
    * the block join fans out 4 rows/doc with 16-bit values — hot blocks
    * (e.g. the all-zeros block of short docs) are the documented skew key,
    * bounded by block-value cardinality 4·2^16. Verification joins
    * candidates back to the 2-long signature relation on each side.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "simhashPairs: 4-block pigeonhole is sound only for maxHamming <= 3")
    val sigs = parallelize(df).select(
        col(idCol).as("id"), simhashMd5Hex(col(textCol)).as("sig"))
      // two 32-bit halves: conv()→long is overflow-safe (< 2^32), and
      // hamming = popcount(hi⊕hi') + popcount(lo⊕lo')
      .select(col("id"),
        conv(substring(col("sig"), 1, 8), 16, 10).cast("long").as("hi"),
        conv(substring(col("sig"), 9, 8), 16, 10).cast("long").as("lo"))
      .localCheckpoint()
    val blocks = sigs.select(col("id"), posexplode(array(
      shiftright(col("hi"), 16), col("hi").bitwiseAND(lit(0xFFFFL)),
      shiftright(col("lo"), 16), col("lo").bitwiseAND(lit(0xFFFFL)))))
      .toDF("id", "blk", "v")
    val cands = blocks.select(col("id").as("id_a"), col("blk"), col("v"))
      .join(blocks.select(col("id").as("id_b"), col("blk"), col("v")),
        Seq("blk", "v"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val a = sigs.select(col("id").as("id_a"), col("hi").as("hi_a"), col("lo").as("lo_a"))
    val b = sigs.select(col("id").as("id_b"), col("hi").as("hi_b"), col("lo").as("lo_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
         bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Duplication-aware LOSS WEIGHTS — the keep-everything alternative to
    * dropping near-duplicates: every document gets weight 1/|its near-dup
    * cluster| (singletons weigh 1), so a template repeated 40× contributes
    * one document's worth of gradient instead of 40 (the soft form of the
    * [[exact]]/[[nearDupClusters]] hard dedup, and what `dup_inflation`
    * measures the need for). Shape: clusters are pair-graph-sized (tiny),
    * broadcast back over the id relation — the corpus never reshuffles.
    */
  def dedupWeights(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = nearDupClusters(pairs) // (id, cluster_id)
    val sizes = clusters.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
    val weighted = clusters.join(broadcast(sizes), "cluster_id")
    df.select(col(idCol))
      .join(broadcast(weighted.select(col("id").as(idCol), col("sz"))), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("sz"), lit(1L)).as("cluster_size"),
        round(lit(1.0) / coalesce(col("sz"), lit(1L)).cast("double"), 6).as("weight"))
      .orderBy(idCol)
  }

  /** PARAGRAPH-level exact dedup audit (the RefinedWeb/CCNet granularity
    * between [[exact]] whole-document hashing and [[DupSpans]]' substring
    * spans): segment each document into fixed `paraTokens`-token
    * paragraphs, hash each, and report per source how much paragraph mass
    * is duplicated ACROSS documents — the boilerplate share a
    * paragraph-dedup pass would delete.
    *
    * The corpus has no layout breaks, so segmentation is positional
    * (deterministic in both engines); a real pipeline swaps in the
    * newline segmenter and the algebra is unchanged. Shape: one explode
    * to (doc, para-hash); the cross-doc test is a hash-keyed count
    * (distinct docs ≥ 2 — md5 over a vocabulary-bounded paragraph space
    * collides only for equal text); per-source rollup. All integers until
    * the final ratio.
    */
  def paraDedup(df: DataFrame, idCol: String, groupCol: String,
      textCol: String, paraTokens: Int = 12): DataFrame = {
    require(paraTokens >= 2, s"paraDedup: paragraph too short: $paraTokens")
    val paras = parallelize(df)
      .select(col(idCol), col(groupCol),
        split(trim(lower(col(textCol))), "\\s+").as("_pd_a"))
      .select(col(idCol), col(groupCol),
        explode(transform(
          sequence(lit(0), floor((size(col("_pd_a")) - 1) / lit(paraTokens)).cast("int")),
          i => md5(array_join(
            slice(col("_pd_a"), i * lit(paraTokens) + lit(1), lit(paraTokens)), " "))))
          .as("h"))
    val crossDoc = paras.groupBy("h")
      .agg(countDistinct(col(idCol)).as("nd"))
      .where(col("nd") >= 2)
      .select(col("h"))
    // Round-12 (guide §1.2, don't compute things you throw away): the
    // per-source TOTAL is the number of exploded paragraph rows, i.e.
    // Σ_doc floor((n_tokens − 1)/paraTokens) + 1 — the identical integer
    // without the explode or any md5, so the totals rollup no longer
    // re-runs the paragraph-hash corpus scan (the third such scan in the
    // former plan; the cross-doc aggregate and the semi-join probe still
    // need the real hashes).
    // isNotNull mirrors the explode exactly: a null text yields no
    // paragraph rows, so it must contribute no row here either (and a
    // group of only-null texts must stay absent, as it is from `paras`)
    val totals = parallelize(df)
      .where(col(textCol).isNotNull)
      .select(col(groupCol),
        (floor((size(split(trim(lower(col(textCol))), "\\s+")) - 1)
          / lit(paraTokens)) + lit(1)).as("_pd_k"))
      .groupBy(col(groupCol)).agg(sum(col("_pd_k")).as("n_paras"))
    paras.join(crossDoc, Seq("h"), "left_semi")
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_dup_paras"))
      .join(totals, Seq(groupCol), "right")
      .select(col(groupCol), col("n_paras"),
        coalesce(col("n_dup_paras"), lit(0L)).as("n_dup_paras"),
        round(coalesce(col("n_dup_paras"), lit(0L)).cast("double") /
          col("n_paras").cast("double"), 6).as("dup_para_ratio"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[paraDedup]]. */
  def paraDedupSql(tbl: String, idCol: String, groupCol: String,
      textCol: String, paraTokens: Int = 12): String =
    s"""WITH paras AS (SELECT $idCol, $groupCol,
             md5(array_to_string(ws[(i*$paraTokens+1):((i+1)*$paraTokens)], ' ')) AS h
           FROM (SELECT $idCol, $groupCol,
               string_split_regex(trim(lower($textCol)),'\\s+') AS ws FROM $tbl),
             UNNEST(range(0, (len(ws) - 1) // $paraTokens + 1)) AS u(i)),
       crossdoc AS (SELECT h FROM (
           SELECT h, COUNT(DISTINCT $idCol) AS nd FROM paras GROUP BY h)
         WHERE nd >= 2),
       dup AS (SELECT $groupCol, COUNT(*) AS n_dup_paras FROM paras
           WHERE h IN (SELECT h FROM crossdoc) GROUP BY $groupCol),
       tot AS (SELECT $groupCol, COUNT(*) AS n_paras FROM paras GROUP BY $groupCol)
       SELECT tot.$groupCol, n_paras,
         COALESCE(n_dup_paras, 0) AS n_dup_paras,
         round(CAST(COALESCE(n_dup_paras, 0) AS DOUBLE) / CAST(n_paras AS DOUBLE), 6)
           AS dup_para_ratio
       FROM tot LEFT JOIN dup ON tot.$groupCol = dup.$groupCol
       ORDER BY tot.$groupCol"""

  /** Chapman capture-recapture (Chapman 1951, the bias-corrected
    * Lincoln-Petersen) over two INDEPENDENT near-dup detectors: treat the
    * MinHash-LSH catch and the SimHash catch as two samplings of the same
    * unknown pair population; from the overlap,
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 estimates how many near-dup pairs EXIST
    * — including the ones neither method saw. The honest answer to "what's
    * our dedup recall?" without labeling anything: each catch's estimated
    * completeness is nᵢ/N̂. Reported with the Seber variance CI.
    *
    * Both inputs are (id_a, id_b) with id_a < id_b; the overlap is one
    * pair-keyed equi-join of two already-bounded candidate relations.
    */
  def captureRecapture(pairsA: DataFrame, pairsB: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    val a = pairsA.select(col("id_a"), col("id_b")).distinct()
    val b = pairsB.select(col("id_a"), col("id_b")).distinct()
    val na = a.agg(count(lit(1)).as("n_a"))
    val nb = b.agg(count(lit(1)).as("n_b"))
    val m = a.join(b, Seq("id_a", "id_b")).agg(count(lit(1)).as("m"))
    val nHat = (d(col("n_a")) + lit(1.0)) * (d(col("n_b")) + lit(1.0)) /
      (d(col("m")) + lit(1.0)) - lit(1.0)
    val varN = (d(col("n_a")) + lit(1.0)) * (d(col("n_b")) + lit(1.0)) *
      (d(col("n_a")) - d(col("m"))) * (d(col("n_b")) - d(col("m"))) /
      ((d(col("m")) + lit(1.0)) * (d(col("m")) + lit(1.0)) *
        (d(col("m")) + lit(2.0)))
    na.crossJoin(broadcast(nb)).crossJoin(broadcast(m))
      .select(col("n_a"), col("n_b"), col("m").as("n_both"),
        round(nHat, 2).as("n_hat"),
        round(sqrt(varN), 2).as("se"),
        when(nHat > 0, round(d(col("n_a")) / nHat, 6)).as("recall_a"),
        when(nHat > 0, round(d(col("n_b")) / nHat, 6)).as("recall_b"))
  }

  /** DuckDB mirror of [[captureRecapture]] over caller-prepended CTEs
    * `epa(id_a, id_b)` and `epb(id_a, id_b)`.
    */
  def captureRecaptureSql(): String =
    s"""na AS (SELECT COUNT(*) AS n_a FROM (SELECT DISTINCT id_a, id_b FROM epa)),
       nb AS (SELECT COUNT(*) AS n_b FROM (SELECT DISTINCT id_a, id_b FROM epb)),
       m AS (SELECT COUNT(*) AS m FROM
         (SELECT DISTINCT id_a, id_b FROM epa) x
         JOIN (SELECT DISTINCT id_a, id_b FROM epb) y USING (id_a, id_b)),
       f AS (SELECT n_a, n_b, m,
           (CAST(n_a AS DOUBLE) + 1.0) * (CAST(n_b AS DOUBLE) + 1.0)
             / (CAST(m AS DOUBLE) + 1.0) - 1.0 AS nhat,
           (CAST(n_a AS DOUBLE) + 1.0) * (CAST(n_b AS DOUBLE) + 1.0)
             * (CAST(n_a AS DOUBLE) - m) * (CAST(n_b AS DOUBLE) - m)
             / ((CAST(m AS DOUBLE) + 1.0) * (CAST(m AS DOUBLE) + 1.0)
                * (CAST(m AS DOUBLE) + 2.0)) AS varn
         FROM na CROSS JOIN nb CROSS JOIN m)
       SELECT n_a, n_b, m AS n_both, round(nhat, 2) AS n_hat,
         round(sqrt(varn), 2) AS se,
         CASE WHEN nhat > 0 THEN round(CAST(n_a AS DOUBLE) / nhat, 6) END AS recall_a,
         CASE WHEN nhat > 0 THEN round(CAST(n_b AS DOUBLE) / nhat, 6) END AS recall_b
       FROM f"""
}
