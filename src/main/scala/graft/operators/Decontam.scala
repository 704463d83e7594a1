package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find training documents that share a token
  * n-gram with any held-out evaluation document — the standard overlap check
  * an LLM data pipeline runs before training (n-gram collision against the
  * eval set; 8–13-gram in published practice, parameterized here).
  *
  * Plan shape at 100 TB: each side explodes raw n-grams once (a one-pass
  * shingle expression per row), digests them to the fixed-width 32-hex md5 in
  * a codegen'd projection (shuffle volume ∝ 32 B/gram instead of the raw
  * n·word string), dedups per document with a hash-partitioned aggregate, and
  * counts shared grams with a hash-partitioned (train, eval) aggregation.
  * Nothing is quadratic: a train document meets only eval documents it
  * actually shares a gram digest with.
  */
object Decontam {

  /** One row per contaminated (train, eval) document pair with the number of
    * distinct shared n-grams. Inputs carry (idCol, textCol); n-grams follow
    * [[Dedup.shingles]] (documents shorter than n tokens contribute their
    * whole text as a single gram, mirrored by the oracle).
    */
  def ngramOverlap(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    // both sides are distinct per document, so count(*) per (train, eval)
    // pair IS the number of distinct shared grams
    grams(train, idCol, textCol, n, "train_id")
      .join(grams(eval_, idCol, textCol, n, "eval_id"), "g")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  // explode RAW grams, then digest + dedup relationally: md5 runs in a
  // codegen'd Project over the exploded rows and the per-doc distinct is a
  // hash-partitioned aggregate — the array-HOF form (md5 inside transform,
  // array_distinct per row) is CodegenFallback and benched 12.7 s at sf0.1
  // vs ~1 s for this plan. `gate` (default pass-all) filters the digested
  // grams BEFORE the distinct, so a selective gate also shrinks that
  // aggregate's shuffle, not just the join's.
  private def grams(df: DataFrame, idCol: String, textCol: String, n: Int,
      outId: String, gate: org.apache.spark.sql.Column => org.apache.spark.sql.Column
        = _ => lit(true)) =
    Dedup.parallelize(df).select(col(idCol).as(outId),
        explode(graft.functions.MinHashExpr.shinglesArray(col(textCol), n)).as("gram"))
      .select(col(outId), md5(col("gram")).as("g"))
      .where(gate(col("g")))
      .distinct()

  /** [[ngramOverlap]] with a broadcast-bloom gate on the TRAIN side — the
    * 100 TB shape: the eval set is small by definition, so its distinct gram
    * digests compress into a few-MB Bloom filter that ships to every
    * executor; the corpus-side scan then drops non-colliding grams (the
    * overwhelming majority) BEFORE the per-doc distinct and the join
    * shuffle, instead of shuffling ~32 B × every gram of 100 TB to discover
    * non-matches. Bloom false positives are eliminated by the join equality
    * itself, so the RESULT is exactly [[ngramOverlap]]'s — the oracle SQL is
    * shared, and the equivalence is spec-pinned.
    *
    * Eval grams are materialized once (localCheckpoint) and feed the bloom
    * aggregation + the join probe; only the serialized sketch (not the gram
    * set) reaches the driver and the broadcast.
    */
  def ngramOverlapBloom(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      fpp: Double = 0.01
  ): DataFrame = {
    val eg = grams(eval_, idCol, textCol, n, "eval_id").localCheckpoint()
    val evalG = eg.select("g").distinct()
    val bloom = evalG.stat.bloomFilter("g", math.max(evalG.count(), 1L), fpp)
    val bc = train.sparkSession.sparkContext.broadcast(
      graft.functions.BloomExpr.serialize(bloom))
    grams(train, idCol, textCol, n, "train_id",
        g => graft.functions.BloomExpr.mightContain(g, bc))
      .join(eg, "g")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Near-duplicate decontamination: training documents that are MinHash/LSH
    * near-dups of an eval document (jaccard over 3-gram shingles ≥
    * `threshold`) — catches paraphrase-level leakage that exact n-gram
    * matching misses. Same architecture as [[Dedup.nearDupPairs]] but across
    * two corpora: per-side band tables, a bucketed train×eval band join for
    * candidates, exact Jaccard verification over candidate documents only.
    * Nothing is all-pairs; candidate volume is bounded by band-bucket
    * occupancy exactly as in the within-corpus case.
    */
  def nearDupAcross(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5
  ): DataFrame = {
    nearDupAcrossFromBands(
      Dedup.lshBands(train, idCol, textCol, k, rowsPerBand),
      Dedup.lshBands(eval_, idCol, textCol, k, rowsPerBand),
      train, eval_, idCol, textCol, threshold)
  }

  /** EMBEDDING-SPACE decontamination: train rows whose vector is
    * cosine-similar (≥ `threshold`) to ANY eval vector — the SEMANTIC
    * leakage tier beside the lexical ones ([[ngramOverlap]] catches
    * verbatim inclusion, [[nearDupAcross]] token-level paraphrase; a
    * translated or reworded benchmark item only an embedding can see —
    * the check frontier pipelines run against benchmark embeddings).
    *
    * Same candidate architecture as every near-dup tier here: per-side
    * auto-width hyperplane band tables ([[Similarity.planeBands]], width
    * from [[Similarity.autoBandWidth]] at the LARGER side so per-row
    * candidate volume stays at the budget as corpora grow), a train×eval
    * band EQUI-join for candidates, exact cosine verification over
    * candidates only — never all-pairs. Recall is banded-LSH recall:
    * audit with [[Similarity.cohortCoverageAuto]] on the corpus at hand
    * (near-identical embeddings share sign patterns far above the uniform
    * rate; DensitySpec's planted-cluster regime).
    *
    * Output: (train_id, eval_id, sim) for verified pairs.
    */
  def embedNearDupAcross(trainEmb: DataFrame, evalEmb: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nBands: Int = 4, budgetPerRow: Int = 64, seed: Int = 42): DataFrame = {
    val shape = trainEmb.agg(count(lit(1)), max(size(col(vecCol)))).head()
    val nT = shape.getLong(0)
    val dim = if (shape.isNullAt(1)) 0 else shape.getInt(1)
    val nE = evalEmb.agg(count(lit(1))).head().getLong(0)
    val r = Similarity.autoBandWidth(math.max(nT, nE), nBands, budgetPerRow)
    val tb = Similarity.planeBands(trainEmb, idCol, vecCol, nBands, r, dim, seed).as("a")
    val eb = Similarity.planeBands(evalEmb, idCol, vecCol, nBands, r, dim, seed).as("b")
    val cand = tb
      .join(eb, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val"))
      .select(col(s"a.$idCol").as("train_id"), col(s"b.$idCol").as("eval_id"))
      .distinct()
      .localCheckpoint()
    cand
      .join(trainEmb.select(col(idCol).as("train_id"), col(vecCol).as("_ed_a")), "train_id")
      .join(evalEmb.select(col(idCol).as("eval_id"), col(vecCol).as("_ed_b")), "eval_id")
      .select(col("train_id"), col("eval_id"),
        round(Similarity.cosine(col("_ed_a"), col("_ed_b")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** DuckDB mirror of [[embedNearDupAcross]] — `rowsPerBand` must equal
    * `autoBandWidth(max(n_train, n_eval))` for the actual split sizes (the
    * static-mirror baked-width contract; a row-count drift breaks rows+hash
    * loudly). `trainWhere`/`evalWhere` select the two sides from `tbl`.
    */
  def embedNearDupAcrossSql(tbl: String, idCol: String, vecCol: String,
      trainWhere: String, evalWhere: String, threshold: Double,
      nBands: Int, rowsPerBand: Int, dim: Int, seed: Int = 42): String = {
    def bandRows(src: String) = (0 until nBands).map { bi =>
      s"SELECT $idCol AS id, $bi AS band_idx, " +
        s"${Similarity.lshSignatureSql(vecCol, rowsPerBand, dim, seed + 1000 * (bi + 1))} AS band_val FROM $src"
    }.mkString(" UNION ALL ")
    val cos =
      s"""(list_sum(list_transform(list_zip(t.$vecCol, e.$vecCol), z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(t.$vecCol, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE))))
          * sqrt(list_sum(list_transform(e.$vecCol, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE))))))"""
    s"""WITH tr AS (SELECT * FROM $tbl WHERE $trainWhere),
       ev AS (SELECT * FROM $tbl WHERE $evalWhere),
       bt AS (${bandRows("tr")}),
       be AS (${bandRows("ev")}),
       cand AS (SELECT DISTINCT a.id AS train_id, c.id AS eval_id
                FROM bt a JOIN be c
                  ON a.band_idx = c.band_idx AND a.band_val = c.band_val)
       SELECT train_id, eval_id, sim FROM (
         SELECT cand.train_id, cand.eval_id, round($cos, 4) AS sim
         FROM cand JOIN tr t ON t.$idCol = cand.train_id
                   JOIN ev e ON e.$idCol = cand.eval_id)
       WHERE sim >= $threshold ORDER BY train_id, eval_id"""
  }

  /** [[nearDupAcross]] from ALREADY-BUILT per-side band tables — the entry
    * a composed pipeline uses to share one corpus-wide MinHash pass with
    * the dedup tier ([[Dedup.nearDupPairsFromBands]] sibling). */
  def nearDupAcrossFromBands(trainBands: DataFrame, evalBands: DataFrame,
      train: DataFrame, eval_ : DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val tb = trainBands.as("a")
    val eb = evalBands.as("b")
    // candidates feed three downstream joins — materialize the compact pair
    // list once (same rationale as the within-corpus pair build)
    val cand = tb
      .join(eb, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash"))
      .select(col(s"a.$idCol").as("train_id"), col(s"b.$idCol").as("eval_id"))
      .distinct()
      .localCheckpoint()
    Dedup.verifyJaccard(cand, train, eval_, idCol, textCol,
      "train_id", "eval_id", threshold)
  }
}
