package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The nine-stage corpus pipeline (NFC normalize → train/eval split →
  * Gopher gate → dedup decisions → decontamination anti-join → global
  * shuffle → token chunking → 4096-token shard packing → per-shard
  * manifest) with the BARRIER STRATEGY abstracted out — the round-10
  * completion of the round-9 `pipeline_e2e` lesson: the localCheckpoint
  * barriers that stopped the optimizer re-expanding multiply-consumed
  * stages (440 → 8 exchanges) are, at 100 TB, the STAGE TABLES a real
  * pipeline writes. This factors the dataflow once and plugs in either:
  *
  *   - [[checkpointed]] — localCheckpoint barriers (the board's
  *     `pipeline_e2e`, single-JVM in-session form), or
  *   - [[staged]] — every barrier WRITTEN as a parquet stage table and
  *     read back; a stage table already on disk is REUSED without
  *     re-executing anything upstream of it, so the pipeline resumes from
  *     the deepest prefix of surviving stages (kill it after `kept`,
  *     rerun: gated/bands/kept load from disk, only decontam onward
  *     re-executes — the re-run-from-stage-k economics measured in
  *     StagedPipelineSpec).
  *
  * Both forms produce byte-equal manifests (spec-pinned): every stage is
  * value-deterministic (md5-keyed shuffle order, decimal-exact sums,
  * rounded sims), so materialization strategy can never change the answer.
  *
  * Stage relations barriered (in order): `gated` (quality-gated train
  * split), `bands` (the ONE corpus-wide MinHash band table feeding both
  * near-dup tiers), `kept` (post-dedup), `clean` (post-decontam),
  * `chunks` (shuffled-position token chunks).
  */
object CorpusPipeline {

  /** Stage names in write order — the staged layout's directory names. */
  val stageNames: Seq[String] = Seq("gated", "bands", "kept", "clean", "chunks")

  /** The composed dataflow; `barrier(name, df)` materializes each
    * multiply-consumed stage relation. Parameters are the board's
    * (`pipeline_e2e`) — the oracle bakes them.
    */
  def manifest(docs: DataFrame,
      barrier: (String, DataFrame) => DataFrame): DataFrame = {
    val split = Sampling.splitOf(col("doc_id"))
    val norm = docs.select(col("doc_id"),
      graft.functions.NormalizeTextExpr.normalize(col("text")).as("text"),
      col("n_chars"))
    val train = norm.where(split === "train")
    val eval_ = norm.where(split === "test").select("doc_id", "text")
    // stage barriers: each surviving relation feeds SEVERAL downstream
    // consumers (the dedup tier reads `gated` five times, decontam reads
    // `kept` three times, shuffle+chunk read `clean` twice) — without a
    // materialization the optimizer re-expands the whole upstream at every
    // reuse (measured: 440 exchanges fused vs 8 with barriers).
    val gated = barrier("gated", train.join(
      TextAnalysis.gopherRules(train, "doc_id", "text")
        .where(col("keep")).select("doc_id"),
      Seq("doc_id"), "left_semi"))
    // ONE MinHash band pass feeds BOTH near-dup tiers (the dedup
    // self-join over the gated subset and the decontam cross-join vs the
    // eval split): band values depend only on the text, so the per-stage
    // tables are id-semi-joined slices of this one relation — at 100 TB
    // this is the signature table the pipeline materializes once, not a
    // per-stage re-scan of the corpus. Its input is `gated ∪ eval`, NOT
    // the full normalized corpus: every downstream consumer semi-joins to
    // gated / kept (⊆ gated) / eval ids, so bands for gate-REJECTED train
    // docs were computed, written, and never read (round-11 optimization;
    // the manifest is unchanged by construction — per-doc band rows are a
    // pure function of the text, only the unread rows disappear — and
    // `gated` is already a materialized stage, so this re-expands
    // nothing).
    val bandsAll = barrier("bands",
      Dedup.lshBands(gated.select("doc_id", "text").unionByName(eval_),
        "doc_id", "text", k = 8, rowsPerBand = 2))
    def bandsOf(ids: DataFrame) =
      bandsAll.join(ids.select("doc_id"), Seq("doc_id"), "left_semi")
    val clusters = Dedup.nearDupClusters(Dedup.nearDupPairsFromBands(
      bandsOf(gated), gated, "doc_id", "text", threshold = 0.2))
    val kept = barrier("kept", gated.join(
      Dedup.dedupDecisions(gated, "doc_id", "text", clusters,
          gated.select(col("doc_id"), col("n_chars")), "n_chars")
        .where(col("decision") === "keep").select("doc_id"),
      Seq("doc_id"), "left_semi"))
    val bad = Decontam
      .ngramOverlapBloom(kept, eval_, "doc_id", "text", n = 5)
      .select(col("train_id").as("doc_id"))
      .union(Decontam
        .nearDupAcrossFromBands(bandsOf(kept), bandsOf(eval_),
          kept, eval_, "doc_id", "text", threshold = 0.2)
        .select(col("train_id").as("doc_id")))
    val clean = barrier("clean", kept.join(bad, Seq("doc_id"), "left_anti"))
    val pos = CorpusShuffle.globalShuffle(clean, "doc_id")
    val chunkRows = barrier("chunks", Chunking
      .tokenChunks(clean, "doc_id", "text", chunkSize = 32, stride = 24)
      .join(pos, "doc_id")
      .select(col("pos"), col("chunk_idx"), col("n_tok")))
    // collision-free chunk id: the multiplier is the corpus's actual max
    // chunks/doc (one scalar agg over the materialized chunk stage). A
    // FULLY-FILTERED corpus (every doc gated/deduped/decontaminated away —
    // the 10× smoke's word-salted replicas do this) has a NULL max: the
    // pipeline must answer with an empty manifest, not an NPE.
    val maxIdx = chunkRows.agg(max(col("chunk_idx")).cast("long")).head()
    val perDoc = (if (maxIdx.isNullAt(0)) 0L else maxIdx.getLong(0)) + 1
    val chunks = chunkRows
      .select((col("pos") * perDoc + col("chunk_idx")).as("chunk_id"),
        col("n_tok"))
    val assign = Sharding.packShards(chunks, "chunk_id", col("n_tok"),
      budget = 4096)
    Sharding.shardManifest(assign.join(chunks, "chunk_id"),
        "chunk_id", col("n_tok"))
      .orderBy("shard")
  }

  /** The in-session form: localCheckpoint barriers (the board's
    * `pipeline_e2e`). */
  def checkpointed(docs: DataFrame): DataFrame =
    manifest(docs, (_, df) => df.localCheckpoint())

  /** The durable form: each barrier written as a parquet stage table under
    * `dir/<stage>` and read back — a stage already on disk (complete
    * `_SUCCESS`) is reused verbatim, nothing upstream of it re-executes.
    * Run it once: five stage tables + the manifest. Kill it anywhere and
    * rerun with the same `dir`: it resumes after the deepest surviving
    * stage. At 100 TB these ARE the pipeline's intermediate tables; the
    * resume property is what makes a multi-day corpus build restartable.
    */
  /** Whether `path/_SUCCESS` exists, resolved through Hadoop's FileSystem
    * API so the stage-complete probe works on ANY supported filesystem
    * (HDFS/S3/local) — a `java.io.File` check is always false off the
    * local disk, which would silently defeat resume exactly where the
    * durable form matters. */
  private def stageComplete(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Recursively delete `path` (any filesystem) — clears an interrupted
    * earlier write attempt whose committed files survive outside
    * `_temporary`, so a stage re-run can never absorb duplicates. */
  private def clearStageDir(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  def staged(docs: DataFrame, dir: String): DataFrame = {
    val spark = docs.sparkSession
    manifest(docs, { (name, df) =>
      val path = s"$dir/$name"
      if (!stageComplete(spark, path))
        df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    })
  }

  /** [[staged]] with the doc-keyed stage tables BUCKETED by doc_id
    * ([[Bucketing.writeBucketed]]): the pipeline's inter-stage joins are
    * all doc_id-keyed (band slices semi-join gated/kept/eval ids, decontam
    * anti-joins kept), so paying the doc_id shuffle ONCE at each stage
    * write makes every such join exchange-free on every downstream
    * consumer and every RESUME — at 100 TB that is the difference between
    * re-shuffling the corpus per rerun and never shuffling it again
    * (BucketingSpec's contract applied to the pipeline's own tables).
    *
    * Bucket METADATA lives in the session catalog; a resume in a NEW
    * session finds the files but not the table, so the barrier re-registers
    * an existing stage directory with `CREATE TABLE … USING parquet
    * CLUSTERED BY (doc_id) … LOCATION` — no data movement, plans see the
    * bucket spec again (spec-pinned via drop-table-then-resume).
    */
  def stagedBucketed(docs: DataFrame, dir: String, buckets: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val tag = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    val docKeyed = Set("gated", "bands", "kept", "clean")
    manifest(docs, { (name, df) =>
      val path = s"$dir/$name"
      val done = stageComplete(spark, path)
      if (!docKeyed(name)) {
        if (!done) df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      } else {
        val table = s"graft_stage_${name}_$tag"
        if (!done) {
          // an interrupted earlier attempt may have committed files without
          // `_SUCCESS`; writeBucketed's saveAsTable is ErrorIfExists on the
          // directory, so clear it first — the plain branch's
          // mode("overwrite") semantics, made explicit for the bucketed path
          clearStageDir(spark, path)
          Bucketing.writeBucketed(df, table, path, "doc_id", buckets)
        } else if (!spark.catalog.tableExists(table))
          // files survived, catalog didn't (new session): re-attach the
          // bucket spec to the existing directory — metadata only
          spark.sql(
            s"""CREATE TABLE $table (${df.schema.toDDL})
               USING parquet
               CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO $buckets BUCKETS
               LOCATION '$path'""")
        spark.table(table)
      }
    })
  }
}
