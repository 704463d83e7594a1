package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing for training pipelines: documents, taken in a
  * stable global order (by id), are packed into shards of ~`budget` tokens —
  * the standard preprocessing step that turns a corpus into fixed-size
  * training shards. A document is assigned to the shard its cumulative START
  * offset falls in (`floor(exclusive_prefix_sum / budget)`), so shard
  * boundaries are deterministic and independent of partitioning.
  *
  * The naive formulation — one window over the whole corpus ordered by id —
  * plans as a SINGLE partition holding every row: correct at test scale,
  * dead at 100 TB. This implementation is the classic two-level distributed
  * prefix sum instead:
  *
  *   1. ids are range-bucketed into `buckets` order-aligned buckets (every
  *      id in bucket k sorts before every id in bucket k+1), from one
  *      min/max pre-scan (two values to the driver);
  *   2. the exclusive prefix sum WITHIN a bucket is a window partitioned by
  *      bucket — shuffles by bucket, each partition holds ~N/buckets rows;
  *   3. bucket TOTALS (a `buckets`-row aggregate) get their own exclusive
  *      prefix via a window over that constant-size relation, and join back
  *      broadcast.
  *
  * start = bucket_offset + within_bucket_offset; shard = start / budget.
  * The DuckDB oracle is the naive single-window form — same result, which
  * is the point: the distributed decomposition is invisible in the output.
  */
object Sharding {

  def packShards(
      df: DataFrame,
      idCol: String,
      tokens: Column,
      budget: Long,
      buckets: Int = 4096
  ): DataFrame = {
    val id = col(idCol)
    val base = df.select(id.cast("long").as("_ps_id"), tokens.cast("long").as("_ps_tok"))
    // one bounded pre-scan: two longs to the driver (like the k-means
    // centroid sets — constant-size driver traffic, not data-size)
    val Array(minId, maxId) = base
      .agg(min("_ps_id"), max("_ps_id")).head() match {
        case r if r.isNullAt(0) => Array(0L, 0L) // empty input
        case r                  => Array(r.getLong(0), r.getLong(1))
      }
    // span in BigInt: maxId - minId overflows Long when ids straddle the
    // extremes (a sentinel Long.MinValue next to positive ids), which would
    // wrap width to 1 and break bucket/id order alignment silently
    val width = ((BigInt(maxId) - BigInt(minId)) / buckets + 1).toLong
    // overflow-safe, order-preserving bucketing: floorDiv each side FIRST
    // (both quotients are in range; their difference is ≤ buckets+1), and
    // floorDiv — not truncating DIV — so negative ids stay monotone
    def floorDiv(name: String, w: Long): Column =
      expr(s"$name DIV ${w}L") -
        when(col(name) % w =!= 0 && col(name) < 0, lit(1L)).otherwise(lit(0L))
    val minBucket = Math.floorDiv(minId, width)
    val bucketed = base.withColumn("_ps_b", floorDiv("_ps_id", width) - minBucket)
    // level 1: exclusive prefix within each bucket (shuffle key: bucket)
    val inBucket = Window.partitionBy("_ps_b").orderBy("_ps_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("_ps_local", coalesce(sum("_ps_tok").over(inBucket), lit(0L)))
    // level 2: exclusive prefix over the (≤ `buckets`)-row totals — the only
    // single-partition window, over a constant-bounded relation
    val offsets = bucketed.groupBy("_ps_b").agg(sum("_ps_tok").as("_ps_btot"))
      .withColumn("_ps_boff",
        coalesce(sum("_ps_btot").over(
          Window.orderBy("_ps_b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_ps_b", "_ps_boff")
    local
      .join(broadcast(offsets), "_ps_b")
      .withColumn("_ps_start", col("_ps_boff") + col("_ps_local"))
      // integer DIV: `/` on longs is double division, lossy past 2^53
      .select(col("_ps_id").as(idCol), expr(s"_ps_start DIV ${budget}L").as("shard"))
  }

  /** Sequence-length bucketing for training batches: assign every document
    * to the smallest power-of-two token capacity that holds it (clamped to
    * [minCap, maxCap]) and report, per bucket, the document count, batch
    * count at `batchSize`, and the padding the bucketing actually pays —
    * the quantity a naive pad-to-max batcher multiplies by the corpus.
    * The bucket thresholds are a CASE chain over integers (no log2
    * float-boundary games cross-engine); the whole operator is one
    * map-side-combined aggregation over a scan-only projection.
    */
  def lengthBuckets(df: DataFrame, textCol: String,
      minCap: Int = 16, maxCap: Int = 512, batchSize: Int = 32): DataFrame = {
    require(Integer.bitCount(minCap) == 1 && Integer.bitCount(maxCap) == 1 &&
      minCap < maxCap, "lengthBuckets: caps must be powers of two")
    val n = size(TextAnalysis.tokens(lower(col(textCol)))).cast("long")
    val caps = Iterator.iterate(minCap)(_ * 2).takeWhile(_ < maxCap).toSeq
    val bucket = caps.foldRight(lit(maxCap.toLong)) { (c, rest) =>
      when(n <= c, lit(c.toLong)).otherwise(rest)
    }
    df.select(bucket.as("bucket"), n.as("_n"))
      // overlong docs truncate to maxCap: their padding is 0, not negative
      .select(col("bucket"), least(col("_n"), lit(maxCap.toLong)).as("_n"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_n")).as("total_tokens"),
        sum(col("bucket") - col("_n")).as("padding"))
      .select(col("bucket"), col("n_docs"),
        expr(s"(n_docs + ${batchSize - 1}) DIV $batchSize").as("n_batches"),
        col("total_tokens"), col("padding"),
        round(col("padding").cast("double") /
          (col("bucket") * col("n_docs")).cast("double"), 6).as("waste_frac"))
  }

  /** DuckDB mirror of [[lengthBuckets]]. */
  def lengthBucketsSql(table: String, textCol: String,
      minCap: Int = 16, maxCap: Int = 512, batchSize: Int = 32): String = {
    val caps = Iterator.iterate(minCap)(_ * 2).takeWhile(_ < maxCap).toSeq
    val chain = caps.map(c => s"WHEN n <= $c THEN $c").mkString(" ")
    s"""WITH t AS (SELECT len(string_split_regex(trim(lower($textCol)),'\\s+')) AS n FROM $table),
       b AS (SELECT CAST(CASE $chain ELSE $maxCap END AS BIGINT) AS bucket,
             CAST(least(n, $maxCap) AS BIGINT) AS n FROM t)
       SELECT bucket, COUNT(*) AS n_docs,
         (COUNT(*) + ${batchSize - 1}) // $batchSize AS n_batches,
         CAST(SUM(n) AS BIGINT) AS total_tokens,
         CAST(SUM(bucket - n) AS BIGINT) AS padding,
         round(CAST(SUM(bucket - n) AS DOUBLE) / CAST(bucket * COUNT(*) AS DOUBLE), 6) AS waste_frac
       FROM b GROUP BY bucket ORDER BY bucket"""
  }

  /** Shard manifest: the integrity record a pipeline writes next to its
    * training shards — per shard, the document count, token total, id
    * range, and an md5 content-ID fingerprint of the ORDERED id list, so a
    * re-run (or a different engine) can prove shard assignment is
    * byte-identical without diffing the shards themselves.
    *
    * One shuffle by shard; the per-shard id list is collected INSIDE the
    * aggregation and is bounded by construction — [[packShards]] caps a
    * shard at ~budget tokens, so a shard's membership is workload-sized
    * (thousands of ids), never corpus-sized. The fingerprint hashes the
    * canonical "id,id,..." ascending form, which DuckDB's
    * `string_agg(... ORDER BY)` reproduces exactly.
    */
  def shardManifest(assign: DataFrame, idCol: String, tokens: Column): DataFrame =
    assign
      .select(col("shard"), col(idCol).cast("long").as("_sm_id"), tokens.cast("long").as("_sm_tok"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_sm_tok").as("total_tokens"),
        min("_sm_id").as("min_id"),
        max("_sm_id").as("max_id"),
        md5(concat_ws(",", array_sort(collect_list(col("_sm_id").cast("string")))))
          .as("id_fp"))

  /** DuckDB mirror of [[shardManifest]] — NOTE: Spark sorts the id STRINGS
    * (array_sort over cast ids); the mirror must order lexicographically
    * too, not numerically.
    */
  /** Per-shard source-mix entropy — the "are my training shards well
    * mixed" diagnostic: Shannon entropy (nats) of each shard's source
    * distribution; a shard packed from one source scores 0 and starves
    * the mixture objective locally even when the global mixture is right.
    *
    * Shape: the assignment joins doc sources once (doc-keyed), then two
    * bounded aggs — (shard, source) counts and the entropy fold. Entropy
    * terms round(6)-then-DECIMAL sum (partition-order-proof doubles).
    */
  def shardMixEntropy(assign: DataFrame, docSources: DataFrame,
      idCol: String, sourceCol: String): DataFrame = {
    val counts = assign.join(docSources, idCol)
      .groupBy(col("shard"), col(sourceCol).as("_sm_src"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("shard").agg(sum("c").as("tot"),
      count(lit(1)).as("n_sources"))
    counts.join(totals, "shard")
      .select(col("shard"), col("n_sources"), col("tot"),
        round(lit(-1.0) * (col("c").cast("double") / col("tot").cast("double")) *
          log(col("c").cast("double") / col("tot").cast("double")), 6)
          .cast("decimal(18,6)").as("term"))
      .groupBy("shard")
      .agg(max(col("n_sources")).as("n_sources"),
        max(col("tot")).as("n_docs"),
        round(sum(col("term")).cast("double"), 6).as("entropy"))
      .orderBy("shard")
  }

  /** DuckDB mirror of [[shardMixEntropy]]: `assignSql` yields (id, shard);
    * sources come from `table`.
    */
  def shardMixEntropySql(assignSql: String, table: String, idCol: String,
      sourceCol: String): String =
    s"""WITH a AS ($assignSql),
       c AS (SELECT shard, $sourceCol AS src, COUNT(*) AS c
             FROM a JOIN $table t ON a.id = t.$idCol GROUP BY 1, 2),
       tt AS (SELECT shard, SUM(c) AS tot, COUNT(*) AS n_sources
              FROM c GROUP BY shard)
       SELECT shard, MAX(n_sources) AS n_sources,
         CAST(MAX(tot) AS BIGINT) AS n_docs,
         round(CAST(SUM(CAST(round(
           -1.0 * (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)) *
             ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)), 6) AS DECIMAL(18,6)))
           AS DOUBLE), 6) AS entropy
       FROM c JOIN tt USING (shard) GROUP BY shard ORDER BY shard"""

  def shardManifestSql(assignSql: String): String =
    s"""WITH a AS ($assignSql)
       SELECT shard, COUNT(*) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS total_tokens,
         MIN(id) AS min_id, MAX(id) AS max_id,
         md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY CAST(id AS VARCHAR))) AS id_fp
       FROM a GROUP BY shard ORDER BY shard"""

  /** Per-shard CONTENT digest — the provenance fingerprint a dataset card
    * publishes: md5 over the id-ordered concatenation of each member's
    * content md5. Two shard builds match iff every member document's BYTES
    * match, regardless of build order or partitioning — [[shardManifest]]'s
    * id fingerprint can't see a silently mutated document; this can.
    *
    * Shape: docs contribute one 32-hex digest each (never the text) to a
    * per-shard collect bounded by the pack budget — the shardManifest
    * collect discipline; the join onto the assignment is doc-keyed.
    */
  def shardContentDigest(assign: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame =
    assign
      .select(col("shard"), col(idCol))
      .join(docs.select(col(idCol), md5(col(textCol)).as("_sd_h")), idCol)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        md5(concat_ws("",
          transform(
            sort_array(collect_list(struct(
              col(idCol).cast("long").as("i"), col("_sd_h").as("h")))),
            s => s.getField("h")))).as("content_root"))

  /** DuckDB mirror of [[shardContentDigest]]: `assignSql` provides (id,
    * shard); content hashes order by id NUMERICALLY (the struct sort). */
  def shardContentDigestSql(assignSql: String, tbl: String, idCol: String,
      textCol: String): String =
    s"""WITH a AS ($assignSql),
       h AS (SELECT $idCol AS hid, md5($textCol) AS h FROM $tbl)
       SELECT shard, COUNT(*) AS n_docs,
         md5(string_agg(h.h, '' ORDER BY a.id)) AS content_root
       FROM a JOIN h ON a.id = h.hid
       GROUP BY shard ORDER BY shard"""
}
