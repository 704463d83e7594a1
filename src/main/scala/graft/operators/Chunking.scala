package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window preparation for training pipelines: split each document
  * into overlapping fixed-size token windows (chunk i covers tokens
  * [i·stride, i·stride + size)), the step between tokenization and
  * shard packing ([[Sharding.packShards]]) in a pretraining data flow.
  *
  * Plan shape: the token array is materialized ONCE per row in its own
  * projection (a non-cheap, multiply-referenced alias — CollapseProject
  * keeps the barrier, so the split never re-inlines into the per-chunk
  * lambdas), then posexplode emits one row per window. Scan-parallel, no
  * shuffle; chunk count per doc is ⌈(n−size)/stride⌉+1, every token lands
  * in ≥1 chunk, the final chunk may be short.
  */
object Chunking {

  def tokenChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int
  ): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"tokenChunks: need 0 < stride <= chunkSize, got size=$chunkSize stride=$stride")
    require(!df.columns.contains("_tc_ws"),
      "tokenChunks: input already has a _tc_ws column")
    val n = size(col("_tc_ws"))
    // last window start index k = max(0, ceil((n - size) / stride))
    val lastStart = greatest(
      ceil((n - lit(chunkSize)).cast("double") / lit(stride)).cast("long"),
      lit(0L))
    // min-parallelism guard: the per-row window construction is the CPU
    // stage; a single-row-group input would otherwise run it on one task
    Dedup.parallelize(df)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_tc_ws"))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0L), lastStart),
          k => struct(
            array_join(slice(col("_tc_ws"), (k * stride + lit(1)).cast("int"), lit(chunkSize)), " ")
              .as("chunk_text"),
            least(lit(chunkSize).cast("long"), n - k * stride).as("n_tok")))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col.chunk_text").as("chunk_text"), col("col.n_tok").as("n_tok"))
  }

  /** Content-defined chunking (the LBFS/rsync boundary rule over TOKENS): a
    * chunk boundary sits before every token position p > 0 whose k-gram
    * digest satisfies `digest mod modulus == 0`, so boundaries are a pure
    * function of LOCAL content — an insertion or deletion re-chunks only
    * its neighborhood, while fixed windows ([[tokenChunks]]) shift every
    * subsequent chunk. That stability is what makes CDC chunks the right
    * granularity for chunk-level dedup across document revisions; expected
    * chunk length is `modulus` tokens.
    *
    * Shape: one gram explode (the [[DupSpans]] window relation) filtered to
    * boundary hits — a 1/modulus selective filter directly on the codegen'd
    * digest projection — then ONE per-doc window over the (sparse) boundary
    * rows assembles [start, next-boundary) chunk extents. The heavy relation
    * never shuffles; only ~n/modulus boundary rows do.
    *
    * Output: (id, chunk_idx, start_pos, end_pos, n_tokens) in 0-based
    * inclusive token offsets; documents shorter than k tokens come out as
    * one whole-document chunk.
    */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 4,
      modulus: Int = 16
  ): DataFrame = {
    require(k > 0 && modulus > 0, s"cdcChunks: need k > 0, modulus > 0, got $k/$modulus")
    val id = col(idCol)
    val windows = Dedup.parallelize(df).select(
        id,
        TextAnalysis.tokenCount(col(textCol)).as("_cc_n"),
        posexplode(graft.functions.MinHashExpr.shinglesArray(col(textCol), k))
          .as(Seq("pos", "gram")))
      .select(id, col("_cc_n"), col("pos").cast("long").as("pos"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % modulus).as("_cc_h"))
    val bounds = windows
      .where(col("_cc_h") === 0 && col("pos") > 0)
      .select(id, col("_cc_n"), col("pos"))
    val starts = df
      .select(id, TextAnalysis.tokenCount(col(textCol)).as("_cc_n"), lit(0L).as("pos"))
      .unionByName(bounds)
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(id).orderBy("pos")
    starts
      .select(id,
        (row_number().over(byDoc) - 1).cast("long").as("chunk_idx"),
        col("pos").as("start_pos"),
        coalesce(lead(col("pos"), 1).over(byDoc) - 1, col("_cc_n") - 1).as("end_pos"))
      .select(id, col("chunk_idx"), col("start_pos"), col("end_pos"),
        (col("end_pos") - col("start_pos") + 1).as("n_tokens"))
  }

  /** DuckDB SQL mirror of [[cdcChunks]] over `tbl(idCol, textCol)`. */
  def cdcChunksSql(tbl: String, idCol: String, textCol: String,
      k: Int, modulus: Int): String = {
    val gramExpr = {
      val parts = (0 until k).map(d => s"ws[i+$d]").mkString("||' '||")
      s"""CASE WHEN len(ws) >= $k
            THEN list_transform(range(1, len(ws)-${k - 2}), i -> $parts)
            ELSE [array_to_string(ws, ' ')] END"""
    }
    s"""WITH w AS (SELECT $idCol, string_split_regex(trim($textCol),'\\s+') AS ws FROM $tbl),
       gr AS (SELECT $idCol, CAST(len(ws) AS BIGINT) AS n, $gramExpr AS grams FROM w),
       win AS (SELECT $idCol, n, CAST(generate_subscripts(grams, 1) - 1 AS BIGINT) AS pos,
                      unnest(grams) AS gram FROM gr),
       b AS (SELECT $idCol, n, pos FROM win
             WHERE pos > 0 AND CAST('0x'||substr(md5(gram),1,8) AS BIGINT) % $modulus = 0),
       st AS (SELECT $idCol, n, CAST(0 AS BIGINT) AS pos FROM gr
              UNION ALL SELECT $idCol, n, pos FROM b),
       ch AS (SELECT $idCol,
                row_number() OVER (PARTITION BY $idCol ORDER BY pos) - 1 AS chunk_idx,
                pos AS start_pos,
                COALESCE(lead(pos) OVER (PARTITION BY $idCol ORDER BY pos) - 1, n - 1) AS end_pos
              FROM st)
       SELECT $idCol, chunk_idx, start_pos, end_pos,
              end_pos - start_pos + 1 AS n_tokens
       FROM ch ORDER BY $idCol, chunk_idx"""
  }
}
