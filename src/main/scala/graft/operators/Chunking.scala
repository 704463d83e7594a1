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
}
