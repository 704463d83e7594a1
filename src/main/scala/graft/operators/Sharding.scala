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
}
