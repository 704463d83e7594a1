package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle for pretraining: every record gets a
  * unique 0-based position in a pseudo-random but REPRODUCIBLE total order
  * (md5("shuffle:" ++ id), id tie-break) — the "shuffle the corpus once,
  * stream it in order" step before shard packing, stable across runs,
  * engines, partitionings and cluster sizes.
  *
  * The naive form — `row_number()` over one window ordered by the key —
  * plans as a SINGLE partition holding the whole corpus. Here the md5 key
  * makes the distributed decomposition trivial: the first byte of the key
  * IS a range bucket (bucket = key prefix ⇒ every key in bucket b sorts
  * before every key in bucket b+1, and md5 spreads rows uniformly so no
  * bucket is hot — no pre-scan, no sampling, unlike generic range
  * partitioning):
  *
  *   1. within-bucket rank: a window partitioned by the first `prefixLen`
  *      hex chars (16^prefixLen buckets) — one shuffle, ~N/16^prefixLen
  *      rows per partition;
  *   2. bucket COUNTS get an exclusive prefix sum over that constant-size
  *      relation and join back broadcast (the [[Sharding.packShards]]
  *      two-level scheme, with counting instead of token sums).
  *
  * position = bucket_offset + within_bucket_rank − 1. The DuckDB oracle is
  * the naive single-window form — same positions, which is the point.
  */
object CorpusShuffle {

  def globalShuffle(
      df: DataFrame,
      idCol: String,
      salt: String = "shuffle",
      prefixLen: Int = 2
  ): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8,
      s"globalShuffle: need 1 <= prefixLen <= 8, got $prefixLen")
    require(!df.columns.exists(_.startsWith("_gs_")),
      "globalShuffle: input already has a _gs_ column")
    val id = col(idCol)
    val keyed = df.select(id,
      md5(concat(lit(salt + ":"), id.cast("string"))).as("_gs_key"))
      .withColumn("_gs_b", substring(col("_gs_key"), 1, prefixLen))
    val inBucket = Window.partitionBy("_gs_b").orderBy(col("_gs_key"), id)
    val ranked = keyed.withColumn("_gs_rn", row_number().over(inBucket).cast("long"))
    val offsets = keyed.groupBy("_gs_b").agg(count(lit(1)).as("_gs_n"))
      .withColumn("_gs_off",
        coalesce(sum("_gs_n").over(
          Window.orderBy("_gs_b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_gs_b", "_gs_off")
    ranked
      .join(broadcast(offsets), "_gs_b")
      .select(id, (col("_gs_off") + col("_gs_rn") - 1).as("pos"))
  }

  /** DuckDB SQL mirror of [[globalShuffle]] over `tbl(idCol)` — the naive
    * single-window form; bucket prefix + within-bucket rank collapse into
    * one global rank because the bucket is a PREFIX of the sort key.
    */
  def globalShuffleSql(tbl: String, idCol: String, salt: String): String =
    s"""SELECT $idCol,
          row_number() OVER (ORDER BY md5('$salt:'||CAST($idCol AS VARCHAR)), $idCol) - 1 AS pos
        FROM $tbl ORDER BY $idCol"""
}
