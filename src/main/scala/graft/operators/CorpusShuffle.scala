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

  /** Shuffle-QUALITY audit: the mean run length of same-`groupCol`
    * adjacency in the [[globalShuffle]] order vs the i.i.d. expectation
    * 1/(1−Σ p_s²) — the acceptance test a training-order shuffle ships
    * with (a biased shuffle leaves source runs; run length ≈ expectation
    * certifies the mixing the curriculum assumes). The reference number
    * uses EXACT source shares, so this also catches a shuffle that is
    * uniform within buckets but correlated across them.
    *
    * Scale shape: adjacency is an equi-join of positions p and p+1 (the
    * shuffle relation against itself, hash-partitioned on position) —
    * never a corpus-wide single-partition window; the share fold is a
    * bounded groupBy.
    */
  def shuffleRunAudit(df: DataFrame, idCol: String, groupCol: String,
      salt: String = "shuffle"): DataFrame = {
    val pos = globalShuffle(df, idCol, salt)
    val g = df.select(col(idCol), col(groupCol).as("_sr_g")).join(pos, idCol)
    val adj = g.select(col("pos"), col("_sr_g"))
      .join(g.select((col("pos") - 1).as("pos"), col("_sr_g").as("_sr_next")),
        "pos")
    val sameAdj = adj.agg(
      sum(when(col("_sr_g") === col("_sr_next"), 1L).otherwise(0L)).as("same"),
      count(lit(1)).as("n_adj"))
    val shares = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("n_total"),
        sum(col("n") * col("n")).as("_sq"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    sameAdj.crossJoin(broadcast(shares))
      .select(col("n_total").as("n_rows"), col("same").as("same_adjacent"),
        round(d(col("n_total")) / (d(col("n_total")) - d(col("same"))), 6)
          .as("mean_run_len"),
        round(lit(1.0) / (lit(1.0) -
          d(col("_sq")) / (d(col("n_total")) * d(col("n_total")))), 6)
          .as("expected_run_len"))
  }

  /** DuckDB mirror of [[shuffleRunAudit]]. */
  def shuffleRunAuditSql(tbl: String, idCol: String, groupCol: String,
      salt: String = "shuffle"): String =
    s"""WITH p AS (SELECT $idCol, $groupCol AS g,
           row_number() OVER (ORDER BY md5('${OracleSql.esc(salt)}:'||CAST($idCol AS VARCHAR)), $idCol) - 1 AS pos
         FROM $tbl),
       adj AS (SELECT a.g AS ga, b.g AS gb
         FROM p a JOIN p b ON b.pos = a.pos + 1),
       sa AS (SELECT CAST(SUM(CASE WHEN ga = gb THEN 1 ELSE 0 END) AS BIGINT) AS same,
           COUNT(*) AS n_adj FROM adj),
       sh AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
           CAST(SUM(n * n) AS BIGINT) AS sq
         FROM (SELECT COUNT(*) AS n FROM $tbl GROUP BY $groupCol))
       SELECT n_total AS n_rows, same AS same_adjacent,
         round(CAST(n_total AS DOUBLE) / (CAST(n_total AS DOUBLE) - CAST(same AS DOUBLE)), 6)
           AS mean_run_len,
         round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
           - CAST(sq AS DOUBLE) / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE))), 6)
           AS expected_run_len
       FROM sa CROSS JOIN sh"""
}
