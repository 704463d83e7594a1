package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-key top-N that survives key skew.
  *
  * The naive `row_number() OVER (PARTITION BY key ORDER BY ...) <= n` puts
  * EVERY row of a key into one window group — one task, one sort, one spill
  * when a key is corpus-sized (a hot source domain, a query vector ranked
  * against the whole corpus). AQE splits skewed JOIN partitions but can
  * never split a window partition, so the honest distributed shape is
  * two-phase (the classic TopK combiner):
  *
  *   1. rank within (key, salt-of-candidate) — S·|key| groups, each
  *      1/S-sized, spread across the cluster — and keep each cell's top n;
  *      any row outside its CELL's top n is outside the key's top n a
  *      fortiori, so this discards no answer;
  *   2. rank the ≤ S·n survivors per key with the plain window — groups are
  *      now bounded by S·n regardless of corpus size.
  *
  * `order` must be a TOTAL order (caller includes a unique tiebreaker) —
  * same requirement the single-window form has for a deterministic result.
  */
object TopK {

  def perKey(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Column],
      saltFrom: Column,
      n: Int,
      salts: Int = 32,
      rankCol: String = "rank"
  ): DataFrame = {
    require(n > 0 && salts > 0, s"TopK.perKey: need n > 0 and salts > 0")
    val keyCols = keys.map(col)
    val cell = Window
      .partitionBy(keyCols :+ pmod(xxhash64(saltFrom), lit(salts)): _*)
      .orderBy(order: _*)
    val whole = Window.partitionBy(keyCols: _*).orderBy(order: _*)
    df.withColumn("_tk_rn1", row_number().over(cell))
      .where(col("_tk_rn1") <= n)
      .drop("_tk_rn1")
      .withColumn(rankCol, row_number().over(whole).cast("long"))
      .where(col(rankCol) <= n)
  }
}
