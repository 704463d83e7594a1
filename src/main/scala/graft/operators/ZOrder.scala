package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data skipping. Sorting
  * a table by the bit-interleaving of two filter dimensions clusters rows
  * that are close in BOTH dimensions into the same files, so each file's
  * parquet min/max footer covers a small box of the 2-D space and a box
  * filter prunes most files at planning time. A single-column sort gives
  * perfect skipping on one dimension and none on the other; Z-order trades
  * a little of each for skipping on BOTH — the Delta/Iceberg OPTIMIZE
  * ZORDER layout, built from plain Column bit algebra.
  *
  * Complements [[Bucketing]]: bucketing is the JOIN-key layout, Z-order the
  * FILTER-key layout; both pay one write-time sort to make every subsequent
  * scan cheaper. The skipping effect (files whose min/max box intersects a
  * query box, Z vs linear layout) is measured, not assumed, in ZOrderSpec.
  */
object ZOrder {

  /** Morton interleave of the low 16 bits of two non-negative longs:
    * x's bit b → output bit 2b, y's bit b → output bit 2b+1. Pure integer
    * algebra, identical in both engines; OR-fold is order-independent.
    */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16).map { b =>
      shiftleft(shiftrightunsigned(x, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftrightunsigned(y, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduceLeft(_ bitwiseOR _)

  /** The same interleave as DuckDB SQL over two BIGINT expressions. */
  def interleave16Sql(x: String, y: String): String =
    (0 until 16).map { b =>
      s"((((($x >> $b) & 1) << ${2 * b})) | (((($y >> $b) & 1) << ${2 * b + 1})))"
    }.mkString(" | ")

  /** `df` sorted by the Z-value of the two dimensions (low 16 bits each) —
    * the write-side layout step: `zorderBy(df, "user_id", floor(value))
    * .write.parquet(...)` with a records-per-file cap yields the skippable
    * file set. A global range sort (one exchange) — exactly the cost of any
    * ordered write.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column): DataFrame =
    df.orderBy(interleave16(x, y))
}
