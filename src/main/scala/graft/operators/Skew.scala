package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual salting patterns for the cases
  * AQE's runtime skew-join split doesn't cover (aggregations; joins whose
  * skew AQE underestimates). Both transforms are RESULT-IDENTICAL to their
  * unsalted forms, so the driver's DuckDB oracle checks them against the
  * plain SQL join/GROUP BY.
  */
object Skew {

  /** Two-phase salted aggregation: a hot grouping key is first split into
    * `salts` sub-groups (salt derived deterministically from a row column,
    * so the same row always lands in the same sub-group), partially
    * aggregated, then re-aggregated by the bare key. Sum/count re-aggregate
    * exactly; the DECIMAL accumulator keeps the sum order-independent, so
    * the result is bit-identical to the one-phase form. At scale: the first
    * shuffle spreads a hot key over `salts` reducers instead of one.
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valCol: String,
      saltSrc: Column, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(saltSrc), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        sum(col(valCol).cast("decimal(18,6)")).as("_psum"),
        count(lit(1)).as("_pn"))
      .groupBy(col(keyCol))
      // exact decimal sum out — presentation (rounding, double cast,
      // aliases) belongs to the caller, like every other aggregate operator
      .agg(
        sum(col("_psum")).as("sum_" + valCol),
        sum(col("_pn")).as("n"))

  /** Salted equi-join: the big (skewed) side gets a deterministic salt in
    * [0, salts); the dim side is replicated once per salt value (explode of
    * a sequence — `salts`× the dim, NOT a cartesian product), and the join
    * key becomes (key, salt). A hot key's rows now hash to `salts` distinct
    * reducers. Result-identical to the unsalted join.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, bigKey: String, dimKey: String,
      saltSrc: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(hash(saltSrc), lit(salts)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(saltedDim,
        saltedBig(bigKey) === saltedDim(dimKey) &&
          saltedBig("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
