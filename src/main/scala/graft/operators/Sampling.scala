package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines: the split a
  * document lands in is a pure function of its id (first md5 byte of
  * "salt:id"), so it is stable across runs, engines, partitionings and
  * cluster sizes — re-running the pipeline or adding data never moves an
  * existing document between train and test. One md5 per row, codegen'd,
  * scan-parallel; the DuckDB oracle reproduces it exactly.
  */
object Sampling {

  /** md5-derived byte in [0, 256) for a record id. */
  def splitByte(idCol: Column, salt: String = "split"): Column =
    conv(substring(md5(concat(lit(salt + ":"), idCol.cast("string"))), 1, 2), 16, 10)
      .cast("int")

  /** train/valid/test ≈ 90/5/5 assignment (byte thresholds 230/243). */
  def splitOf(idCol: Column, salt: String = "split"): Column = {
    val b = splitByte(idCol, salt)
    when(b < 230, "train").when(b < 243, "valid").otherwise("test")
  }
}
