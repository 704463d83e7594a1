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

  /** Deterministic stratified sampling: EXACTLY `ceil(frac * |stratum|)`
    * rows from every stratum, chosen by md5 rank — so small strata are never
    * silently dropped (the failure mode of Bernoulli `sample()` on skewed
    * language/source distributions) and the selection is stable across
    * runs, engines and partitionings.
    *
    * One shuffle by stratum serves both windows (rank and stratum size);
    * the md5 order plus the id tie-break is a total order, so the picked
    * set is unique. Skewed strata put one stratum in one partition — the
    * documented mitigation at extreme scale is pre-splitting hot strata
    * with [[graft.operators.Skew]]-style salting and re-merging ranks,
    * which preserves the same selection because ranks only compare within
    * a stratum.
    */
  def stratifiedSample(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      stratumCol: String,
      frac: Double,
      salt: String = "sample"
  ): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // withColumn would silently REPLACE same-named input columns and the
    // final drop would then remove the caller's data — refuse instead
    require(!df.columns.contains("_ss_rn") && !df.columns.contains("_ss_n"),
      "stratifiedSample: input already has a _ss_rn/_ss_n column")
    val key = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    val byStratum = Window.partitionBy(col(stratumCol))
    df.withColumn("_ss_rn", row_number().over(byStratum.orderBy(key, col(idCol))))
      .withColumn("_ss_n", count(lit(1)).over(byStratum))
      .where(col("_ss_rn") <= ceil(col("_ss_n") * frac))
      .drop("_ss_rn", "_ss_n")
  }
}
