package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization for storage/serving: symmetric per-vector int8 —
  * scale = amax/127, q_i = floor(v_i/amax·127 + 0.5) — the standard
  * compression step before shipping an embedding table to an ANN index
  * (4× smaller than float32, dot products within ~0.5% at these dims).
  *
  * Exactness is structural, not rounded-away: the float→double casts are
  * exact, and /, ·, +0.5 and floor are each correctly rounded under
  * IEEE 754 — identical operands in the identical order give bit-identical
  * quantized codes in Spark and DuckDB, so the oracle compares md5
  * fingerprints of the code arrays, not approximations. (floor(x+0.5) is
  * the engine-stable round-half-up; round() itself differs between engines
  * on exact halves — see TextAnalysis.unigramLogprob.)
  *
  * Pure per-row Column expression: scan-parallel, no shuffle, nothing at
  * the driver. The all-zero vector quantizes to scale 0 and zero codes.
  */
object Quantize {

  /** max |v_i| as double (exact float→double) */
  def absMax(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** int8 codes for one vector given its absMax (0 ⇒ all-zero codes) */
  def int8Codes(vec: Column, amax: Column): Column =
    transform(vec, x =>
      when(amax === 0.0, lit(0))
        .otherwise(floor(x.cast("double") / amax * 127.0 + 0.5).cast("int")))

  /** One row per vector: dims, scale, and the md5 fingerprint of the
    * comma-joined int8 codes (the cross-engine equality witness).
    */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val amax = absMax(col(vecCol))
    df.select(col(idCol), amax.as("_q_amax"), col(vecCol).as("_q_v"))
      .select(col(idCol),
        size(col("_q_v")).cast("long").as("n_dims"),
        (col("_q_amax") / 127.0).as("scale"),
        substring(md5(concat_ws(",",
          transform(int8Codes(col("_q_v"), col("_q_amax")), _.cast("string")))), 1, 16)
          .as("q_fp"))
  }

  /** DuckDB SQL mirror of [[int8Quantize]] over `tbl(idCol, vecCol)`. */
  def int8QuantizeSql(tbl: String, idCol: String, vecCol: String): String =
    s"""WITH a AS (SELECT $idCol, $vecCol AS v,
           list_max(list_transform($vecCol, x -> abs(CAST(x AS DOUBLE)))) AS amax
         FROM $tbl)
       SELECT $idCol, CAST(len(v) AS BIGINT) AS n_dims, amax / 127.0 AS scale,
         md5(array_to_string(list_transform(v, x ->
           CASE WHEN amax = 0.0 THEN 0
                ELSE CAST(floor(CAST(x AS DOUBLE) / amax * 127.0 + 0.5) AS INTEGER) END),
           ','))[:16] AS q_fp
       FROM a ORDER BY $idCol"""
}
