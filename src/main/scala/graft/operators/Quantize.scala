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

  /** Matryoshka truncation (Kusupati et al. 2022): keep the first `d`
    * coordinates and L2-renormalize — the cheap-ANN serving path for
    * MRL-trained embeddings (a d-dim prefix search costs dim/d less per
    * probe; candidates re-rank against the full vector). Reports
    * `kept_norm_frac`, the fraction of the vector's L2 norm the prefix
    * retains — the per-vector diagnostic for how truncation-tolerant the
    * embedding actually is.
    *
    * Engine-exact by the [[int8Quantize]] argument: casts, ·, /, sqrt and
    * floor are each correctly rounded, sums fold left in both engines, and
    * the fingerprint quantizes each renormalized coordinate to
    * floor(x·1e6 + 0.5) before hashing — no float printing is compared.
    * All-zero prefixes renormalize to zero codes with frac 0. Pure per-row
    * projection: scan-parallel, no shuffle.
    */
  def mrlTruncate(df: DataFrame, idCol: String, vecCol: String, d: Int): DataFrame = {
    require(d > 0, s"mrlTruncate: need d > 0, got $d")
    val pre = slice(col(vecCol), 1, d)
    def sq(v: Column) = aggregate(v, lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))
    val preNorm = sqrt(sq(pre))
    val fullNorm = sqrt(sq(col(vecCol)))
    df.select(col(idCol), pre.as("_m_p"), preNorm.as("_m_pn"), fullNorm.as("_m_fn"))
      .select(col(idCol),
        when(col("_m_fn") === 0.0, 0.0)
          .otherwise(round(col("_m_pn") / col("_m_fn"), 6)).as("kept_norm_frac"),
        substring(md5(concat_ws(",",
          transform(col("_m_p"), x =>
            when(col("_m_pn") === 0.0, lit(0L))
              .otherwise(floor(x.cast("double") / col("_m_pn") * 1e6 + 0.5).cast("long"))
              .cast("string")))), 1, 16).as("t_fp"))
  }

  /** DuckDB SQL mirror of [[mrlTruncate]] over `tbl(idCol, vecCol)`. */
  def mrlTruncateSql(tbl: String, idCol: String, vecCol: String, d: Int): String =
    s"""WITH a AS (SELECT $idCol, $vecCol[1:$d] AS p,
           sqrt(list_sum(list_transform($vecCol[1:$d], x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS pn,
           sqrt(list_sum(list_transform($vecCol, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS fn
         FROM $tbl)
       SELECT $idCol,
         CASE WHEN fn = 0.0 THEN 0.0 ELSE round(pn / fn, 6) END AS kept_norm_frac,
         md5(array_to_string(list_transform(p, x ->
           CASE WHEN pn = 0.0 THEN 0
                ELSE CAST(floor(CAST(x AS DOUBLE) / pn * 1e6 + 0.5) AS BIGINT) END),
           ','))[:16] AS t_fp
       FROM a ORDER BY $idCol"""
}
