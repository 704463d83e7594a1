package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile normalization across sources (the microarray batch-correction
  * discipline — Bolstad et al., Bioinformatics 2003 — applied to corpus
  * quality scores): replace each document's raw score with the CORPUS
  * value at the same quantile the document occupies WITHIN ITS SOURCE, so
  * every source's score distribution maps onto the pooled reference and
  * "top decile of source A" means the same thing as "top decile of source
  * B". The cross-source comparability fix a mixture-sampling plan needs
  * before it thresholds scores globally: without it, a lenient scorer's
  * mediocre docs outrank a strict scorer's good ones.
  *
  * Determinism: the within-source position is percent_rank over (score,
  * doc_id) — the id tie-break removes rank ties, so both engines agree
  * exactly; the reference profile is the exact 21-point corpus percentile
  * grid (`percentile` ≡ `quantile_cont`, round(4) masking interpolation
  * ulps — the `percentiles`-query convention), nearest-gridpoint lookup
  * (round half-up, identical in both engines).
  *
  * Scale shape: the grid is ONE tiny agg row broadcast back (the
  * [[`value_bands`]] breakpoint discipline); the per-source rank is a
  * window partitioned by source (per-source sort, never global). The only
  * data-sized shuffle is that one keyed sort.
  */
object QuantileNorm {

  private val GridPoints = 20 // grid resolution: j/20 for j in 0..20

  /** One row per input row: source, raw score, within-source percentile,
    * and the corpus-profile normalized score. */
  def normalize(df: DataFrame, idCol: String, srcCol: String,
      scoreCol: String): DataFrame = {
    val probs = (0 to GridPoints).map(j => j.toDouble / GridPoints)
      .mkString("array(", ", ", ")")
    val grid = df.agg(
      expr(s"percentile(CAST($scoreCol AS DOUBLE), $probs)").as("grid"))
    val w = Window.partitionBy(srcCol).orderBy(col("score"), col(idCol))
    df
      .select(col(idCol), col(srcCol), col(scoreCol).cast("double").as("score"))
      .withColumn("pct", percent_rank().over(w))
      .crossJoin(broadcast(grid))
      .select(col(idCol), col(srcCol), col("score"),
        round(col("pct"), 6).as("pct"),
        round(element_at(col("grid"),
          (round(col("pct") * GridPoints, 0) + 1).cast("int")), 4)
          .as("norm_score"))
  }

  /** DuckDB mirror of [[normalize]]. */
  def normalizeSql(tbl: String, idCol: String, srcCol: String,
      scoreCol: String): String = {
    val probs = (0 to GridPoints).map(j => j.toDouble / GridPoints)
      .mkString("[", ", ", "]")
    s"""WITH g AS (SELECT quantile_cont(CAST($scoreCol AS DOUBLE), $probs) AS grid FROM $tbl),
       r AS (SELECT $idCol, $srcCol, CAST($scoreCol AS DOUBLE) AS score,
           percent_rank() OVER (PARTITION BY $srcCol ORDER BY $scoreCol, $idCol) AS pct
         FROM $tbl)
       SELECT $idCol, $srcCol, score, round(pct, 6) AS pct,
         round(grid[CAST(round(pct * $GridPoints, 0) AS INT) + 1], 4) AS norm_score
       FROM r CROSS JOIN g"""
  }
}
