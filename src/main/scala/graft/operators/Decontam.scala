package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find training documents that share a token
  * n-gram with any held-out evaluation document — the standard overlap check
  * an LLM data pipeline runs before training (n-gram collision against the
  * eval set; 8–13-gram in published practice, parameterized here).
  *
  * Plan shape at 100 TB: each side explodes its DISTINCT per-document n-grams
  * once (the distinct is per-row, inside codegen — no shuffle), the join key
  * is the fixed-width 32-hex md5 of the gram rather than the raw n·word
  * string (shuffle volume ∝ 32 B/gram instead of the gram text), and the
  * shared-gram count is a hash-partitioned (train, eval) aggregation. Nothing
  * is quadratic: a train document meets only eval documents it actually
  * shares a gram digest with.
  */
object Decontam {

  /** One row per contaminated (train, eval) document pair with the number of
    * distinct shared n-grams. Inputs carry (idCol, textCol); n-grams follow
    * [[Dedup.shingles]] (documents shorter than n tokens contribute their
    * whole text as a single gram, mirrored by the oracle).
    */
  def ngramOverlap(
      train: DataFrame,
      eval_ : DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    def grams(df: DataFrame, outId: String) =
      df.select(
        col(idCol).as(outId),
        explode(array_distinct(
          transform(Dedup.shingles(col(textCol), n), s => md5(s)))).as("g"))
    // both sides are distinct per document, so count(*) per (train, eval)
    // pair IS the number of distinct shared grams
    grams(train, "train_id")
      .join(grams(eval_, "eval_id"), "g")
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))
  }
}
