package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sketch

/** Streaming count-min sketch: the counter matrix of
  * [[graft.operators.Sketch.cmsHeavyHitters]] maintained continuously over
  * an unbounded document stream.
  *
  * Why this shape survives an unbounded feed: CMS counters are SUMS, so
  * the streaming aggregation state is the d×w matrix itself — a CONSTANT
  * ≤ d·w rows forever, no watermark needed — where exact heavy-hitter
  * tracking would grow state with the vocabulary (unbounded for n-grams).
  * Each micro-batch's occurrences merge by addition, which is exactly the
  * sketch's merge law; the spec pins stream-final counters bit-equal to
  * the batch sketch of the full history AND the d·w state bound from the
  * query's own progress metrics.
  *
  * The same definition evaluates on a batch frame (the batch/stream parity
  * discipline used by [[StreamJoin]]): grams explode below the aggregate,
  * hashes are the md5 spelling the DuckDB oracle reproduces.
  */
object StreamSketch {

  /** Continuous (r, b) → counter relation over `textCol` bigrams. On a
    * streaming input use `outputMode("complete")` (the relation IS the
    * state, ≤ depth·width rows); on a batch input it equals the batch CMS
    * counter matrix over the same rows.
    */
  def cmsCounters(df: DataFrame, textCol: String, n: Int = 2,
      depth: Int = 4, width: Int = 256): DataFrame =
    df.select(Sketch.gramStream(col(textCol), n).as("gram"))
      .where(Sketch.gramFilter(n))
      .select(Sketch.cmsProbes(col("gram"), depth, width).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("counter"))
}
