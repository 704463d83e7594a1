package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape: each
  * left-side event pairs with same-key right-side events whose event time
  * falls inside the trailing window `[l.ts - horizon, l.ts]` (e.g. "clicks
  * in the hour before each purchase").
  *
  * Why this is its own operator and not just `join`: an append-mode
  * stream-stream join is only runnable when Spark can BOUND the join state,
  * which takes both a watermark on each side and a time-range predicate
  * tying the two event times together. With those present the planner picks
  * `StreamingSymmetricHashJoin` and evicts buffered rows as the watermark
  * passes `ts + horizon` — state is O(key × horizon), not O(stream). The
  * same call works on batch frames (watermarks skipped), so the batch
  * oracle query and the streaming pipeline share one definition —
  * batch/stream parity is spec-pinned.
  *
  * 100 TB shape: the join state is hash-partitioned by key across
  * executors; horizon length is the state-size dial. Reference analogue:
  * basenine's streaming queries re-evaluate a predicate per record
  * (`server/lib/eval.go`) and cannot correlate two streams at all —
  * beyond-parity.
  */
object StreamJoin {

  /** Inner interval join: `lKey == rKey` and `rTs ∈ [lTs - horizon, lTs]`.
    * Column names of `left` and `right` must be disjoint. `horizonSeconds`
    * also serves as the delay in each side's watermark when streaming.
    */
  def intervalJoin(left: DataFrame, lKey: String, lTs: String,
      right: DataFrame, rKey: String, rTs: String,
      horizonSeconds: Long): DataFrame = {
    val wm = s"$horizonSeconds seconds"
    val l = if (left.isStreaming) left.withWatermark(lTs, wm) else left
    val r = if (right.isStreaming) right.withWatermark(rTs, wm) else right
    l.join(r,
      col(lKey) === col(rKey) &&
        col(rTs) >= col(lTs) - expr(s"INTERVAL $horizonSeconds SECONDS") &&
        col(rTs) <= col(lTs))
  }
}
