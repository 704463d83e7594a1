package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming heavy hitters — the online twin of the batch
  * `cms_heavy` / [[graft.operators.TopK]] frequency queries: per group,
  * maintain a Space-Saving summary (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams") of at
  * most `k` counters and emit the summary as a snapshot each trigger
  * that touches the group.
  *
  * Unlike [[StreamQuantile]]'s commutative histogram, a bounded
  * heavy-hitter summary cannot be order-insensitive — so the parity
  * contract with the batch engine is the algorithm's GUARANTEE, which
  * holds for EVERY arrival order and micro-batch split (pinned by
  * StreamTopKSpec against a batch groupBy-count over the same rows):
  *
  *   - no false negatives: every item with true count > n/k is in the
  *     final summary;
  *   - over-approximation: est >= true count for every surviving item;
  *   - bounded error: est - err <= true count (err is the counter's
  *     inherited overestimate), and err <= n/k.
  *
  * Scale: state per group is exactly `k` (item, est, err) triples
  * regardless of stream length or item cardinality — the property that
  * makes per-source vocabulary monitoring over an unbounded ingest
  * feasible where a full groupBy-count state would grow with the
  * domain. Snapshots are append-mode rows; readers keep the latest per
  * group (max n).
  */
object StreamTopK {

  final case class Obs(group: String, item: String)
  final case class Counter(item: String, est: Long, err: Long)
  final case class TkState(n: Long, counters: List[Counter])
  final case class Snapshot(group: String, n: Long, item: String, est: Long, err: Long)

  /** One Space-Saving step. Deterministic eviction: among minimum-est
    * counters the lexicographically-largest item is replaced, so a
    * given arrival order yields one reproducible summary.
    */
  private[streaming] def step(st: TkState, item: String, k: Int): TkState = {
    val n = st.n + 1
    st.counters.indexWhere(_.item == item) match {
      case i if i >= 0 =>
        val c = st.counters(i)
        TkState(n, st.counters.updated(i, c.copy(est = c.est + 1)))
      case _ if st.counters.size < k =>
        TkState(n, Counter(item, 1L, 0L) :: st.counters)
      case _ =>
        val m = st.counters.minBy(c => (c.est, c.item))(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
        TkState(n, Counter(item, m.est + 1, m.est) ::
          st.counters.filterNot(c => c.item == m.item))
    }
  }

  def snapshots(obs: Dataset[Obs], k: Int): Dataset[Snapshot] = {
    require(k >= 1, s"StreamTopK: k must be >= 1, got $k")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.group)
      .transformWithState(new FoldProcessor[String, Obs, TkState, Snapshot]("topk",
        (group: String, rows: Seq[Obs], prev: Option[TkState]) => {
          var st = prev.getOrElse(TkState(0L, Nil))
          var added = 0L
          rows.foreach { o => st = step(st, o.item, k); added += 1L }
          if (added == 0) (prev, Seq.empty)
          else (Some(st), st.counters.sortBy(c => (-c.est, c.item))
            .map(c => Snapshot(group, st.n, c.item, c.est, c.err)))
        })(Encoders.product[TkState]),
        TimeMode.None(), OutputMode.Append())
  }
}
