package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming per-source admission control — the online half of
  * [[graft.operators.SourceCap]]'s domain-cap rule. A batch cap ranks
  * best-first over the finished corpus; a stream cannot see the future, so
  * the online discipline is ARRIVAL-ORDER admission against two budgets:
  * keep a document iff its source is still under `maxDocs` admitted AND
  * under `maxTokens` cumulative tokens (the RefinedWeb-style "stop reading
  * a domain once you have enough of it" gate, applied at ingest instead of
  * at the post-hoc sweep).
  *
  * Deterministic parity with a batch twin under the per-key stream-order
  * assumption (the [[StreamRateAnomaly]]/[[StreamFunnel]] discipline —
  * within a micro-batch rows are folded in (ts, id) order): admitted ids ≡
  * the same greedy fold run over the finished corpus in (ts, id) order —
  * NOT a plain prefix-sum threshold, because a rejected overshooter's
  * tokens never accumulate — pinned by the spec against a reference fold.
  *
  * Scale: state per source is TWO LONGS (admitted count, token sum) —
  * O(sources), hash-partitioned by source, no document history, no
  * timeout needed (a source's budget is corpus-lifetime). At 100 TB the
  * alternative (batch cap) needs the whole corpus on disk first; this
  * admits/rejects at the firehose.
  */
object StreamSourceCap {

  final case class Doc(source: String, id: Long, tsMs: Long, tokens: Long)
  final case class CapState(docs: Long, tokens: Long)
  /** admitted document + its 1-based admission rank within the source */
  final case class Admitted(source: String, id: Long, rank: Long, cumTokens: Long)

  def admit(
      docs: Dataset[Doc],
      maxDocs: Long,
      maxTokens: Long
  ): Dataset[Admitted] = {
    require(maxDocs > 0 && maxTokens > 0, "StreamSourceCap: budgets must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(new FoldProcessor[String, Doc, CapState, Admitted]("cap",
        (source: String, rows: Seq[Doc], prev: Option[CapState]) => {
          // deterministic fold order inside the micro-batch
          val sorted = rows.sortBy(d => (d.tsMs, d.id))
          var st = prev.getOrElse(CapState(0L, 0L))
          val out = scala.collection.mutable.ListBuffer[Admitted]()
          sorted.foreach { d =>
            // admit iff BOTH budgets hold after this doc — a doc that would
            // overshoot the token budget is rejected, later (smaller) docs
            // may still fit: the batch twin uses the same rule, so the
            // admitted set is identical, not merely the same size
            if (st.docs < maxDocs && st.tokens + d.tokens <= maxTokens) {
              st = CapState(st.docs + 1L, st.tokens + d.tokens)
              out += Admitted(source, d.id, st.docs, st.tokens)
            }
          }
          (Some(st), out.toSeq)
        })(Encoders.product[CapState]),
        TimeMode.None(), OutputMode.Append())
  }
}
