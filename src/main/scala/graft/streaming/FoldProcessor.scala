package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming._

/** Adapter that runs a legacy `flatMapGroupsWithState`-style per-key fold
  * — `(key, batchRows, Option[state]) => (Option[state], outputs)` — as a
  * Spark 4 [[StatefulProcessor]] with a typed RocksDB-backed `ValueState`.
  *
  * The round-9 migration vehicle for the stateful streaming operators whose
  * state needs no bespoke bootstrap path (the three that do — Sessionize,
  * StreamFunnel, StreamNearDup — carry hand-written
  * `StatefulProcessorWithInitialState` implementations instead): the fold
  * body is IDENTICAL to the legacy lambda, so the API migration cannot
  * change an operator's semantics, and every operator gains typed state +
  * the state-store offloading the legacy API never had.
  *
  * Class (not anonymous) and public: the generated state serializer news
  * state classes from Janino code, and the processor itself is serialized
  * to executors — the fold closure must be serializable, exactly as the
  * legacy lambda had to be.
  */
final class FoldProcessor[K, I, S, O](
    stateName: String,
    fold: (K, Seq[I], Option[S]) => (Option[S], Seq[O]),
    ttl: TTLConfig = TTLConfig.NONE)(implicit senc: Encoder[S])
    extends StatefulProcessor[K, I, O]
    with Serializable {

  @transient private var state: ValueState[S] = _

  // ttl != NONE requires TimeMode.ProcessingTime on the transformWithState
  // call (Spark evaluates state TTL against the batch processing clock);
  // expired keys read as absent, so the fold restarts them from None —
  // the keyspace bound for per-user/per-query monitors whose keys retire
  // (round-9 verdict #4). Operators with calendar- or sketch-bounded
  // keyspaces keep NONE.
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[S](stateName, senc, ttl)

  override def handleInputRows(key: K, rows: Iterator[I],
      timerValues: TimerValues): Iterator[O] = {
    val prev = if (state.exists()) Some(state.get()) else None
    val (next, out) = fold(key, rows.toSeq, prev)
    next.foreach(state.update)
    out.iterator
  }
}
