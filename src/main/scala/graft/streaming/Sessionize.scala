package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Stateful streaming sessionization on the Spark 4 `transformWithState`
  * API — `StatefulProcessor` + typed `ValueState`, RocksDB-backed (SURVEY
  * §2.6 "Stateful ops", beyond-reference extension; the batch-equivalent
  * expression is the `sessionize` query in SparkEntry). Migrated from
  * `flatMapGroupsWithState` in round 9: same per-key fold (shared code, so
  * the migration cannot drift), plus the initial-state bootstrap the legacy
  * API never offered — [[batchState]] recomputes every user's open session
  * offline and [[sessionizeBootstrapped]] streams forward from it, the
  * lambda-architecture handoff ([[StreamKmv]] precedent).
  *
  * Sessions close after `gapMs` of inactivity (event-time gap within the
  * stream order) or when a later event arrives past the gap. At scale state
  * is hash-partitioned by key and sized O(active sessions) — one small
  * struct per live user, in the state store, not the heap.
  */
object Sessionize {

  final case class Event(userId: Long, tsMs: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** The per-key event fold — ONE implementation shared by the streaming
    * processor and the batch bootstrap, so stream ≡ batch-state-then-tail by
    * construction. A later event past the gap closes the open session; a
    * cross-batch late event older than the open window [start−gap, last+gap]
    * becomes its own immediate session instead of moving `last` backwards
    * (endMs < startMs corruption).
    */
  private[streaming] def fold(userId: Long, prev: Option[SessionState],
      sorted: Seq[Event], gapMs: Long): (Option[SessionState], Seq[Session]) = {
    val out = scala.collection.mutable.ListBuffer[Session]()
    var cur = prev
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.tsMs >= s.start - gapMs && e.tsMs <= s.last + gapMs =>
          cur = Some(s.copy(
            start = math.min(s.start, e.tsMs),
            last = math.max(s.last, e.tsMs),
            n = s.n + 1))
        case Some(_) if e.tsMs < cur.get.start - gapMs =>
          out += Session(userId, e.tsMs, e.tsMs, 1) // late straggler
        case Some(s) =>
          out += Session(userId, s.start, s.last, s.n)
          cur = Some(SessionState(e.tsMs, e.tsMs, 1))
        case None =>
          cur = Some(SessionState(e.tsMs, e.tsMs, 1))
      }
    }
    (cur, out.toSeq)
  }

  /** Serves both the cold start and the bootstrapped start (a
    * `StatefulProcessorWithInitialState` IS a `StatefulProcessor`). Public:
    * the generated state serializer news the class from Janino code (the
    * StreamNearDup gotcha).
    */
  final class Processor(gapMs: Long, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessorWithInitialState[Long, Event, Session, SessionState] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], ttl)

    override def handleInitialState(key: Long, initial: SessionState,
        timerValues: TimerValues): Unit =
      state.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val (next, out) = fold(key, prev, rows.toSeq.sortBy(_.tsMs), gapMs)
      next.foreach(state.update)
      out.iterator
    }
  }

  /** `ttl` bounds the PER-USER keyspace (the round-10 residual: the open-
    * session extents are unbounded exactly like StreamFunnel's were): a
    * user idle past the TTL has their open-session extent EVICTED — that
    * session's close event is forfeited (it was never going to close by
    * event arrival anyway; a real deployment pairs the TTL with a timer- or
    * batch-side flush if the tail session matters) and a revived user
    * starts a fresh session from None, exactly like a cold key. Set
    * ttl ≫ gapMs (plus event-vs-processing-time slack) so only truly
    * retired users evict. TTL is a processing-time contract, so setting it
    * switches the query to `TimeMode.ProcessingTime` — StateTtlSpec's
    * throttled-trigger harness applies.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      ttl: Option[java.time.Duration] = None): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(
        new Processor(gapMs, ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)),
        ttl.map(_ => TimeMode.ProcessingTime()).getOrElse(TimeMode.None()),
        OutputMode.Append())
  }

  /** Every user's OPEN session after replaying `events` (the history) —
    * computed distributed per key via the same [[fold]] the stream runs, so
    * bootstrapped continuation is bit-equal to having streamed the history.
    * Per-key history fits the group iterator by the same argument the
    * streaming micro-batch sort makes (one user's events, not the corpus).
    */
  def batchState(events: Dataset[Event], gapMs: Long): Dataset[(Long, SessionState)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId).mapGroups { (u, it) =>
      val (st, _) = fold(u, None, it.toSeq.sortBy(_.tsMs), gapMs)
      (u, st.get) // a key exists only if it had events, so the fold left a state
    }
  }

  /** [[sessionize]] starting from [[batchState]]'s output instead of
    * replaying history. */
  def sessionizeBootstrapped(events: Dataset[Event],
      initial: Dataset[(Long, SessionState)], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(new Processor(gapMs), TimeMode.None(),
        OutputMode.Append(), initial.groupByKey(_._1).mapValues(_._2))
  }
}
