package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming ordered-funnel tracking on the Spark 4 `transformWithState`
  * API — the online analogue of [[graft.operators.EventSeq.funnel]] (the
  * batch `funnel` board query): each user's deepest in-order, within-window
  * stage is one typed `ValueState` struct, and a record is emitted the
  * moment a user ADVANCES a stage — the "user just converted" trigger a
  * live funnel dashboard or alerting rule consumes, without rescanning
  * history. Migrated from `flatMapGroupsWithState` in round 9 with the
  * fold factored out and shared by [[batchState]], so the offline
  * bootstrap ≡ streamed history by construction.
  *
  * Semantics match the batch first-touch definition exactly when events
  * arrive per-user in event-time order (each micro-batch is sorted
  * internally; cross-batch order is the same stream-order assumption
  * [[Sessionize]]'s merge path documents): stage 0 fires on the user's
  * first stage-0 event, stage i on the first stage-i event strictly after
  * the recorded stage-(i−1) time and within the window.
  *
  * Scale: state is ONE (stage, ts) pair per user ever seen — O(users),
  * hash-partitioned by key, RocksDB-resident; no per-user event history is
  * retained, unlike sessionization which must buffer open-session extents.
  */
object StreamFunnel {

  final case class Event(userId: Long, tsMs: Long, eventType: String)
  /** deepest stage reached (index into `stages`) and when */
  final case class FunnelState(stage: Int, tMs: Long)
  final case class Advance(userId: Long, stageIdx: Int, tsMs: Long)

  /** The per-key fold shared by the streaming processor and the batch
    * bootstrap. */
  private[streaming] def fold(userId: Long, prev: Option[FunnelState],
      sorted: Seq[Event], stages: Seq[String],
      windowMs: Long): (Option[FunnelState], Seq[Advance]) = {
    val out = scala.collection.mutable.ListBuffer[Advance]()
    var cur = prev
    sorted.foreach { e =>
      val nextIdx = cur.map(_.stage + 1).getOrElse(0)
      val inOrder = e.eventType == stages.applyOrElse(nextIdx, (_: Int) => null)
      val inWindow = cur.forall(s => e.tsMs > s.tMs && e.tsMs <= s.tMs + windowMs)
      if (nextIdx < stages.length && inOrder && inWindow) {
        cur = Some(FunnelState(nextIdx, e.tsMs))
        out += Advance(userId, nextIdx, e.tsMs)
      }
    }
    (cur, out.toSeq)
  }

  /** Public for the generated state serializer (Janino visibility). */
  final class Processor(stages: Seq[String], windowMs: Long,
      ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessorWithInitialState[Long, Event, Advance, FunnelState] {
    @transient private var state: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], ttl)

    override def handleInitialState(key: Long, initial: FunnelState,
        timerValues: TimerValues): Unit =
      state.update(initial)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Advance] = {
      val prev = if (state.exists()) Some(state.get()) else None
      val (next, out) = fold(key, prev, rows.toSeq.sortBy(_.tsMs), stages, windowMs)
      next.foreach(state.update)
      out.iterator
    }
  }

  /** `ttl` bounds the PER-USER keyspace (round-9 verdict #4): a user whose
    * last event is more than `windowMs` old can never advance again (the
    * in-window test fails forever), so their (stage, ts) state is dead
    * weight — set ttl ≳ windowMs (plus event-vs-processing-time slack) and
    * retired users are evicted instead of accumulating one RocksDB row per
    * user EVER seen. An evicted user who reappears restarts at stage 0 —
    * exactly what the window semantics would conclude anyway. None =
    * keep-forever (bounded user panels, replays, bootstrap parity).
    */
  def funnel(
      events: Dataset[Event],
      stages: Seq[String],
      windowMs: Long,
      ttl: Option[java.time.Duration] = None
  ): Dataset[Advance] = {
    require(stages.nonEmpty, "StreamFunnel: at least one stage")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(
        new Processor(stages, windowMs,
          ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)),
        ttl.map(_ => TimeMode.ProcessingTime()).getOrElse(TimeMode.None()),
        OutputMode.Append())
  }

  /** Every user's funnel position after replaying `events` offline — same
    * [[fold]], distributed per key. Users who never advanced a stage have
    * no state (the stream side would hold none either). */
  def batchState(events: Dataset[Event], stages: Seq[String],
      windowMs: Long): Dataset[(Long, FunnelState)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .mapGroups { (u, it) =>
        val (st, _) = fold(u, None, it.toSeq.sortBy(_.tsMs), stages, windowMs)
        (u, st)
      }
      .flatMap { case (u, st) => st.map(s => (u, s)) }
  }

  /** [[funnel]] starting from [[batchState]]'s output instead of replaying
    * history. */
  def funnelBootstrapped(events: Dataset[Event],
      initial: Dataset[(Long, FunnelState)], stages: Seq[String],
      windowMs: Long): Dataset[Advance] = {
    require(stages.nonEmpty, "StreamFunnel: at least one stage")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(new Processor(stages, windowMs),
        TimeMode.None(), OutputMode.Append(), initial.groupByKey(_._1).mapValues(_._2))
  }
}
