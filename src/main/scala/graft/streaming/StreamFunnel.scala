package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel tracking via flatMapGroupsWithState — the
  * online analogue of [[graft.operators.EventSeq.funnel]] (the batch
  * `funnel` board query): each user's deepest in-order, within-window stage
  * is tracked as one tiny state struct, and a record is emitted the moment
  * a user ADVANCES a stage — the "user just converted" trigger a live
  * funnel dashboard or alerting rule consumes, without rescanning history.
  *
  * Semantics match the batch first-touch definition exactly when events
  * arrive per-user in event-time order (each micro-batch is sorted
  * internally; cross-batch order is the same stream-order assumption
  * [[Sessionize]]'s merge path documents): stage 0 fires on the user's
  * first stage-0 event, stage i on the first stage-i event strictly after
  * the recorded stage-(i−1) time and within the window.
  *
  * Scale: state is ONE (stage, ts) pair per user ever seen — O(users),
  * hash-partitioned by key; no per-user event history is retained, unlike
  * sessionization which must buffer open-session extents.
  */
object StreamFunnel {

  final case class Event(userId: Long, tsMs: Long, eventType: String)
  /** deepest stage reached (index into `stages`) and when */
  final case class FunnelState(stage: Int, tMs: Long)
  final case class Advance(userId: Long, stageIdx: Int, tsMs: Long)

  def funnel(
      events: Dataset[Event],
      stages: Seq[String],
      windowMs: Long
  ): Dataset[Advance] = {
    require(stages.nonEmpty, "StreamFunnel: at least one stage")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, Advance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(_.tsMs)
          val out = scala.collection.mutable.ListBuffer[Advance]()
          var cur = state.getOption
          sorted.foreach { e =>
            val nextIdx = cur.map(_.stage + 1).getOrElse(0)
            val inOrder = e.eventType == stages.applyOrElse(nextIdx, (_: Int) => null)
            val inWindow = cur.forall(s => e.tsMs > s.tMs && e.tsMs <= s.tMs + windowMs)
            if (nextIdx < stages.length && inOrder && inWindow) {
              cur = Some(FunnelState(nextIdx, e.tsMs))
              out += Advance(userId, nextIdx, e.tsMs)
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
