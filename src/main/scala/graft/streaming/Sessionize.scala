package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState — the
  * KeyValueGroupedDataset custom-state path (SURVEY §2.6 "Stateful ops",
  * beyond-reference extension; the batch-equivalent expression is the
  * `sessionize` query in SparkEntry).
  *
  * Sessions close after `gapMs` of inactivity (event-time gap within the
  * stream order) or on processing-time timeout. At scale state is
  * hash-partitioned by key and sized O(active sessions) — one small struct
  * per live user.
  */
object Sessionize {

  final case class Event(userId: Long, tsMs: Long)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  def sessionize(
      events: Dataset[Event],
      gapMs: Long
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // sessions close when a later event arrives past the gap; idle
          // sessions stay open in state (production would add an event-time
          // timeout to flush them)
          val sorted = rows.toSeq.sortBy(_.tsMs)
          val out = scala.collection.mutable.ListBuffer[Session]()
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              // merge only when the event extends the session window
              // [start-gap, last+gap]; a cross-batch late event older than
              // that becomes its own immediate session instead of moving
              // `last` backwards (endMs < startMs corruption)
              case Some(s) if e.tsMs >= s.start - gapMs && e.tsMs <= s.last + gapMs =>
                cur = Some(s.copy(
                  start = math.min(s.start, e.tsMs),
                  last = math.max(s.last, e.tsMs),
                  n = s.n + 1))
              case Some(s) if e.tsMs < s.start - gapMs =>
                out += Session(userId, e.tsMs, e.tsMs, 1) // late straggler
              case Some(s) =>
                out += Session(userId, s.start, s.last, s.n)
                cur = Some(SessionState(e.tsMs, e.tsMs, 1))
              case None =>
                cur = Some(SessionState(e.tsMs, e.tsMs, 1))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
