package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Dead-stream (heartbeat) detector: alert when a key that HAS been
  * producing events goes silent for longer than `silenceMs` of event time —
  * the ingest-liveness monitor every always-on pipeline runs beside its
  * processing topology (a silent source is indistinguishable from a healthy
  * one to every count-based operator, because silence produces no rows to
  * aggregate; detecting it requires TIMEOUTS, not data).
  *
  * This is the repo's one operator driven by state-timeout semantics:
  * `GroupStateTimeout.EventTimeTimeout` arms a per-key deadline at
  * `last_seen + silenceMs`; the alert fires when the WATERMARK (not the
  * wall clock) passes the deadline, so results are deterministic under
  * replay and late data inside the watermark delay cannot false-alarm.
  * New data for a key re-arms its deadline; after an alert the state is
  * removed, so a revived key starts a fresh cycle (one alert per silence
  * episode, not one per trigger).
  *
  * Scale: state is ONE long per live key, hash-partitioned; silent keys
  * leave state entirely once alerted. The watermark advances with the
  * GLOBAL stream, which is exactly the operational semantics wanted: "the
  * pipeline has progressed to T and key k was last heard from at T−Δ".
  */
object StreamSilence {

  // public: Janino-generated deserializers cannot construct object-private
  // classes (see StreamNearDup's state-class gotcha)
  final case class TimedEvent(key: String, tsMs: Long,
    eventTime: java.sql.Timestamp)
  final case class SilenceState(lastMs: Long)
  final case class Silence(key: String, last_seen_ms: Long, deadline_ms: Long)

  /** `events`: (key, event-time millis). `watermarkDelay` bounds how late
    * data may arrive without false-alarming.
    */
  def detect(events: Dataset[(String, Long)], silenceMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[Silence] = {
    require(silenceMs > 0, "StreamSilence: silenceMs must be positive")
    import events.sparkSession.implicits._
    events
      .select(col("_1").as("key"), col("_2").as("tsMs"),
        timestamp_millis(col("_2")).as("eventTime"))
      .withWatermark("eventTime", watermarkDelay)
      .as[TimedEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SilenceState, Silence](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[TimedEvent], state: GroupState[SilenceState]) =>
          if (state.hasTimedOut) {
            val last = state.get.lastMs
            state.remove()
            Iterator.single(Silence(key, last, last + silenceMs))
          } else {
            val maxTs = rows.map(_.tsMs).max
            val last = math.max(state.getOption.map(_.lastMs).getOrElse(Long.MinValue), maxTs)
            state.update(SilenceState(last))
            state.setTimeoutTimestamp(last + silenceMs)
            Iterator.empty
          }
      }
  }
}
