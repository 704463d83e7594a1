package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Dead-stream (heartbeat) detector: alert when a key that HAS been
  * producing events goes silent for longer than `silenceMs` of event time —
  * the ingest-liveness monitor every always-on pipeline runs beside its
  * processing topology (a silent source is indistinguishable from a healthy
  * one to every count-based operator, because silence produces no rows to
  * aggregate; detecting it requires TIMEOUTS, not data).
  *
  * This is the repo's one operator driven by TIMER semantics: a
  * transformWithState event-time timer arms a per-key deadline at
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

  /** The transformWithState TIMER form of the legacy EventTimeTimeout
    * (round-9 migration): new data re-arms the key's deadline by DELETING
    * the stale timer and registering `last + silenceMs`; the alert fires in
    * [[Processor.handleExpiredTimer]] when the watermark passes it, and the
    * state is cleared so a revived key starts a fresh cycle. Public class
    * for the Janino-generated serializers.
    */
  final class Processor(silenceMs: Long)
      extends StatefulProcessor[String, TimedEvent, Silence] {
    @transient private var state: ValueState[SilenceState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SilenceState]("silence",
        Encoders.product[SilenceState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[Silence] = {
      var maxTs = Long.MinValue
      rows.foreach(e => if (e.tsMs > maxTs) maxTs = e.tsMs)
      val prev = if (state.exists()) Some(state.get().lastMs) else None
      val last = math.max(prev.getOrElse(Long.MinValue), maxTs)
      // re-arm: the stale deadline must go, or it would fire a false alert
      // for a key that kept producing (the legacy API's setTimeoutTimestamp
      // replaced the deadline implicitly; timers need the delete spelled out)
      prev.foreach(p => getHandle.deleteTimer(p + silenceMs))
      state.update(SilenceState(last))
      getHandle.registerTimer(last + silenceMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Silence] = {
      // a deleted-but-raced stale timer must not alert a live key
      if (!state.exists() ||
          state.get().lastMs + silenceMs != expiredTimerInfo.getExpiryTimeInMs)
        Iterator.empty
      else {
        val last = state.get().lastMs
        state.clear()
        Iterator.single(Silence(key, last, last + silenceMs))
      }
    }
  }

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
      .transformWithState(new Processor(silenceMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
