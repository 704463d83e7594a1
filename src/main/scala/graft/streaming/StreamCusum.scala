package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming._

/** Streaming level-shift detection via Page's CUSUM (Page, Biometrika
  * 1954) on per-key DAILY counts — the online counterpart of the batch
  * [[graft.operators.Temporal.changepoint]] retrospective argmax, which
  * needs the full span's mean and so cannot run on an open stream. Page's
  * one-sided statistics
  *   S⁺ = max(0, S⁺ + (c − μ₀ − slack)),  S⁻ = max(0, S⁻ + (μ₀ − c − slack))
  * accumulate evidence of a sustained shift against a WARM-UP reference
  * mean μ₀ (first `warmup` calendar days, silent days counting zero) and
  * alert the day the statistic crosses `h·μ₀`, then restart — detection
  * delay proportional to shift size, while a local z-gate
  * ([[StreamRateAnomaly]]) never fires on a gradual level change.
  *
  * Day buckets close when a LATER day's first event arrives (the
  * [[StreamRateAnomaly]] discipline); gap days between two active days
  * fold as explicit zero-count days, so a traffic drought accumulates S⁻
  * deterministically. The still-open last day is unjudged until a flush
  * sentinel (or a later event) closes it. The fold is a pure function of
  * the per-key event-day sequence, shared verbatim with [[batchAlerts]] —
  * the parity spec asserts bit-equal alerts across arbitrary micro-batch
  * splits.
  *
  * Scale: state is EIGHT scalars per key (no day history, no event
  * history), hash-partitioned by key. Batch twin is a per-key
  * flatMapGroups over the (span-bounded) day relation.
  */
object StreamCusum {

  final case class Event(key: String, tsMs: Long)
  final case class CusumState(day0: Long, openDay: Long, openCount: Long,
      warmSum: Long, warmDone: Boolean, mu0: Double, sPos: Double, sNeg: Double)
  final case class Alert(key: String, dayMs: Long, direction: String, stat: Double)

  private val MsPerDay = 86400000L

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fold ONE closed day (day index `d`, count `c`) into the state,
    * emitting an alert when a one-sided statistic crosses the threshold.
    * Pure and shared between the stream and the batch twin. */
  private def closeDay(st: CusumState, d: Long, c: Long, warmup: Int,
      slack: Double, h: Double,
      emit: Alert => Unit, key: String): CusumState = {
    if (d < st.day0 + warmup) st.copy(warmSum = st.warmSum + c)
    else {
      val st1 = if (!st.warmDone)
        st.copy(warmDone = true, mu0 = st.warmSum.toDouble / warmup)
      else st
      val thresh = h * math.max(st1.mu0, 1e-12)
      val sPos = math.max(0.0, st1.sPos + (c - st1.mu0 - slack))
      val sNeg = math.max(0.0, st1.sNeg + (st1.mu0 - c - slack))
      if (sPos > thresh) {
        emit(Alert(key, d * MsPerDay, "up", round4(sPos)))
        st1.copy(sPos = 0.0, sNeg = 0.0)
      } else if (sNeg > thresh) {
        emit(Alert(key, d * MsPerDay, "down", round4(sNeg)))
        st1.copy(sPos = 0.0, sNeg = 0.0)
      } else st1.copy(sPos = sPos, sNeg = sNeg)
    }
  }

  /** Fold a batch of in-order events into the state: closing the open day
    * also folds every silent gap day as an explicit zero. */
  private def foldEvents(key: String, events: Seq[Event], st0: Option[CusumState],
      warmup: Int, slack: Double, h: Double,
      emit: Alert => Unit): Option[CusumState] = {
    var cur = st0
    events.foreach { e =>
      val d = Math.floorDiv(e.tsMs, MsPerDay)
      cur match {
        case None => cur = Some(CusumState(d, d, 1L, 0L, warmDone = false, 0.0, 0.0, 0.0))
        case Some(st) if d == st.openDay =>
          cur = Some(st.copy(openCount = st.openCount + 1))
        case Some(st) if d > st.openDay =>
          var s = closeDay(st, st.openDay, st.openCount, warmup, slack, h, emit, key)
          var gap = st.openDay + 1
          while (gap < d) {
            s = closeDay(s, gap, 0L, warmup, slack, h, emit, key)
            gap += 1
          }
          cur = Some(s.copy(openDay = d, openCount = 1L))
        case Some(_) => () // late event before the open day: out of contract
      }
    }
    cur
  }

  /** Streaming alerts. A flush `Event` with tsMs beyond the stream's end
    * closes the final open day (parity-spec discipline; it opens a fresh
    * day whose own count stays unjudged). */
  def alerts(events: Dataset[Event], warmup: Int = 7, slack: Double = 0.5,
      h: Double = 3.0): Dataset[Alert] = {
    require(warmup > 0 && h > 0, "StreamCusum: bad params")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(new FoldProcessor[String, Event, CusumState, Alert]("cusum",
        (key: String, rows: Seq[Event], prev: Option[CusumState]) => {
          val out = scala.collection.mutable.ListBuffer[Alert]()
          val next = foldEvents(key, rows.sortBy(_.tsMs), prev,
            warmup, slack, h, out += _)
          (next, out.toSeq)
        })(Encoders.product[CusumState]),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin: the SAME per-key fold over a static frame (`keyCol`,
    * `tsCol` timestamp), alerts for every CLOSED day (the last day of each
    * key closes at end-of-data, matching a flushed stream). */
  def batchAlerts(df: DataFrame, keyCol: String, tsCol: String,
      warmup: Int = 7, slack: Double = 0.5, h: Double = 3.0): Dataset[Alert] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        org.apache.spark.sql.functions.unix_millis(col(tsCol)).as("tsMs"))
      .as[Event]
      .groupByKey(_.key)
      .flatMapGroups { (key: String, rows: Iterator[Event]) =>
        val out = scala.collection.mutable.ListBuffer[Alert]()
        val st = foldEvents(key, rows.toSeq.sortBy(_.tsMs), None,
          warmup, slack, h, out += _)
        // end-of-data closes the final open day (flush semantics)
        st.foreach(s => closeDay(s, s.openDay, s.openCount, warmup, slack, h,
          out += _, key))
        out.iterator
      }
  }
}
