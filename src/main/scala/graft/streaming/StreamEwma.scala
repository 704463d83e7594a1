package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming EWMA anomaly monitor via transformWithState — the online
  * analogue of [[graft.operators.Temporal.ewmaDaily]] (the batch
  * `ewma_daily` board query): per key, the exponentially-weighted level
  * advances one fold step each time a day bucket CLOSES (the first event
  * of a later day arrives), gap days folding in as zero counts exactly
  * like the batch operator's complete calendar grid, and the closing
  * day's count is judged against the level the PRIOR days predicted with
  * the same 3·√(level+1) Poisson-ish gate.
  *
  * Bit-parity with the batch fold under TWO preconditions: per-key
  * stream order (the [[StreamRateAnomaly]] discipline), and EVERY KEY
  * ACTIVE ON THE CORPUS'S FIRST CALENDAR DAY. The seeds differ otherwise:
  * this stream seeds at each key's own first observed day, while the
  * batch fold's complete calendar grid starts every key at the
  * corpus-wide first day and folds the leading days as zero counts — a
  * key idle on day 0 diverges by those leading (1−α) factors. (Callers
  * needing batch parity for late-starting keys should fold leading zero
  * days from a stream epoch before feeding events.) Given the
  * preconditions — which the parity spec asserts — the level after days
  * 0..t equals the batch `aggregate` fold over the day-count prefix:
  * same seed, same α/1−α doubles, same IEEE op order (gap days apply the
  * SAME fold step with c = 0, in day order). The still-open last day is
  * unjudged until a flush sentinel closes it.
  *
  * Scale: state is (open day, open count, level, seeded?) per key —
  * O(keys) regardless of stream length; no event or day history.
  */
object StreamEwma {

  final case class Event(key: String, tsMs: Long)
  /** open day accumulator + the EWMA level over CLOSED days (NaN-free:
    * `seeded` is false until the first day closes)
    */
  final case class EwmaState(day: Long, count: Long, level: Double, seeded: Boolean)
  final case class Alert(key: String, dayMs: Long, n: Long, levelPrev: Double,
      resid: Double)

  private val DayMs = 86400000L

  /** `gateMult` scales the 3·√(level+1) gate; 0 emits EVERY closed day's
    * readout (the parity-spec mode — alerts and readouts share one code
    * path, so the spec exercises exactly what production emits).
    */
  def anomalies(
      events: Dataset[Event],
      alpha: Double = 0.3,
      gateMult: Double = 3.0
  ): Dataset[Alert] = {
    require(alpha > 0 && alpha < 1, "StreamEwma: alpha in (0,1)")
    import events.sparkSession.implicits._
    val a = alpha
    val b = 1 - alpha
    events
      .groupByKey(_.key)
      .transformWithState(new FoldProcessor[String, Event, EwmaState, Alert]("ewma",
        (key: String, rows: Seq[Event], prev: Option[EwmaState]) => {
          val sorted = rows.sortBy(_.tsMs)
          val out = scala.collection.mutable.ListBuffer[Alert]()
          var cur = prev

          // close the open day: judge it against the pre-close level, then
          // fold it (and any gap days before the next) into the level
          def close(st: EwmaState, nextDay: Long): EwmaState = {
            if (st.seeded) {
              val resid = st.count.toDouble - st.level
              if (math.abs(resid) > gateMult * math.sqrt(st.level + 1.0))
                out += Alert(key, st.day * DayMs, st.count,
                  rnd6(st.level), rnd6(resid))
            }
            var level =
              if (!st.seeded) st.count.toDouble // first closed day seeds
              else a * st.count.toDouble + b * st.level
            var d = st.day + 1
            while (d < nextDay) { level = a * 0.0 + b * level; d += 1 }
            EwmaState(nextDay, 0L, level, seeded = true)
          }

          sorted.foreach { e =>
            val day = Math.floorDiv(e.tsMs, DayMs)
            cur match {
              case None => cur = Some(EwmaState(day, 1L, 0.0, seeded = false))
              case Some(st) if day == st.day =>
                cur = Some(st.copy(count = st.count + 1))
              case Some(st) =>
                cur = Some(close(st, day).copy(count = 1L))
            }
          }
          (cur, out.toSeq)
        })(Encoders.product[EwmaState]),
        TimeMode.None(), OutputMode.Append())
  }

  private def rnd6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
