package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming._

/** Online Holt linear-trend smoothing of per-key daily counts — the
  * streaming counterpart of the batch [[graft.operators.Temporal.holtLinear]]
  * board query: the same (level, trend) recurrence
  *   ŷ = l + b;  l' = α·c + (1−α)·ŷ;  b' = β·(l' − l) + (1−β)·b
  * run as days CLOSE on an open stream, emitting one forecast snapshot per
  * closed day from the key's third day on. Day buckets close when a later
  * day's first event arrives (the [[StreamCusum]] discipline); silent gap
  * days between two active days fold as explicit zero-count days.
  *
  * Batch parity: the fold is a pure function of the per-key day sequence,
  * shared verbatim with [[batchSnapshots]]; the parity spec asserts
  * bit-equal snapshots across arbitrary micro-batch splits. Against the
  * BOARD query the final snapshot matches `holt_linear`'s (level, trend)
  * exactly when the key is active on the corpus's first calendar day and
  * the stream is flushed one day past its last (the [[StreamEwma]]
  * precondition — the batch grid densifies from the CORPUS-wide day 0,
  * the stream can only see the key's own span).
  *
  * Scale: state is SEVEN scalars per key — no day history — and the
  * stream shuffles once by key.
  */
object StreamHolt {

  final case class Event(key: String, tsMs: Long)
  final case class HoltState(openDay: Long, openCount: Long, closedDays: Long,
      y1: Double, l: Double, b: Double, sse: Double)
  final case class Snapshot(key: String, dayMs: Long, count: Long,
      level: Double, trend: Double, forecast1: Double, sse: Double)

  private val MsPerDay = 86400000L

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fold ONE closed day into the Holt state. Two-point init (l₂ = y₂,
    * b₂ = y₂ − y₁ — identical to the batch operator); snapshots emit from
    * the day the state first exists. Pure, shared stream/batch.
    */
  private def closeDay(st: HoltState, d: Long, c: Long,
      alpha: Double, beta: Double,
      emit: Snapshot => Unit, key: String): HoltState = {
    val y = c.toDouble
    if (st.closedDays == 0L) st.copy(closedDays = 1L, y1 = y)
    else if (st.closedDays == 1L) {
      val (l, b) = (y, y - st.y1)
      emit(Snapshot(key, d * MsPerDay, c, round6(l), round6(b),
        round6(l + b), 0.0))
      st.copy(closedDays = 2L, l = l, b = b, sse = 0.0)
    } else {
      val pred = st.l + st.b
      val e = y - pred
      val lNew = alpha * y + (1 - alpha) * pred
      val bNew = beta * (lNew - st.l) + (1 - beta) * st.b
      val sse = st.sse + e * e
      emit(Snapshot(key, d * MsPerDay, c, round6(lNew), round6(bNew),
        round6(lNew + bNew), round6(sse)))
      st.copy(closedDays = st.closedDays + 1L, l = lNew, b = bNew, sse = sse)
    }
  }

  private def foldEvents(key: String, events: Seq[Event], st0: Option[HoltState],
      alpha: Double, beta: Double, emit: Snapshot => Unit): Option[HoltState] = {
    var cur = st0
    events.foreach { e =>
      val d = Math.floorDiv(e.tsMs, MsPerDay)
      cur match {
        case None => cur = Some(HoltState(d, 1L, 0L, 0.0, 0.0, 0.0, 0.0))
        case Some(st) if d == st.openDay =>
          cur = Some(st.copy(openCount = st.openCount + 1))
        case Some(st) if d > st.openDay =>
          var s = closeDay(st, st.openDay, st.openCount, alpha, beta, emit, key)
          var gap = st.openDay + 1
          while (gap < d) {
            s = closeDay(s, gap, 0L, alpha, beta, emit, key)
            gap += 1
          }
          cur = Some(s.copy(openDay = d, openCount = 1L))
        case Some(_) => () // late event before the open day: out of contract
      }
    }
    cur
  }

  /** Streaming snapshots. A flush `Event` one day past the stream's end
    * closes the final open day.
    */
  def snapshots(events: Dataset[Event], alpha: Double = 0.3,
      beta: Double = 0.2): Dataset[Snapshot] = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1, "StreamHolt: bad smoothing")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(new FoldProcessor[String, Event, HoltState, Snapshot]("holt",
        (key: String, rows: Seq[Event], prev: Option[HoltState]) => {
          val out = scala.collection.mutable.ListBuffer[Snapshot]()
          val next = foldEvents(key, rows.sortBy(_.tsMs), prev,
            alpha, beta, out += _)
          (next, out.toSeq)
        })(Encoders.product[HoltState]),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin: the SAME fold over a static frame; end-of-data closes the
    * final open day (flush semantics).
    */
  def batchSnapshots(df: DataFrame, keyCol: String, tsCol: String,
      alpha: Double = 0.3, beta: Double = 0.2): Dataset[Snapshot] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        org.apache.spark.sql.functions.unix_millis(col(tsCol)).as("tsMs"))
      .as[Event]
      .groupByKey(_.key)
      .flatMapGroups { (key: String, rows: Iterator[Event]) =>
        val out = scala.collection.mutable.ListBuffer[Snapshot]()
        val st = foldEvents(key, rows.toSeq.sortBy(_.tsMs), None,
          alpha, beta, out += _)
        st.foreach(s => closeDay(s, s.openDay, s.openCount, alpha, beta,
          out += _, key))
        out.iterator
      }
  }
}
