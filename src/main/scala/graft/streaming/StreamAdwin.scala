package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming._

/** Streaming drift detection via ADWIN adaptive windowing (Bifet &
  * Gavaldà, SDM 2007) on per-key DAILY counts. Where [[StreamCusum]]
  * needs a warm-up reference mean and a tuned slack/threshold pair, ADWIN
  * is parameter-light: it keeps a window of recent days and SHRINKS it
  * whenever some split point makes the two halves' means differ beyond
  * the Hoeffding/Bernstein bound ε_cut — so the window length itself
  * adapts to the drift rate, and the detector needs only the confidence
  * δ. An alert is the window-shrink event: distribution change confirmed,
  * stale history dropped.
  *
  * The window is NOT stored day-by-day: it is the exponential-histogram
  * bucket list from the paper — buckets hold (count, Σc, Σc²) for 2^level
  * days each, at most `maxBucketsPerLevel` per level before two merge
  * into the next level. State is O(log window) triples of integers per
  * key; the cut check walks the ≤ levels·M bucket list.
  *
  * Day buckets close when a later day's first event arrives; silent gap
  * days fold as explicit zeros; the final open day closes on the flush
  * sentinel — the [[StreamCusum]] calendar discipline, so the fold is a
  * pure function of the per-key event-day sequence, shared verbatim with
  * [[batchAlerts]], and alerts are bit-equal across arbitrary micro-batch
  * splits (pinned by the parity spec).
  */
object StreamAdwin {

  final case class Event(key: String, tsMs: Long)
  /** Exponential-histogram bucket: `n` days (a power of two), integer
    * day-count sums carried exactly. */
  final case class Bucket(n: Long, sum: Long, sumSq: Long)
  final case class AdwinState(openDay: Long, openCount: Long,
      buckets: Seq[Bucket])
  final case class Alert(key: String, dayMs: Long, nDropped: Long,
      nKept: Long, meanBefore: Double, meanAfter: Double)

  private val MsPerDay = 86400000L

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Merge-compress so no level holds more than `m` buckets. Buckets are
    * newest-first; levels are identified by bucket size. */
  private def compress(bs: List[Bucket], m: Int): List[Bucket] = {
    // walk from newest to oldest; when a run of equal-size buckets exceeds
    // m, merge the two OLDEST of that size into one of double size
    val grouped = bs.groupBy(_.n)
    if (grouped.values.forall(_.size <= m)) bs
    else {
      val lvl = grouped.filter(_._2.size > m).keys.min
      val idxs = bs.zipWithIndex.filter(_._1.n == lvl).map(_._2)
      val (o1, o2) = (idxs(idxs.size - 2), idxs.last) // two oldest at level
      val merged = Bucket(lvl * 2, bs(o1).sum + bs(o2).sum,
        bs(o1).sumSq + bs(o2).sumSq)
      val kept = bs.zipWithIndex.collect {
        case (b, i) if i != o1 && i != o2 => b
      }
      // merged bucket takes the older position (end of its new level run)
      val (before, after) = kept.splitAt(o2 - 1)
      compress(before ++ (merged :: after), m)
    }
  }

  /** ADWIN cut check: drop oldest buckets while some split's half-means
    * differ beyond the Bernstein-style bound. Returns (kept, dropped). */
  private def cut(bs: List[Bucket], delta: Double): (List[Bucket], List[Bucket]) = {
    var cur = bs
    var dropped = List.empty[Bucket]
    var changed = true
    while (changed && cur.size > 1) {
      changed = false
      val n = cur.map(_.n).sum.toDouble
      val sum = cur.map(_.sum).sum.toDouble
      val sumSq = cur.map(_.sumSq).sum.toDouble
      val variance = math.max(sumSq / n - (sum / n) * (sum / n), 0.0)
      val deltaP = delta / math.max(math.log(n), 1.0)
      // walk split points oldest-first: suffix = older part (to drop)
      var n1 = 0.0; var s1 = 0.0 // older half accumulators
      val oldestFirst = cur.reverse
      var cutAt = -1
      var i = 0
      while (i < oldestFirst.size - 1 && cutAt < 0) {
        val b = oldestFirst(i)
        n1 += b.n; s1 += b.sum
        val n0 = n - n1
        val m = 1.0 / (1.0 / n0 + 1.0 / n1)
        val eps = math.sqrt(2.0 / m * variance * math.log(2.0 / deltaP)) +
          2.0 / (3.0 * m) * math.log(2.0 / deltaP)
        if (math.abs((sum - s1) / n0 - s1 / n1) > eps) cutAt = i
        i += 1
      }
      if (cutAt >= 0) {
        // drop the oldest cutAt+1 buckets
        val keepCount = cur.size - (cutAt + 1)
        dropped = dropped ++ cur.drop(keepCount).reverse
        cur = cur.take(keepCount)
        changed = true
      }
    }
    (cur, dropped)
  }

  /** Fold ONE closed day into the window; emit an alert if the insert
    * triggers a cut. Pure, shared by stream and batch twin. */
  private def closeDay(st: AdwinState, c: Long, d: Long, m: Int,
      delta: Double, emit: Alert => Unit, key: String): Seq[Bucket] = {
    val inserted = Bucket(1L, c, c * c) :: st.buckets.toList
    val packed = compress(inserted, m)
    val before = packed
    val (kept, dropped) = cut(packed, delta)
    if (dropped.nonEmpty) {
      val nb = before.map(_.n).sum; val sb = before.map(_.sum).sum
      val nk = kept.map(_.n).sum; val sk = kept.map(_.sum).sum
      emit(Alert(key, d * MsPerDay, dropped.map(_.n).sum, nk,
        round4(sb.toDouble / nb), round4(sk.toDouble / nk)))
    }
    kept
  }

  private def foldEvents(key: String, events: Seq[Event],
      st0: Option[AdwinState], m: Int, delta: Double,
      emit: Alert => Unit): Option[AdwinState] = {
    var cur = st0
    events.foreach { e =>
      val d = Math.floorDiv(e.tsMs, MsPerDay)
      cur match {
        case None => cur = Some(AdwinState(d, 1L, Nil))
        case Some(st) if d == st.openDay =>
          cur = Some(st.copy(openCount = st.openCount + 1))
        case Some(st) if d > st.openDay =>
          var bs = closeDay(st, st.openCount, st.openDay, m, delta, emit, key)
          var gap = st.openDay + 1
          while (gap < d) {
            bs = closeDay(AdwinState(gap, 0L, bs), 0L, gap, m, delta, emit, key)
            gap += 1
          }
          cur = Some(AdwinState(d, 1L, bs))
        case Some(_) => () // late event before the open day: out of contract
      }
    }
    cur
  }

  /** Streaming alerts; a flush Event beyond the stream's end closes the
    * final open day. */
  def alerts(events: Dataset[Event], maxBucketsPerLevel: Int = 5,
      delta: Double = 0.002): Dataset[Alert] = {
    require(maxBucketsPerLevel >= 2 && delta > 0 && delta < 1,
      "StreamAdwin: bad params")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(new FoldProcessor[String, Event, AdwinState, Alert]("adwin",
        (key: String, rows: Seq[Event], prev: Option[AdwinState]) => {
          val out = scala.collection.mutable.ListBuffer[Alert]()
          val next = foldEvents(key, rows.sortBy(_.tsMs),
            prev, maxBucketsPerLevel, delta, out += _)
          (next, out.toSeq)
        })(Encoders.product[AdwinState]),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin: the SAME fold over a static (keyCol, tsCol) frame; the
    * last day of each key closes at end-of-data like a flushed stream. */
  def batchAlerts(df: DataFrame, keyCol: String, tsCol: String,
      maxBucketsPerLevel: Int = 5, delta: Double = 0.002): Dataset[Alert] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").cast("long").as("tsSec"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val evs = rows.map { case (_, s) => Event(key, s * 1000L) }
          .toSeq.sortBy(_.tsMs)
        val out = scala.collection.mutable.ListBuffer[Alert]()
        val endSt = foldEvents(key, evs, None, maxBucketsPerLevel, delta,
          out += _)
        endSt.foreach { st =>
          closeDay(st, st.openCount, st.openDay, maxBucketsPerLevel, delta,
            out += _, key)
        }
        out.iterator
      }
  }
}
