package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming event-rate anomaly gate via transformWithState — the
  * online analogue of [[graft.operators.Temporal.rateAnomaly]] (the batch
  * `rate_anomaly` board query): per key, each time bucket is z-scored
  * against the key's trailing `lookback` OBSERVED buckets the moment the
  * bucket CLOSES (the first event of a later bucket arrives), so a spike
  * or drought alerts one bucket-width after it happens instead of at the
  * next batch recomputation.
  *
  * Semantics match the batch gate exactly under the per-key stream-order
  * assumption ([[StreamFunnel]]/[[Sessionize]] discipline): "trailing"
  * means observed buckets (a silent hour does not enter history — the
  * batch operator's documented choice), warm-up buckets with fewer than
  * `lookback` prior observations are never judged, and the z arithmetic
  * is the SAME closed form ((c−s1/n)/√((s2−s1²/n)/n), floor 1e-12,
  * round 4) over the same integer counts — bit-equal alerts.
  *
  * Scale: state is one open (bucket, count) pair plus `lookback` longs
  * per key — O(keys · lookback), hash-partitioned by key, no event
  * history. The still-open LAST bucket of a stream is intentionally
  * unjudged (its count is not final); a flush sentinel past the stream
  * end closes it, which is how the parity spec reconciles against the
  * batch gate's judge-every-observed-bucket semantics.
  */
object StreamRateAnomaly {

  final case class Event(key: String, tsMs: Long)
  /** open bucket accumulator + trailing closed-bucket counts (newest last) */
  final case class RateState(bucket: Long, count: Long, hist: List[Long])
  final case class Alert(key: String, bucketMs: Long, n: Long, z: Double)

  def anomalies(
      events: Dataset[Event],
      bucketSeconds: Long,
      lookback: Int,
      zThresh: Double
  ): Dataset[Alert] = {
    require(bucketSeconds > 0 && lookback > 1, "StreamRateAnomaly: bad params")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .transformWithState(new FoldProcessor[String, Event, RateState, Alert]("rate",
        (key: String, rows: Seq[Event], prev: Option[RateState]) => {
          val sorted = rows.sortBy(_.tsMs)
          val out = scala.collection.mutable.ListBuffer[Alert]()
          var cur = prev

          def judge(bucket: Long, c: Long, hist: List[Long]): Unit =
            if (hist.length == lookback) {
              val s1 = hist.sum.toDouble
              val s2 = hist.map(h => h * h).sum.toDouble
              val mean = s1 / lookback
              val variance = (s2 - s1 * s1 / lookback) / lookback
              val z = BigDecimal((c - mean) / math.sqrt(math.max(variance, 1e-12)))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              if (math.abs(z) > zThresh)
                out += Alert(key, bucket * bucketSeconds * 1000L, c, z)
            }

          sorted.foreach { e =>
            val b = Math.floorDiv(Math.floorDiv(e.tsMs, 1000L), bucketSeconds)
            cur match {
              case None => cur = Some(RateState(b, 1L, Nil))
              case Some(st) if b == st.bucket =>
                cur = Some(st.copy(count = st.count + 1))
              case Some(st) =>
                // bucket closed: judge it, then it joins the history
                judge(st.bucket, st.count, st.hist)
                val hist = (st.hist :+ st.count).takeRight(lookback)
                cur = Some(RateState(b, 1L, hist))
            }
          }
          (cur, out.toSeq)
        })(Encoders.product[RateState]),
        TimeMode.None(), OutputMode.Append())
  }
}
