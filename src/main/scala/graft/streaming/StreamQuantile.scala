package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming quantile monitor — the online twin of
  * [[graft.operators.Sketch.logHistQuantiles]] (the `hist_quantiles`
  * board query): per key, maintain the SAME two-significant-digit log
  * histogram the batch operator builds, and emit a (n, p50, p95, p99)
  * snapshot each trigger that touches the key.
  *
  * Bucket-for-bucket batch parity: the Scala fold reproduces the batch
  * Column arithmetic exactly — `floor(v·1000)` as a long, keep ≤2-digit
  * strings whole, else first-two-digits right-padded with zeros — and the
  * quantile read is the same ⌈q·n⌉ cumulative-rank rule, so the LAST
  * snapshot per key is bit-equal to the batch operator over the same rows
  * (order-insensitive by construction: a histogram is a commutative fold,
  * the one shape that needs NO stream-order assumption).
  *
  * Scale: state per key is the bucket map — ≤ 90 buckets per decade of
  * value range regardless of row count (the log-bucket property), i.e.
  * O(keys · decades) total. Snapshots are append-mode rows; readers keep
  * the latest per key.
  */
object StreamQuantile {

  final case class Obs(key: String, value: Double)
  final case class QState(buckets: Map[Long, Long])
  /** Wire form for the state store (the Avro-converter map-key restriction
    * — see [[StreamPsi.PsiStateW]]): key-sorted parallel arrays. */
  final case class QStateW(ks: Seq[Long], vs: Seq[Long])
  private def wire(s: QState): QStateW = {
    val b = s.buckets.toSeq.sortBy(_._1)
    QStateW(b.map(_._1), b.map(_._2))
  }
  private def unwire(w: QStateW): QState = QState(w.ks.zip(w.vs).toMap)
  final case class Snapshot(key: String, n: Long, p50: Double, p95: Double, p99: Double)

  /** the batch operator's exact bucket arithmetic, scalar form */
  private[streaming] def bucketOf(v: Double): Long = {
    val s = math.floor(v * 1000.0).toLong.toString
    if (s.length <= 2) s.toLong
    else (s.take(2) + "0" * (s.length - 2)).toLong
  }

  private def quantile(sorted: Seq[(Long, Long)], n: Long, q: Double): Double = {
    val rank = math.ceil(q * n).toLong
    var cum = 0L
    sorted.find { case (_, c) => cum += c; cum >= rank }
      .map(_._1.toDouble / 1000.0)
      .getOrElse(sorted.last._1.toDouble / 1000.0)
  }

  def snapshots(obs: Dataset[Obs]): Dataset[Snapshot] = {
    import obs.sparkSession.implicits._
    obs
      .filter(_.value > 0) // the batch operator's valueCol > 0 gate
      .groupByKey(_.key)
      .transformWithState(new FoldProcessor[String, Obs, QStateW, Snapshot]("quantile",
        (key: String, rows: Seq[Obs], prev: Option[QStateW]) => {
          var b = prev.map(w => unwire(w).buckets).getOrElse(Map.empty[Long, Long])
          var added = 0L
          rows.foreach { o =>
            val lb = bucketOf(o.value)
            b = b.updated(lb, b.getOrElse(lb, 0L) + 1L)
            added += 1L
          }
          if (added == 0) (prev, Seq.empty)
          else {
            val sorted = b.toSeq.sortBy(_._1)
            val n = b.valuesIterator.sum
            (Some(wire(QState(b))), Seq(Snapshot(key, n,
              quantile(sorted, n, 0.5),
              quantile(sorted, n, 0.95),
              quantile(sorted, n, 0.99))))
          }
        })(Encoders.product[QStateW]),
        TimeMode.None(), OutputMode.Append())
  }
}
