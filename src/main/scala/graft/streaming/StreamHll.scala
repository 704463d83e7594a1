package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.operators.Sketch.{HllAlphaM2TwoPow, HllM, HllRankMax}

/** Running per-key HyperLogLog distinct monitor on `transformWithState` —
  * the fixed-width companion of [[StreamKmv]]: 32 integer registers per key
  * FOREVER (vs KMV's k strings), merged by per-bucket MAX, so state size is
  * independent of both stream length and k-choice, and two monitors'
  * states union by element-wise max (multi-ingest merge).
  *
  * Register construction and estimator are BIT-IDENTICAL to the batch
  * sketch ([[graft.operators.Sketch.hllDistinctTokens]]): h = first 15 md5
  * hex chars (60 bits), bucket = h & 31, rank = 56 − bitlength(h >> 5),
  * estimate = α·m²·2^56 / Σ 2^(56−reg) with the linear-counting branch for
  * small cardinalities — HLL registers don't care about duplicates, so the
  * batch side's distinct() prepass changes nothing and stream estimates
  * reconcile against batch recomputation EXACTLY (the spec pins registers
  * and estimates both).
  *
  * Requires the RocksDB state store provider, as all transformWithState
  * operators here do.
  */
object StreamHll {

  /** registers: HllM ints in bucket order; nSeen: rows folded. */
  final case class HllState(regs: List[Int], nSeen: Long)
  final case class Estimate(key: String, n_seen: Long, est_hll: Double,
      regs: List[Int])

  private[streaming] def fold(prev: HllState,
      rows: Iterator[(String, String)]): HllState = {
    val regs = prev.regs.toArray
    var n = prev.nSeen
    rows.foreach { case (_, item) =>
      n += 1
      val h = java.lang.Long.parseLong(StreamKmv.md5Hex15(item), 16)
      val bucket = (h & (HllM - 1)).toInt
      val w = h >>> 5
      val rank = HllRankMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > regs(bucket)) regs(bucket) = rank
    }
    HllState(regs.toList, n)
  }

  private[streaming] def estimate(regs: Seq[Int]): Double = {
    val sTotal = regs.map(r => 1L << (HllRankMax - r)).sum
    val zeros = regs.count(_ == 0)
    val raw = HllAlphaM2TwoPow / sTotal.toDouble
    if (raw <= 2.5 * HllM && zeros > 0)
      HllM.toDouble * math.log(HllM.toDouble / zeros)
    else raw
  }

  final class Processor
      extends StatefulProcessor[String, (String, String), Estimate] {
    @transient private var state: ValueState[HllState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HllState]("hll",
        Encoders.product[HllState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[Estimate] = {
      val prev = if (state.exists()) state.get()
        else HllState(List.fill(HllM)(0), 0L)
      val next = fold(prev, rows)
      state.update(next)
      Iterator.single(Estimate(key, next.nSeen, estimate(next.regs), next.regs))
    }
  }

  /** `events`: (key, item). One refreshed estimate per key per micro-batch
    * in which the key received data.
    */
  def estimates(events: Dataset[(String, String)]): Dataset[Estimate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
