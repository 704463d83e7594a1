package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Running per-key distinct-count monitor on the Spark 4 `transformWithState`
  * API (`StatefulProcessor` + typed `ValueState`): each key keeps a KMV
  * sketch — the k smallest md5 hash values seen — and emits an updated
  * distinct estimate every micro-batch. The cardinality-drift monitor for a
  * continuous ingest feed ("vocabulary of source X is exploding / an id
  * column stopped being unique"), in O(k) state per key FOREVER, no matter
  * how many events stream through.
  *
  * The estimator is bit-identical to the batch sketch
  * ([[graft.operators.Sketch.kmvDistinctTokens]]): hash = first 15 md5 hex
  * chars over 2^60, estimate = (k−1)/v_k, exact count while the sketch
  * holds fewer than k distinct hashes — so stream estimates reconcile
  * against batch recomputation EXACTLY (the spec pins it), which HLL-based
  * monitors cannot offer.
  *
  * transformWithState requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass =
  * ...state.RocksDBStateStoreProvider`); the caller sets it before
  * starting the query.
  */
object StreamKmv {

  /** 2^60 — mirrors Sketch.Domain. */
  private val Domain = math.pow(2, 60)

  // public: generated encoders/deserializers can't reach object-private
  // classes (the StreamNearDup Janino gotcha)
  final case class KmvState(mins: List[String], nSeen: Long)
  final case class Estimate(key: String, n_seen: Long, est_distinct: Double)

  final class Processor(k: Int)
      extends StatefulProcessor[String, (String, String), Estimate] {
    @transient private var state: ValueState[KmvState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KmvState]("kmv",
        Encoders.product[KmvState], TTLConfig.NONE)

    private def md5Hex15(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val sb = new StringBuilder(30)
      var i = 0
      while (i < 8 && sb.length < 15) { // 8 bytes = 16 hex chars ≥ 15
        sb.append(f"${d(i) & 0xff}%02x"); i += 1
      }
      sb.substring(0, 15)
    }

    override def handleInputRows(key: String, rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[Estimate] = {
      val prev = if (state.exists()) state.get() else KmvState(Nil, 0L)
      var n = prev.nSeen
      val hashes = scala.collection.mutable.TreeSet.from(prev.mins)
      rows.foreach { case (_, item) =>
        n += 1
        hashes += md5Hex15(item)
        if (hashes.size > k) hashes -= hashes.last
      }
      val mins = hashes.toList // sorted ascending
      state.update(KmvState(mins, n))
      val est =
        if (mins.size < k) mins.size.toDouble
        else (k - 1).toDouble /
          (java.lang.Long.parseLong(mins.last, 16).toDouble / Domain)
      Iterator.single(Estimate(key, n, est))
    }
  }

  /** `events`: (key, item). Emits one refreshed estimate per key per
    * micro-batch in which the key received data.
    */
  def estimates(events: Dataset[(String, String)], k: Int): Dataset[Estimate] = {
    require(k >= 2, "StreamKmv: k >= 2")
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new Processor(k), TimeMode.None(), OutputMode.Append())
  }
}
