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

  private[streaming] def md5Hex15(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(30)
    var i = 0
    while (i < 8 && sb.length < 15) { // 8 bytes = 16 hex chars ≥ 15
      sb.append(f"${d(i) & 0xff}%02x"); i += 1
    }
    sb.substring(0, 15)
  }

  /** Shared row-folding + estimator used by both processors. */
  private[streaming] def merge(key: String, prev: KmvState,
      rows: Iterator[(String, String)], k: Int): (KmvState, Estimate) = {
    var n = prev.nSeen
    val hashes = scala.collection.mutable.TreeSet.from(prev.mins)
    rows.foreach { case (_, item) =>
      n += 1
      hashes += md5Hex15(item)
      if (hashes.size > k) hashes -= hashes.last
    }
    val mins = hashes.toList // sorted ascending
    val est =
      if (mins.size < k) mins.size.toDouble
      else (k - 1).toDouble /
        (java.lang.Long.parseLong(mins.last, 16).toDouble / Domain)
    (KmvState(mins, n), Estimate(key, n, est))
  }

  final class Processor(k: Int)
      extends StatefulProcessor[String, (String, String), Estimate] {
    @transient private var state: ValueState[KmvState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KmvState]("kmv",
        Encoders.product[KmvState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[Estimate] = {
      val prev = if (state.exists()) state.get() else KmvState(Nil, 0L)
      val (next, out) = merge(key, prev, rows, k)
      state.update(next)
      Iterator.single(out)
    }
  }

  /** Bootstrap variant: state seeded from a BATCH-built sketch table before
    * the first micro-batch — the lambda-architecture handoff (recompute the
    * monitor's state offline once, then stream forward without replaying
    * history). Because KMV merge is associative, bootstrapped estimates are
    * bit-equal to having streamed the whole history.
    */
  final class InitProcessor(k: Int)
      extends StatefulProcessorWithInitialState[
        String, (String, String), Estimate, KmvState] {
    @transient private var state: ValueState[KmvState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KmvState]("kmv",
        Encoders.product[KmvState], TTLConfig.NONE)

    override def handleInitialState(key: String, initial: KmvState,
        timerValues: TimerValues): Unit =
      state.update(initial)

    override def handleInputRows(key: String, rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[Estimate] = {
      val prev = if (state.exists()) state.get() else KmvState(Nil, 0L)
      val (next, out) = merge(key, prev, rows, k)
      state.update(next)
      Iterator.single(out)
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

  /** Batch-built per-key sketch state (the SAME md5-prefix hash the stream
    * side computes — Spark's `md5` and the JVM digest agree byte-for-byte):
    * feed to [[estimatesBootstrapped]] to start a monitor from an offline
    * recomputation instead of replaying history.
    */
  def batchState(df: org.apache.spark.sql.DataFrame, keyCol: String,
      itemCol: String, k: Int): Dataset[(String, KmvState)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import df.sparkSession.implicits._
    val totals = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    val hashed = df
      .select(col(keyCol).as("key"),
        substring(md5(col(itemCol)), 1, 15).as("h"))
      .distinct()
    val w = Window.partitionBy("key").orderBy("h")
    hashed.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .groupBy("key").agg(sort_array(collect_list(col("h"))).as("mins"))
      .join(totals, "key")
      .select(col("key"), col("mins"), col("n"))
      .as[(String, Seq[String], Long)]
      .map { case (key, mins, n) => (key, KmvState(mins.toList, n)) }
  }

  /** [[estimates]] with state bootstrapped from [[batchState]]'s output. */
  def estimatesBootstrapped(events: Dataset[(String, String)],
      initial: Dataset[(String, KmvState)], k: Int): Dataset[Estimate] = {
    require(k >= 2, "StreamKmv: k >= 2")
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new InitProcessor(k), TimeMode.None(),
        OutputMode.Append(), initial.groupByKey(_._1).mapValues(_._2))
  }
}
