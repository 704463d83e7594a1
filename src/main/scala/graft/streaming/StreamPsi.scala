package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming._

/** Online Population-Stability-Index drift monitor — the streaming twin of
  * the batch `psi_drift` board query: per key, the first `refCount` values
  * freeze a REFERENCE log₂ histogram; every subsequent `windowCount`
  * values close a window and emit PSI(window ‖ reference)
  *   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)   (ε-smoothed),
  * the industry-standard "did the live feature distribution walk away from
  * the one we validated on" score (PSI > 0.2 = act). Unlike
  * [[StreamCusum]] (mean shifts) and [[StreamAci]] (per-point intervals),
  * PSI sees SHAPE changes that keep the mean — bimodality, variance
  * collapse, truncation.
  *
  * State per key is bounded: two 64-bucket histograms + counters. The fold
  * is a pure function of the per-key (tsMs, id)-ordered sequence, shared
  * verbatim with [[batchWindows]]; the parity spec pins bit-equal window
  * streams across arbitrary micro-batch splits. Values bucket by
  * sign-aware log₂ magnitude (negatives share the bottom bucket region
  * via offset), matching what a production monitor does for wide-range
  * positive metrics.
  */
object StreamPsi {

  final case class Obs(key: String, tsMs: Long, id: Long, value: Double)
  final case class PsiState(refDone: Boolean, nRef: Long,
      ref: Map[Int, Long], nCur: Long, cur: Map[Int, Long], windowIdx: Long)
  /** Wire form for the state store: transformWithState state schemas go
    * through the Avro converter, which rejects non-string-key maps — the
    * histograms ride as key-sorted parallel arrays instead. */
  final case class PsiStateW(refDone: Boolean, nRef: Long, refK: Seq[Int],
      refV: Seq[Long], nCur: Long, curK: Seq[Int], curV: Seq[Long], windowIdx: Long)
  private def wire(s: PsiState): PsiStateW = {
    val r = s.ref.toSeq.sortBy(_._1)
    val c = s.cur.toSeq.sortBy(_._1)
    PsiStateW(s.refDone, s.nRef, r.map(_._1), r.map(_._2),
      s.nCur, c.map(_._1), c.map(_._2), s.windowIdx)
  }
  private def unwire(w: PsiStateW): PsiState =
    PsiState(w.refDone, w.nRef, w.refK.zip(w.refV).toMap,
      w.nCur, w.curK.zip(w.curV).toMap, w.windowIdx)
  final case class WindowPsi(key: String, windowIdx: Long, n: Long,
      psi: Double, drifted: Boolean)

  private val MinExp = -20
  private val MaxExp = 42

  /** sign-aware log₂ bucket: 0 maps to MinExp; negatives mirror into an
    * offset band so sign flips register as shape change. */
  private def bucketOf(v: Double): Int = {
    val a = math.abs(v)
    val b = if (a <= 0) MinExp
      else math.min(MaxExp, math.max(MinExp,
        math.ceil(math.log(a) / math.log(2.0)).toInt))
    if (v < 0) b + 100 else b
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def psiOf(ref: Map[Int, Long], nRef: Long,
      cur: Map[Int, Long], nCur: Long): Double = {
    val eps = 1e-6
    val keys = (ref.keySet ++ cur.keySet).toSeq.sorted
    var s = 0.0
    keys.foreach { b =>
      val q = ref.getOrElse(b, 0L).toDouble / nRef + eps
      val p = cur.getOrElse(b, 0L).toDouble / nCur + eps
      s += (p - q) * math.log(p / q)
    }
    s
  }

  private def foldObs(key: String, obs: Seq[Obs], st0: Option[PsiState],
      refCount: Int, windowCount: Int, threshold: Double,
      emit: WindowPsi => Unit): Option[PsiState] = {
    var st = st0.getOrElse(PsiState(refDone = false, 0L, Map.empty, 0L, Map.empty, 0L))
    obs.foreach { o =>
      val b = bucketOf(o.value)
      if (!st.refDone) {
        st = st.copy(nRef = st.nRef + 1,
          ref = st.ref.updated(b, st.ref.getOrElse(b, 0L) + 1L))
        if (st.nRef >= refCount) st = st.copy(refDone = true)
      } else {
        st = st.copy(nCur = st.nCur + 1,
          cur = st.cur.updated(b, st.cur.getOrElse(b, 0L) + 1L))
        if (st.nCur >= windowCount) {
          val psi = round6(psiOf(st.ref, st.nRef, st.cur, st.nCur))
          emit(WindowPsi(key, st.windowIdx, st.nCur, psi, psi > threshold))
          st = st.copy(nCur = 0L, cur = Map.empty, windowIdx = st.windowIdx + 1)
        }
      }
    }
    Some(st)
  }

  /** Streaming per-window PSI scores. */
  def windows(obs: Dataset[Obs], refCount: Int = 100, windowCount: Int = 50,
      threshold: Double = 0.2): Dataset[WindowPsi] = {
    require(refCount > 0 && windowCount > 0, "StreamPsi: bad params")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .transformWithState(new FoldProcessor[String, Obs, PsiStateW, WindowPsi]("psi",
        (key: String, rows: Seq[Obs], prev: Option[PsiStateW]) => {
          val out = scala.collection.mutable.ListBuffer[WindowPsi]()
          val next = foldObs(key, rows.sortBy(o => (o.tsMs, o.id)),
            prev.map(unwire), refCount, windowCount, threshold, out += _)
          (next.map(wire), out.toSeq)
        })(Encoders.product[PsiStateW]),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin: the SAME fold over a static frame. */
  def batchWindows(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, refCount: Int = 100,
      windowCount: Int = 50, threshold: Double = 0.2): Dataset[WindowPsi] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        org.apache.spark.sql.functions.unix_millis(col(tsCol)).as("tsMs"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .as[Obs]
      .groupByKey(_.key)
      .flatMapGroups { (key: String, rows: Iterator[Obs]) =>
        val out = scala.collection.mutable.ListBuffer[WindowPsi]()
        foldObs(key, rows.toSeq.sortBy(o => (o.tsMs, o.id)), None,
          refCount, windowCount, threshold, out += _)
        out.iterator
      }
  }
}
