package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming._

/** Adaptive Conformal Inference (Gibbs & Candès, NeurIPS 2021) — the
  * ONLINE form of the batch [[graft.operators.Conformal]] bands: per key,
  * each arriving value is judged against mean ± q̂(1−α_t) BEFORE being
  * folded into the state, and the miscoverage target adapts
  *   α_{t+1} = α_t + γ(α − err_t),  err_t = 1 if the value fell outside,
  * which provably attains long-run coverage 1−α under ARBITRARY
  * distribution shift — the guarantee split-conformal loses the moment
  * the stream drifts. The drift-proof quality band a streaming score gate
  * actually needs.
  *
  * State per key is BOUNDED: running (n, Σv) for the mean predictor, a
  * 64-bucket log₂ residual histogram (the [[StreamQuantile]] bounded-state
  * discipline — q̂ reads the bucket upper edge at rank ⌈(1−α_t)·n⌉), and
  * α_t itself. The fold is a pure function of the per-key
  * (tsMs, id)-ordered event sequence, shared verbatim with
  * [[batchDecisions]]; the parity spec pins bit-equal decision streams
  * across arbitrary micro-batch splits.
  */
object StreamAci {

  final case class Obs(key: String, tsMs: Long, id: Long, value: Double)
  final case class AciState(n: Long, sum: Double, alpha: Double,
      buckets: Map[Int, Long])
  /** Wire form for the state store (the Avro-converter map-key restriction
    * — see [[StreamPsi.PsiStateW]]): key-sorted parallel arrays. */
  final case class AciStateW(n: Long, sum: Double, alpha: Double,
      ks: Seq[Int], vs: Seq[Long])
  private def wire(s: AciState): AciStateW = {
    val b = s.buckets.toSeq.sortBy(_._1)
    AciStateW(s.n, s.sum, s.alpha, b.map(_._1), b.map(_._2))
  }
  private def unwire(w: AciStateW): AciState =
    AciState(w.n, w.sum, w.alpha, w.ks.zip(w.vs).toMap)
  final case class Decision(key: String, id: Long, value: Double,
      qhat: Double, covered: Boolean, alphaT: Double)

  private val MinExp = -20 // residuals below 2^-20 share the bottom bucket
  private val MaxExp = 43  // and above 2^43 the top — 64 buckets total

  private def bucketOf(r: Double): Int =
    if (r <= 0) MinExp
    else math.min(MaxExp, math.max(MinExp,
      math.ceil(math.log(r) / math.log(2.0)).toInt))

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** q̂ = upper edge (2^b) of the bucket holding rank ⌈(1−α)·n⌉ among the
    * stored residuals — deterministic, state-bounded, monotone in α. */
  private def qhatOf(st: AciState): Double = {
    val rank = math.max(1L, math.ceil((1.0 - st.alpha) * st.n).toLong)
    var seen = 0L
    var b = MinExp
    val sorted = st.buckets.toSeq.sortBy(_._1)
    val it = sorted.iterator
    var done = false
    while (it.hasNext && !done) {
      val (bk, c) = it.next()
      seen += c
      if (seen >= rank) { b = bk; done = true }
    }
    if (!done && sorted.nonEmpty) b = sorted.last._1
    math.pow(2.0, b)
  }

  /** Fold one in-order batch; every observation past `warmup` emits a
    * decision BEFORE updating the state (predict-then-update). */
  private def foldObs(key: String, obs: Seq[Obs], st0: Option[AciState],
      targetAlpha: Double, gamma: Double, warmup: Int,
      emit: Decision => Unit): Option[AciState] = {
    var st = st0.getOrElse(AciState(0L, 0.0, targetAlpha, Map.empty))
    obs.foreach { o =>
      if (st.n >= warmup) {
        val mean = st.sum / st.n
        val q = qhatOf(st)
        val covered = math.abs(o.value - mean) <= q
        emit(Decision(key, o.id, o.value, round6(q), covered, round6(st.alpha)))
        val err = if (covered) 0.0 else 1.0
        val a = math.min(0.999, math.max(0.001,
          st.alpha + gamma * (targetAlpha - err)))
        st = st.copy(alpha = a)
      }
      val mean0 = if (st.n > 0) st.sum / st.n else o.value
      val b = bucketOf(math.abs(o.value - mean0))
      st = AciState(st.n + 1, st.sum + o.value, st.alpha,
        st.buckets.updated(b, st.buckets.getOrElse(b, 0L) + 1L))
    }
    Some(st)
  }

  /** Streaming per-observation interval decisions. */
  def decisions(obs: Dataset[Obs], targetAlpha: Double = 0.1,
      gamma: Double = 0.05, warmup: Int = 20): Dataset[Decision] = {
    require(targetAlpha > 0 && targetAlpha < 1 && gamma > 0, "StreamAci: bad params")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .transformWithState(new FoldProcessor[String, Obs, AciStateW, Decision]("aci",
        (key: String, rows: Seq[Obs], prev: Option[AciStateW]) => {
          val out = scala.collection.mutable.ListBuffer[Decision]()
          val next = foldObs(key, rows.sortBy(o => (o.tsMs, o.id)),
            prev.map(unwire), targetAlpha, gamma, warmup, out += _)
          (next.map(wire), out.toSeq)
        })(Encoders.product[AciStateW]),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin: the SAME fold over a static frame. */
  def batchDecisions(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, targetAlpha: Double = 0.1,
      gamma: Double = 0.05, warmup: Int = 20): Dataset[Decision] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("key"),
        org.apache.spark.sql.functions.unix_millis(col(tsCol)).as("tsMs"),
        col(idCol).cast("long").as("id"),
        col(valCol).cast("double").as("value"))
      .as[Obs]
      .groupByKey(_.key)
      .flatMapGroups { (key: String, rows: Iterator[Obs]) =>
        val out = scala.collection.mutable.ListBuffer[Decision]()
        foldObs(key, rows.toSeq.sortBy(o => (o.tsMs, o.id)), None,
          targetAlpha, gamma, warmup, out += _)
        out.iterator
      }
  }
}
