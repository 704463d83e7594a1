package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Online experiment dashboard: one stateful stream per experiment key
  * maintaining the (n_a, c_a, n_b, c_b) user 2×2 and emitting, at every
  * micro-batch close, the three readouts a live experiment page shows:
  *
  *   - SRM χ² (assignment integrity — [[graft.operators.EventSeq.srmCheck]]),
  *   - Beta-Binomial P(A beats B) via the A&S erf polynomial
  *     ([[graft.operators.EventSeq.bayesAb]]'s arithmetic, verbatim),
  *   - the always-valid mSPRT Λ and p
  *     ([[graft.operators.EventSeq.msprtAb]]'s supermartingale — the ONE
  *     readout that stays valid under this exact
  *     look-at-every-micro-batch usage; that is the point of wiring it
  *     into a stream).
  *
  * Input contract: ONE record per (experiment, user) carrying the final
  * arm and conversion verdict — the shape an upstream first-arrival
  * dedup ([[StreamDedup]]) or sessionizer emits. Under that contract the
  * state fold is COMMUTATIVE (four counters), so the dashboard's final
  * snapshot is bit-equal to the batch operators over the same records
  * regardless of arrival order or micro-batch split (pinned by the
  * parity spec). State: four longs per experiment.
  */
object StreamExperiment {

  final case class UserRecord(experiment: String, arm: Int, converted: Boolean)
  final case class Counts(nA: Long, cA: Long, nB: Long, cB: Long)
  final case class Snapshot(experiment: String, nA: Long, cA: Long,
      nB: Long, cB: Long, srmChi2: Double, srmDetected: Boolean,
      pABeatsB: Double, lambda: Double, pAlwaysValid: Double,
      significant: Boolean)

  private def round(v: Double, s: Int): Double =
    BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Φ via Abramowitz & Stegun 7.1.26 — the same polynomial (and
    * operation order) as the batch bayesAb Column expression. */
  private def phi(z: Double): Double = {
    val x = math.abs(z) / math.sqrt(2.0)
    val t = 1.0 / (1.0 + 0.3275911 * x)
    val poly = 0.254829592 * t - 0.284496736 * t * t +
      1.421413741 * t * t * t - 1.453152027 * t * t * t * t +
      1.061405429 * t * t * t * t * t
    val erf = 1.0 - poly * math.exp(-(x * x))
    if (z >= 0) 0.5 * (1.0 + erf) else 0.5 * (1.0 - erf)
  }

  /** Pure snapshot formulas shared by the stream and the parity spec's
    * direct evaluation. */
  def snapshotOf(key: String, s: Counts, tauSq: Double): Snapshot = {
    val n = (s.nA + s.nB).toDouble
    val srm = if (n > 0) (s.nA - s.nB).toDouble * (s.nA - s.nB) / n else 0.0
    // Beta-Binomial posterior normal approximation
    val ma = (s.cA + 1.0) / (s.nA + 2.0)
    val mb = (s.cB + 1.0) / (s.nB + 2.0)
    val va = ma * (1.0 - ma) / (s.nA + 3.0)
    val vb = mb * (1.0 - mb) / (s.nB + 3.0)
    val pAB = phi((ma - mb) / math.sqrt(va + vb))
    // mSPRT on raw rates (the batch msprtAb shape)
    val (pa, pb) = (if (s.nA > 0) s.cA.toDouble / s.nA else 0.0,
      if (s.nB > 0) s.cB.toDouble / s.nB else 0.0)
    val theta = pb - pa
    val seSq = math.max(
      (if (s.nA > 0) pa * (1 - pa) / s.nA else 0.0) +
        (if (s.nB > 0) pb * (1 - pb) / s.nB else 0.0), 1e-12)
    // a degenerate 2x2 (e.g. one user per arm, 0% vs 100%) drives seSq to
    // the 1e-12 floor and the exponent past double range — exp overflows to
    // Infinity, and BigDecimal(Infinity) in round() throws (found by
    // StateTtlSpec's restart snapshot). Saturate: evidence beyond double
    // range IS maximal significance; finite inputs are untouched, so the
    // stream ≡ batch parity arithmetic is unchanged where both are defined.
    val lamRaw = math.sqrt(seSq / (seSq + tauSq)) *
      math.exp(theta * theta * tauSq / (2.0 * seSq * (seSq + tauSq)))
    val lam = if (java.lang.Double.isFinite(lamRaw)) lamRaw else Double.MaxValue
    val pav = math.min(1.0 / lam, 1.0)
    Snapshot(key, s.nA, s.cA, s.nB, s.cB,
      round(srm, 4), srm > 3.841,
      round(pAB, 6), round(lam, 6), round(pav, 6), pav < 0.05)
  }

  /** Streaming dashboard: a snapshot per experiment per micro-batch that
    * delivered records for it. `ttl` bounds the keyspace: an experiment
    * that stops receiving records for the duration is evicted from the
    * state store (its four longs restart from zero if it ever resumes) —
    * the retirement policy for abandoned experiment keys; None keeps state
    * for the life of the query (the pre-round-10 behavior).
    */
  def snapshots(records: Dataset[UserRecord],
      tauSq: Double = 0.01,
      ttl: Option[java.time.Duration] = None): Dataset[Snapshot] = {
    import records.sparkSession.implicits._
    records
      .groupByKey(_.experiment)
      .transformWithState(new FoldProcessor[String, UserRecord, Counts, Snapshot]("exp",
        (key: String, rows: Seq[UserRecord], prev: Option[Counts]) => {
          var s = prev.getOrElse(Counts(0L, 0L, 0L, 0L))
          rows.foreach { r =>
            s =
              if (r.arm == 0)
                s.copy(nA = s.nA + 1, cA = s.cA + (if (r.converted) 1 else 0))
              else
                s.copy(nB = s.nB + 1, cB = s.cB + (if (r.converted) 1 else 0))
          }
          (Some(s), Seq(snapshotOf(key, s, tauSq)))
        },
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))(Encoders.product[Counts]),
        ttl.map(_ => TimeMode.ProcessingTime()).getOrElse(TimeMode.None()),
        OutputMode.Append())
  }
}
