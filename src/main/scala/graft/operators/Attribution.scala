package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Marketing-style attribution over the event stream: which touch gets
  * credit for a conversion. Built ON the [[AsOfJoin]] union+window plan —
  * attribution IS an as-of join (latest touch at-or-before the conversion)
  * plus a lookback gate, so the one-keyed-shuffle cost model carries over
  * unchanged; no range join, no per-user sort beyond the as-of's own.
  */
object Attribution {

  /** Last-touch attribution: every `convType` event credits the same user's
    * most recent OTHER event within `lookbackSec`; conversions with no
    * in-window touch credit the "direct" channel. Returns per-channel
    * conversion counts and share.
    *
    * Tie-breaks are total: touches tied on (user, ts) resolve to the max
    * `idCol` (the as-of's own convention), so the credit assignment — and
    * the aggregate — is deterministic.
    */
  def lastTouch(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, convType: String,
      lookbackSec: Long): DataFrame = {
    val conv = df.where(col(typeCol) === convType)
      .select(col(userCol), col(tsCol), col(idCol).as("conv_id"))
    val touch = df.where(col(typeCol) =!= convType)
      .select(col(userCol), col(tsCol), col(typeCol).as("touch_type"),
        col(idCol).as("touch_id"), unix_millis(col(tsCol)).as("touch_ms"))
    val joined = AsOfJoin.leftAsOf(conv, touch, userCol, tsCol,
      Seq("touch_type", "touch_id", "touch_ms"), "touch_id")
    val channel = when(
      col("right_touch_ms").isNotNull &&
        unix_millis(col(tsCol)) - col("right_touch_ms") <= lookbackSec * 1000L,
      col("right_touch_type")).otherwise("direct")
    val perChannel = joined
      .select(channel.as("channel"))
      .groupBy("channel").agg(count(lit(1)).as("n_conv"))
    // share over the ≤|types|+1-row channel relation — the window is bounded
    val wAll = Window.partitionBy()
    perChannel
      .select(col("channel"), col("n_conv"),
        round(col("n_conv").cast("double") /
          sum("n_conv").over(wAll).cast("double"), 4).as("share"))
      .orderBy("channel")
  }

  /** Markov-chain attribution with REMOVAL EFFECTS (Anderl et al. 2014,
    * "Mapping the customer journey"): model each user's pre-conversion
    * event path as a first-order Markov chain over channel states with
    * absorbing CONV (conversion) and NULL (journey ended unconverted)
    * states, then credit each channel by how much the corpus conversion
    * probability DROPS when that channel is removed (its transitions
    * redirected to NULL) — the causal-flavored upgrade of [[lastTouch]]
    * (a channel that only ever appears mid-journey gets zero last-touch
    * credit but a real removal effect).
    *
    * Execution shape: the DISTRIBUTED work is path extraction (one lag/
    * lead window per user, truncated at the first conversion) and the
    * (from, to) transition count — a ≤(C+2)²-row relation. Absorption
    * probabilities then come from a FIXED-COUNT value iteration
    * p ← M·p over the bounded state space (driver-side, the k-means/BPE
    * bounded-state pattern), once for the base chain and once per removed
    * channel. The oracle replays the identical iterations as one
    * recursive CTE keyed by variant (the [[Pca.pcaProjectSql]] trick), so
    * the scores are hash-exact, not rows-only.
    *
    * Determinism: states are indexed in a FIXED order (START, channels in
    * the caller-given order, CONV, NULL); the matrix-vector product sums
    * in state order; transition probabilities divide once in double; both
    * engines chain identical IEEE ops. CONV/NULL are self-loop absorbing
    * rows, seed p₀ = e_CONV, so p_k(s) = P(absorbed in CONV within k
    * steps) — monotone convergent, iterations fixed at `iters`.
    */
  def markovRemoval(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, convType: String,
      channels: Seq[String], iters: Int = 100): DataFrame = {
    require(channels.nonEmpty && !channels.contains(convType),
      "markovRemoval: channels must be non-empty and exclude the conversion type")
    val spark = df.sparkSession
    // ---- distributed: per-user path -> (from, to) transition counts ----
    val st = when(col(typeCol) === convType, lit("CONV"))
      .otherwise(col(typeCol)).as("st")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val convBefore = sum(when(col("st") === "CONV", 1L).otherwise(0L))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val kept = df.select(col(userCol), col(tsCol), col(idCol), st)
      .withColumn("_mk_cb", coalesce(convBefore, lit(0L)))
      .where(col("_mk_cb") === 0L) // events up to and incl. the first CONV
    val wk = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val steps = kept
      .withColumn("_mk_rn", row_number().over(wk))
      .withColumn("_mk_next", lead(col("st"), 1).over(wk))
    val fromFirst = steps.where(col("_mk_rn") === 1)
      .select(lit("START").as("from"), col("st").as("to"))
    val mids = steps.where(col("_mk_next").isNotNull)
      .select(col("st").as("from"), col("_mk_next").as("to"))
    val tails = steps
      .where(col("_mk_next").isNull && col("st") =!= "CONV")
      .select(col("st").as("from"), lit("NULL").as("to"))
    val counts = fromFirst.unionByName(mids).unionByName(tails)
      .groupBy("from", "to").agg(count(lit(1)).as("n"))
      .collect() // bounded: ≤ (C+2)² rows
    // ---- driver: bounded-state value iteration, base + per-removal ----
    val states = ("START" +: channels) ++ Seq("CONV", "NULL")
    val idx = states.zipWithIndex.toMap
    val s = states.length
    val convI = idx("CONV"); val nullI = idx("NULL")
    val base = Array.ofDim[Double](s, s)
    val rowTot = Array.ofDim[Double](s)
    counts.foreach { r =>
      (idx.get(r.getString(0)), idx.get(r.getString(1))) match {
        case (Some(i), Some(j)) =>
          base(i)(j) += r.getLong(2).toDouble; rowTot(i) += r.getLong(2).toDouble
        case _ => () // types outside the declared channel set are ignored
      }
    }
    for (i <- 0 until s if rowTot(i) > 0; j <- 0 until s)
      base(i)(j) = base(i)(j) / rowTot(i)
    base(convI)(convI) = 1.0; base(nullI)(nullI) = 1.0
    def absorb(m: Array[Array[Double]]): Double = {
      var p = Array.tabulate(s)(i => if (i == convI) 1.0 else 0.0)
      for (_ <- 0 until iters)
        p = Array.tabulate(s) { i =>
          var acc = 0.0; var j = 0
          while (j < s) { acc += m(i)(j) * p(j); j += 1 }
          acc
        }
      p(idx("START"))
    }
    val pBase = absorb(base)
    def rnd6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val rows = channels.map { c =>
      val ci = idx(c)
      // removal: transitions INTO c go to NULL instead (row sums keep);
      // c's own row is unreachable and untouched
      val m = Array.tabulate(s, s) { (i, j) =>
        if (j == ci) 0.0
        else if (j == nullI) base(i)(nullI) + base(i)(ci)
        else base(i)(j)
      }
      m(convI)(convI) = 1.0; m(nullI)(nullI) = 1.0
      val pc = absorb(m)
      val eff = if (pBase > 0) (pBase - pc) / pBase else 0.0
      (c, rnd6(pBase), rnd6(pc), rnd6(eff))
    }
    import spark.implicits._
    rows.toDF("channel", "p_conv", "p_removed", "removal_effect")
      .orderBy("channel")
  }

  /** DuckDB mirror of [[markovRemoval]]: identical path/transition
    * extraction, then ONE recursive CTE carrying each variant's p-vector
    * (base + one per removed channel) through the same fixed-count value
    * iteration.
    */
  def markovRemovalSql(tbl: String, userCol: String, tsCol: String,
      typeCol: String, idCol: String, convType: String,
      channels: Seq[String], iters: Int = 100): String = {
    val states = ("START" +: channels) ++ Seq("CONV", "NULL")
    val s = states.length
    val stateIdx = states.zipWithIndex.map { case (n, i) => (n, i + 1) }.toMap
    val convI = stateIdx("CONV"); val nullI = stateIdx("NULL")
    val idxCase = states.map(n =>
      s"WHEN ${OracleSql.lit(n)} THEN ${stateIdx(n)}").mkString(" ")
    // variants: 0 = base, k = channel k removed (state index k+1)
    val variants = (0 +: channels.indices.map(_ + 2).toList)
      .map(v => s"($v)").mkString(", ")
    s"""WITH RECURSIVE ev AS (SELECT $userCol AS u, $tsCol AS ts, $idCol AS eid,
           CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 'CONV'
                ELSE $typeCol END AS st
         FROM $tbl),
       kept AS (SELECT * FROM (SELECT u, ts, eid, st,
           COALESCE(SUM(CASE WHEN st = 'CONV' THEN 1 ELSE 0 END)
             OVER (PARTITION BY u ORDER BY ts, eid
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM ev) WHERE cb = 0),
       steps AS (SELECT u, st,
           row_number() OVER (PARTITION BY u ORDER BY ts, eid) AS rn,
           lead(st) OVER (PARTITION BY u ORDER BY ts, eid) AS nxt
         FROM kept),
       trans AS (
         SELECT 'START' AS f, st AS t FROM steps WHERE rn = 1
         UNION ALL SELECT st, nxt FROM steps WHERE nxt IS NOT NULL
         UNION ALL SELECT st, 'NULL' FROM steps WHERE nxt IS NULL AND st <> 'CONV'),
       cnt AS (SELECT CASE f $idxCase END AS fi, CASE t $idxCase END AS ti,
           COUNT(*) AS n
         FROM trans
         WHERE (CASE f $idxCase END) IS NOT NULL
           AND (CASE t $idxCase END) IS NOT NULL
         GROUP BY 1, 2),
       tot AS (SELECT fi, SUM(n) AS tn FROM cnt GROUP BY fi),
       cells AS (SELECT a.i, b.j,
           COALESCE(CASE
             WHEN a.i = $convI THEN CASE WHEN b.j = $convI THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
             WHEN a.i = $nullI THEN CASE WHEN b.j = $nullI THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
             ELSE (SELECT CAST(n AS DOUBLE) / CAST(tn AS DOUBLE)
                   FROM cnt JOIN tot USING (fi)
                   WHERE fi = a.i AND ti = b.j) END, CAST(0 AS DOUBLE)) AS p
         FROM (SELECT CAST(x AS INT) AS i FROM range(1, ${s + 1}) r(x)) a
         CROSS JOIN (SELECT CAST(x AS INT) AS j FROM range(1, ${s + 1}) r(x)) b),
       vars(v) AS (SELECT CAST(x AS INT) FROM (VALUES $variants) t(x)),
       vcells AS (SELECT v, i, j,
           CASE WHEN i = $convI OR i = $nullI THEN p
                WHEN v = 0 THEN p
                WHEN j = v THEN CAST(0 AS DOUBLE)
                WHEN j = $nullI THEN p + (SELECT p FROM cells c2
                  WHERE c2.i = vcells0.i AND c2.j = vcells0.v)
                ELSE p END AS p
         FROM (SELECT v, i, j, p FROM vars CROSS JOIN cells) vcells0),
       mats AS (SELECT v, list(r ORDER BY i) AS mm FROM (
           SELECT v, i, list(p ORDER BY j) AS r FROM vcells GROUP BY v, i)
         GROUP BY v),
       it(k, v, p) AS (
         SELECT 0, v, list_transform(range(1, ${s + 1}),
             d -> CAST(CASE WHEN d = $convI THEN 1 ELSE 0 END AS DOUBLE))
           FROM vars
         UNION ALL
         SELECT k + 1, it.v,
           list_transform(range(1, ${s + 1}), i ->
             list_sum(list_transform(range(1, ${s + 1}), j -> mm[i][j] * it.p[j])))
         FROM it JOIN mats ON it.v = mats.v WHERE k < $iters),
       fin AS (SELECT v, p[1] AS pstart FROM it WHERE k = $iters),
       basep AS (SELECT pstart AS pb FROM fin WHERE v = 0)
       SELECT ch AS channel, round(pb, 6) AS p_conv,
         round(pstart, 6) AS p_removed,
         round(CASE WHEN pb > 0 THEN (pb - pstart) / pb ELSE 0 END, 6)
           AS removal_effect
       FROM fin JOIN (SELECT * FROM (VALUES ${channels.zipWithIndex
           .map { case (c, i) => s"(${OracleSql.lit(c)}, ${i + 2})" }
           .mkString(", ")}) t(ch, v)) chs USING (v)
       CROSS JOIN basep
       ORDER BY channel"""
  }

  /** DuckDB mirror of [[lastTouch]] — native ASOF LEFT JOIN over the
    * (user, ts)-deduped touch stream, same lookback gate and tie-break.
    */
  def lastTouchSql(tbl: String, userCol: String, tsCol: String,
      typeCol: String, idCol: String, convType: String,
      lookbackSec: Long): String =
    s"""WITH conv AS (SELECT $userCol, $tsCol, $idCol AS conv_id FROM $tbl
           WHERE $typeCol = '$convType'),
       t0 AS (SELECT $userCol, $tsCol, $typeCol AS touch_type,
                $idCol AS touch_id, epoch_ms($tsCol) AS touch_ms
              FROM $tbl WHERE $typeCol <> '$convType'),
       t AS (SELECT * FROM (
               SELECT t0.*, row_number() OVER (PARTITION BY $userCol, $tsCol
                 ORDER BY touch_id DESC) AS rn FROM t0) WHERE rn = 1),
       j AS (SELECT conv.conv_id, epoch_ms(conv.$tsCol) AS conv_ms,
               t.touch_type, t.touch_ms
             FROM conv ASOF LEFT JOIN t
               ON conv.$userCol = t.$userCol AND conv.$tsCol >= t.$tsCol),
       ch AS (SELECT CASE WHEN touch_ms IS NOT NULL
                AND conv_ms - touch_ms <= ${lookbackSec * 1000L}
                THEN touch_type ELSE 'direct' END AS channel FROM j),
       pc AS (SELECT channel, COUNT(*) AS n_conv FROM ch GROUP BY channel)
       SELECT channel, n_conv,
         round(CAST(n_conv AS DOUBLE) / CAST(SUM(n_conv) OVER () AS DOUBLE), 4)
           AS share
       FROM pc ORDER BY channel"""

  /** Exact Shapley-value attribution (Shapley 1953) over channel-exposure
    * coalitions: each channel's credit is its average marginal
    * contribution across ALL orderings —
    * φᵢ = Σ_{S∌i} |S|!(C−|S|−1)!/C! · (v(S∪i) − v(S)) — under the
    * MONOTONE coalition value v(S) = conversions of users whose exposure
    * set ⊆ S (the subset-sum / zeta transform of the observed-set
    * conversion counts). Monotonicity keeps every φᵢ ≥ 0 (the exact-set
    * valuation's zero-filled holes hand untouched channels NEGATIVE
    * credit — a method artifact, not a signal), and efficiency splits
    * exactly the explainable total: Σφᵢ = v(all) − v(∅) = conversions of
    * channel-touched users (spec-pinned). The axiomatic answer between
    * [[lastTouch]]'s recency bias and [[markovRemoval]]'s counterfactual.
    *
    * `nChannels` (the non-conversion type count, asserted at runtime)
    * fixes the 2^C mask grid and the factorial weight table as literals
    * in BOTH engines. Scale shape: one per-user bitmask agg; the zeta
    * transform and marginals live on the ≤4^C/2^C coalition grids —
    * type-table-bounded, never user-bounded.
    */
  def shapley(df: DataFrame, userCol: String, typeCol: String,
      convType: String, nChannels: Int): DataFrame = {
    require(nChannels >= 1 && nChannels <= 10, "shapley: bad channel count")
    val spark = df.sparkSession
    import spark.implicits._
    val channels = df.select(col(typeCol)).distinct()
      .collect().map(_.getString(0)).filter(_ != convType).sorted
    require(channels.length == nChannels,
      s"shapley: found ${channels.length} channels, declared $nChannels")
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val weights = (0 until nChannels).map(s =>
      fact(s) * fact(nChannels - 1 - s) / fact(nChannels))
    val bitOf = channels.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (ch, i)) => when(col(typeCol) === ch, lit(1L << i)).otherwise(acc)
    }
    val convU = df.groupBy(col(userCol).as("u"))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("conv"))
    val bits = df.where(col(typeCol) =!= convType)
      .select(col(userCol).as("u"), bitOf.as("bit")).distinct()
    val um = convU
      .join(bits.groupBy("u").agg(sum(col("bit")).as("m")), Seq("u"), "left")
      .select(col("u"), col("conv"), coalesce(col("m"), lit(0L)).as("m"))
    val vt = um.groupBy("m").agg(sum(col("conv")).as("c"))
    val s = spark.range(0L, 1L << nChannels).select(col("id").as("s"))
    // zeta transform: v(S) = Σ_{T ⊆ S} conv(T), via the (S ⊇ T) join of
    // two coalition-bounded relations — integer throughout
    val vcum = s.join(broadcast(vt),
        col("s").bitwiseAND(col("m")) === col("m"), "left")
      .groupBy("s").agg(sum(coalesce(col("c"), lit(0L))).as("v"))
    val chDf = channels.zipWithIndex.toSeq
      .map { case (ch, i) => (ch, 1L << i) }.toDF("channel", "bit")
    val wArr = array(weights.map(lit): _*)
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val pairs = s.crossJoin(broadcast(chDf))
      .where(col("s").bitwiseAND(col("bit")) === 0)
    val terms = pairs
      .join(broadcast(vcum.select(col("s"), col("v").as("v0"))), Seq("s"))
      .join(broadcast(vcum.select(col("s").as("s1"), col("v").as("v1"))),
        pairs("s") + col("bit") === col("s1"))
      .select(col("channel"),
        round(element_at(wArr, bit_count(col("s")).cast("int") + 1) *
          d(col("v1") - col("v0")), 9).cast("decimal(28,9)").as("t"))
    val touched = um.crossJoin(broadcast(chDf))
      .where(col("m").bitwiseAND(col("bit")) =!= 0)
      .groupBy("channel").agg(count(lit(1)).as("n_users"))
    terms.groupBy("channel").agg(sum(col("t")).as("phi"))
      .join(broadcast(touched), Seq("channel"), "left")
      .select(col("channel"), coalesce(col("n_users"), lit(0L)).as("n_users"),
        round(d(col("phi")), 6).as("shapley"))
      .orderBy("channel")
  }

  /** DuckDB mirror of [[shapley]] (same literal weight table, same 2^C
    * grid; channel bit positions from the same sorted ordering).
    */
  def shapleySql(tbl: String, userCol: String, typeCol: String,
      convType: String, nChannels: Int): String = {
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val weights = (0 until nChannels).map(s =>
      fact(s) * fact(nChannels - 1 - s) / fact(nChannels))
    val wList = weights.mkString("[", ", ", "]")
    s"""WITH ch AS (SELECT c AS channel,
           CAST(1 AS BIGINT) << CAST(row_number() OVER (ORDER BY c) - 1 AS INT) AS bit
         FROM (SELECT DISTINCT $typeCol AS c FROM $tbl
               WHERE $typeCol <> ${OracleSql.lit(convType)})),
       conv AS (SELECT $userCol AS u,
           MAX(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) AS conv
         FROM $tbl GROUP BY 1),
       bits AS (SELECT DISTINCT t.$userCol AS u, ch.bit
         FROM $tbl t JOIN ch ON t.$typeCol = ch.channel),
       um AS (SELECT conv.u, conv.conv, COALESCE(bm.m, 0) AS m
         FROM conv LEFT JOIN
           (SELECT u, CAST(SUM(bit) AS BIGINT) AS m FROM bits GROUP BY u) bm
           USING (u)),
       vt AS (SELECT m, CAST(SUM(conv) AS BIGINT) AS c FROM um GROUP BY m),
       s AS (SELECT CAST(g.s AS BIGINT) AS s
         FROM range(0, ${1L << nChannels}) AS g(s)),
       vcum AS (SELECT s, CAST(SUM(COALESCE(c, 0)) AS BIGINT) AS v
         FROM s LEFT JOIN vt ON (s.s & vt.m) = vt.m GROUP BY s),
       pairs AS (SELECT ch.channel, ch.bit, s.s FROM s CROSS JOIN ch
         WHERE (s.s & ch.bit) = 0),
       terms AS (SELECT channel,
           CAST(round(($wList)[bit_count(pairs.s) + 1]
             * CAST(v1.v - v0.v AS DOUBLE), 9) AS DECIMAL(28,9)) AS t
         FROM pairs
         JOIN vcum v0 ON v0.s = pairs.s
         JOIN vcum v1 ON v1.s = pairs.s + pairs.bit),
       touched AS (SELECT channel, COUNT(*) AS n_users
         FROM um CROSS JOIN ch WHERE (um.m & ch.bit) <> 0 GROUP BY 1)
       SELECT terms.channel AS channel, COALESCE(n_users, 0) AS n_users,
         round(CAST(SUM(t) AS DOUBLE), 6) AS shapley
       FROM terms LEFT JOIN touched ON touched.channel = terms.channel
       GROUP BY 1, 2 ORDER BY channel"""
  }
}
