package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the ingested stream — funnels, transition
  * matrices, cohort retention, time-decayed engagement. The reference engine's
  * domain is API-traffic analytics (continuous filtered streams over event
  * logs, `server/lib/basenine.go`); these are the standard batch companions a
  * deployment runs over the same log.
  *
  * Scale discipline shared by all four:
  *   - every shuffle is keyed by the entity (`user_id`) or by a bounded type
  *     pair — never by timestamp;
  *   - per-stage funnel joins re-use ONE user-keyed partitioning (each stage's
  *     "reached" relation is a per-user aggregate of the previous one, so AQE
  *     sees co-partitioned sides and skips re-exchange or broadcasts the
  *     shrinking stage table);
  *   - decayed sums round each term to 4 decimals then accumulate in
  *     DECIMAL(18,4) — associative and order-independent, so the result is
  *     identical under any partitioning (and matches the DuckDB mirror).
  */
object EventSeq {

  /** Ordered-funnel analysis: for each prefix of `stages`, how many users
    * performed the stages IN ORDER, each within `windowSec` of the previous
    * stage's first qualifying occurrence.
    *
    * Semantics (first-touch): a user's stage-0 time is their earliest stage-0
    * event; stage-i time is their earliest stage-i event strictly after their
    * stage-(i-1) time and within the window. This is the classic funnel
    * definition with deterministic results (no per-event pairing ambiguity).
    *
    * Shape: K−1 chained `[filter → join on user → groupBy user]` rounds. All
    * shuffles share the user key; the right side of every join is a per-user
    * single-row aggregate that only shrinks stage over stage, so at scale the
    * plan is K co-partitioned hash joins (or broadcasts, once the funnel
    * narrows below the AQE threshold) — no window over an unsplittable
    * per-user sort, no event-time shuffle.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String], windowSec: Long): DataFrame = {
    require(stages.nonEmpty, "funnel: at least one stage")
    val windowMs = windowSec * 1000L
    val base = df
      .where(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("u"), unix_millis(col(tsCol)).as("tms"),
        col(typeCol).as("et"))
    var reached = base.where(col("et") === stages.head)
      .groupBy("u").agg(min("tms").as("t"))
    val counts = new scala.collection.mutable.ArrayBuffer[DataFrame]
    counts += reached.agg(count(lit(1)).as("n_users"))
      .select(lit(0).as("stage_idx"), lit(stages.head).as("stage"), col("n_users"))
    for (i <- 1 until stages.length) {
      reached = base.where(col("et") === stages(i))
        .join(reached, "u")
        .where(col("tms") > col("t") && col("tms") <= col("t") + windowMs)
        .groupBy("u").agg(min("tms").as("t"))
      counts += reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(stages(i)).as("stage"), col("n_users"))
    }
    val all = counts.reduce(_ union _)
    // conversion vs the funnel entry — the union is K rows, the window trivial
    val w = Window.orderBy("stage_idx").rowsBetween(Window.unboundedPreceding, 0)
    all.select(col("stage_idx"), col("stage"), col("n_users"),
      round(col("n_users").cast("double") /
        greatest(first("n_users").over(w).cast("double"), lit(1.0)), 4)
        .as("conv_rate"))
      .orderBy("stage_idx")
  }

  /** DuckDB mirror of [[funnel]] — generates one CTE per stage. */
  def funnelSql(tbl: String, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String], windowSec: Long): String = {
    val windowMs = windowSec * 1000L
    val ctes = new scala.collection.mutable.ArrayBuffer[String]
    ctes += s"""s0 AS (SELECT $userCol AS u, min(epoch_ms($tsCol)) AS t
        FROM $tbl WHERE $typeCol = '${stages.head}' GROUP BY 1)"""
    for (i <- 1 until stages.length) {
      ctes += s"""s$i AS (SELECT e.$userCol AS u, min(epoch_ms(e.$tsCol)) AS t
          FROM $tbl e JOIN s${i - 1} p ON e.$userCol = p.u
          WHERE e.$typeCol = ${OracleSql.lit(stages(i))}
            AND epoch_ms(e.$tsCol) > p.t AND epoch_ms(e.$tsCol) <= p.t + $windowMs
          GROUP BY 1)"""
    }
    val unions = stages.indices.map { i =>
      s"SELECT $i AS stage_idx, ${OracleSql.lit(stages(i))} AS stage, (SELECT COUNT(*) FROM s$i) AS n_users"
    }.mkString("\n           UNION ALL ")
    s"""WITH ${ctes.mkString(",\n         ")},
         cnt AS ($unions)
         SELECT stage_idx, stage, n_users,
           round(CAST(n_users AS DOUBLE) /
             greatest(CAST(first_value(n_users) OVER (ORDER BY stage_idx) AS DOUBLE), 1.0), 4)
             AS conv_rate
         FROM cnt ORDER BY stage_idx"""
  }

  /** Stage-to-stage funnel timing: for each consecutive stage pair of the
    * [[funnel]] chain, how many users converted and their mean
    * time-to-convert in hours. Same K chained user-keyed rounds as
    * [[funnel]] — the "reached" relations additionally carry the previous
    * stage's time so the per-user delta is local to the join row. Per-user
    * deltas round to 4 then accumulate in DECIMAL(18,4) (exact mean).
    */
  def funnelTiming(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], windowSec: Long): DataFrame = {
    require(stages.length >= 2, "funnelTiming: at least two stages")
    val windowMs = windowSec * 1000L
    val base = df
      .where(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("u"), unix_millis(col(tsCol)).as("tms"),
        col(typeCol).as("et"))
    var reached = base.where(col("et") === stages.head)
      .groupBy("u").agg(min("tms").as("t"))
    val rows = new scala.collection.mutable.ArrayBuffer[DataFrame]
    for (i <- 1 until stages.length) {
      val step = base.where(col("et") === stages(i))
        .join(reached, "u")
        .where(col("tms") > col("t") && col("tms") <= col("t") + windowMs)
        .groupBy("u", "t").agg(min("tms").as("t2"))
      val delta = round((col("t2") - col("t")).cast("double") / 3600000.0, 4)
        .cast("decimal(18,4)")
      rows += step.agg(
          count(lit(1)).as("n_users"),
          (sum(delta).cast("double") / greatest(count(lit(1)), lit(1)))
            .as("_avg"))
        .select(lit(i).as("stage_idx"), lit(stages(i)).as("stage"),
          col("n_users"), round(col("_avg"), 4).as("avg_hours"))
      reached = step.select(col("u"), col("t2").as("t"))
    }
    rows.reduce(_ union _).orderBy("stage_idx")
  }

  /** DuckDB mirror of [[funnelTiming]]. */
  def funnelTimingSql(tbl: String, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], windowSec: Long): String = {
    val windowMs = windowSec * 1000L
    val ctes = new scala.collection.mutable.ArrayBuffer[String]
    ctes += s"""s0 AS (SELECT $userCol AS u, min(epoch_ms($tsCol)) AS t
        FROM $tbl WHERE $typeCol = '${stages.head}' GROUP BY 1)"""
    for (i <- 1 until stages.length) {
      ctes += s"""s$i AS (SELECT e.$userCol AS u, p.t AS tprev,
            min(epoch_ms(e.$tsCol)) AS t
          FROM $tbl e JOIN s${i - 1} p ON e.$userCol = p.u
          WHERE e.$typeCol = ${OracleSql.lit(stages(i))}
            AND epoch_ms(e.$tsCol) > p.t AND epoch_ms(e.$tsCol) <= p.t + $windowMs
          GROUP BY 1, 2)"""
    }
    val unions = (1 until stages.length).map { i =>
      s"""SELECT $i AS stage_idx, ${OracleSql.lit(stages(i))} AS stage,
          COUNT(*) AS n_users,
          round(CAST(SUM(CAST(round((t - tprev) / 3600000.0, 4) AS DECIMAL(18,4)))
              AS DOUBLE) / greatest(COUNT(*), 1), 4) AS avg_hours
          FROM s$i"""
    }.mkString("\n         UNION ALL ")
    s"""WITH ${ctes.mkString(",\n         ")}
       $unions ORDER BY stage_idx"""
  }

  /** RFM scoring (recency / frequency / monetary) per user over conversion
    * events, each metric banded into corpus quartiles — the classic
    * customer-value segmentation, and the same percentile-broadcast
    * discipline as `value_bands`/`ppl_buckets` (one tiny breaks row
    * broadcast over the user relation; no global ntile window). Recency
    * scores INVERT (smaller is better). All metrics derive from integer or
    * DECIMAL-summed quantities, so both engines band identical doubles.
    */
  def rfmScores(df: DataFrame, userCol: String, tsCol: String,
      valCol: String, typeCol: String, convType: String): DataFrame = {
    val conv = df.where(col(typeCol) === convType)
    val maxTs = conv.agg(max(unix_millis(col(tsCol))).as("t_max"))
    val per = conv.groupBy(col(userCol))
      .agg(max(unix_millis(col(tsCol))).as("last_ms"),
        count(lit(1)).as("frequency"),
        sum(col(valCol).cast("decimal(18,6)")).cast("double").as("monetary"))
      .crossJoin(broadcast(maxTs))
      .select(col(userCol),
        ((col("t_max") - col("last_ms")).cast("double") / 86400000.0)
          .as("recency_days"),
        col("frequency"), col("monetary"))
    // three array-percentile buffers (one per metric), not nine scalar
    // ones — identical interpolation per fraction off one sort per metric
    val breaks = per.agg(
        expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("_r"),
        expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("_f"),
        expr("percentile(monetary, array(0.25, 0.5, 0.75))").as("_m"))
      .select(
        col("_r").getItem(0).as("r25"), col("_r").getItem(1).as("r50"),
        col("_r").getItem(2).as("r75"),
        col("_f").getItem(0).as("f25"), col("_f").getItem(1).as("f50"),
        col("_f").getItem(2).as("f75"),
        col("_m").getItem(0).as("m25"), col("_m").getItem(1).as("m50"),
        col("_m").getItem(2).as("m75"))
    def bandAsc(c: Column, p25: Column, p50: Column, p75: Column): Column =
      when(c < p25, 1).when(c < p50, 2).when(c < p75, 3).otherwise(4)
    per.crossJoin(broadcast(breaks))
      .select(col(userCol),
        round(col("recency_days"), 4).as("recency_days"),
        col("frequency"), round(col("monetary"), 2).as("monetary"),
        (lit(5) - bandAsc(col("recency_days"), col("r25"), col("r50"), col("r75")))
          .as("r_score"),
        bandAsc(col("frequency").cast("double"), col("f25"), col("f50"), col("f75"))
          .as("f_score"),
        bandAsc(col("monetary"), col("m25"), col("m50"), col("m75")).as("m_score"))
      .withColumn("rfm", concat(col("r_score"), col("f_score"), col("m_score")))
      .orderBy(userCol)
  }

  /** DuckDB mirror of [[rfmScores]]. */
  def rfmScoresSql(tbl: String, userCol: String, tsCol: String,
      valCol: String, typeCol: String, convType: String): String = {
    def band(c: String, p: String) =
      s"CASE WHEN $c < ${p}25 THEN 1 WHEN $c < ${p}50 THEN 2 WHEN $c < ${p}75 THEN 3 ELSE 4 END"
    s"""WITH conv AS (SELECT * FROM $tbl WHERE $typeCol = ${OracleSql.lit(convType)}),
       mx AS (SELECT max(epoch_ms($tsCol)) AS t_max FROM conv),
       per AS (SELECT $userCol,
                 CAST(t_max - max(epoch_ms($tsCol)) AS DOUBLE) / 86400000.0 AS recency_days,
                 COUNT(*) AS frequency,
                 CAST(SUM(CAST($valCol AS DECIMAL(18,6))) AS DOUBLE) AS monetary
               FROM conv CROSS JOIN mx GROUP BY $userCol, t_max),
       b AS (SELECT quantile_cont(recency_days, 0.25) AS r25, quantile_cont(recency_days, 0.5) AS r50,
               quantile_cont(recency_days, 0.75) AS r75,
               quantile_cont(CAST(frequency AS DOUBLE), 0.25) AS f25,
               quantile_cont(CAST(frequency AS DOUBLE), 0.5) AS f50,
               quantile_cont(CAST(frequency AS DOUBLE), 0.75) AS f75,
               quantile_cont(monetary, 0.25) AS m25, quantile_cont(monetary, 0.5) AS m50,
               quantile_cont(monetary, 0.75) AS m75
             FROM per)
       SELECT $userCol, round(recency_days, 4) AS recency_days, frequency,
         round(monetary, 2) AS monetary,
         5 - ${band("recency_days", "r")} AS r_score,
         ${band("CAST(frequency AS DOUBLE)", "f")} AS f_score,
         ${band("monetary", "m")} AS m_score,
         CAST(5 - ${band("recency_days", "r")} AS VARCHAR) ||
           CAST(${band("CAST(frequency AS DOUBLE)", "f")} AS VARCHAR) ||
           CAST(${band("monetary", "m")} AS VARCHAR) AS rfm
       FROM per CROSS JOIN b ORDER BY $userCol"""
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * counts of consecutive (from → to) event-type pairs in per-user time
    * order, with the conditional probability per source type.
    *
    * Shape: ONE window (`lead` over user partitions ordered by (ts, id)) and
    * one bounded agg — the output relation is at most |types|² rows. The
    * window partitions by user: per-user event counts are workload-bounded in
    * an analytics log (and a pathological hot user degrades one task, not the
    * agg, whose key space is the type pair). `idCol` breaks timestamp ties so
    * the sequence — and therefore the counts — are deterministic.
    */
  def transitions(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = df
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val wf = Window.partitionBy("from_type")
    pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n").cast("double") / sum("n").over(wf).cast("double"), 4))
      .orderBy("from_type", "to_type")
  }

  /** DuckDB mirror of [[transitions]]. */
  def transitionsSql(tbl: String, userCol: String, tsCol: String,
      typeCol: String, idCol: String): String =
    s"""WITH p AS (SELECT $typeCol AS from_type,
           lead($typeCol) OVER (PARTITION BY $userCol ORDER BY $tsCol, $idCol) AS to_type
         FROM $tbl),
       c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
             WHERE to_type IS NOT NULL GROUP BY 1, 2)
       SELECT from_type, to_type, n,
         round(CAST(n AS DOUBLE) /
           CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS p
       FROM c ORDER BY from_type, to_type"""

  /** Cohort retention: users are cohorted by their first active day; for each
    * (cohort_day, day_offset) cell, how many of that cohort were active.
    *
    * Shape: three user-keyed aggregations — first-day per user, distinct
    * (user, day) activity, one join on user — then a bounded (cohort, offset)
    * agg. The distinct collapses per-user-per-day event multiplicity BEFORE
    * the join, so the join's left side is |users|×|active days|, not |events|.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val day = floor(unix_millis(col(tsCol)) / 86400000L)
    val activity = df.select(col(userCol).as("u"), day.as("day")).distinct()
    val cohort = activity.groupBy("u").agg(min("day").as("cohort_day"))
    activity.join(cohort, "u")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Cohort LTV curve: [[cohortRetention]] counts who comes BACK; this
    * accumulates what each cohort is WORTH — per (cohort day, day offset),
    * the cumulative summed value per original cohort member. Flat curves
    * say a cohort monetized once; steadily rising ones compound. The
    * value-weighted reading a retention matrix alone cannot give.
    *
    * Per-(cohort, offset) day sums fold as DECIMAL; the cumulative sum is
    * a window PARTITIONED by cohort over the calendar²-bounded curve
    * relation (never over events); one division per output row.
    */
  def cohortLtv(df: DataFrame, userCol: String, tsCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = floor(unix_millis(col(tsCol)) / 86400000L)
    val base = df.select(col(userCol).as("u"), day.as("day"),
      col(valCol).cast("decimal(18,6)").as("v"))
    val cohort = base.groupBy("u").agg(min("day").as("cohort_day"))
    val sizes = cohort.groupBy("cohort_day").agg(count(lit(1)).as("n_users"))
    val daily = base.join(cohort, "u")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(sum(col("v")).as("day_value"))
    val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_value", sum(col("day_value")).over(w))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        round(col("cum_value").cast("double"), 4).as("cum_value"),
        round(col("cum_value").cast("double") /
          col("n_users").cast("double"), 6).as("ltv_per_user"))
      .orderBy("cohort_day", "day_offset")
  }

  /** DuckDB mirror of [[cohortLtv]]. */
  def cohortLtvSql(tbl: String, userCol: String, tsCol: String,
      valCol: String): String =
    s"""WITH base AS (SELECT $userCol AS u,
           CAST(floor(epoch_ms($tsCol) / 86400000) AS BIGINT) AS day,
           CAST($valCol AS DECIMAL(18,6)) AS v FROM $tbl),
       c AS (SELECT u, MIN(day) AS cohort_day FROM base GROUP BY 1),
       sz AS (SELECT cohort_day, COUNT(*) AS n_users FROM c GROUP BY 1),
       d AS (SELECT c.cohort_day, base.day - c.cohort_day AS day_offset,
           SUM(v) AS day_value
         FROM base JOIN c USING (u) GROUP BY 1, 2),
       cum AS (SELECT cohort_day, day_offset,
           SUM(day_value) OVER (PARTITION BY cohort_day ORDER BY day_offset
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_value
         FROM d)
       SELECT cum.cohort_day, day_offset, n_users,
         round(CAST(cum_value AS DOUBLE), 4) AS cum_value,
         round(CAST(cum_value AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
           AS ltv_per_user
       FROM cum JOIN sz USING (cohort_day)
       ORDER BY cohort_day, day_offset"""

  /** DuckDB mirror of [[cohortRetention]]. */
  def cohortRetentionSql(tbl: String, userCol: String, tsCol: String): String =
    s"""WITH a AS (SELECT DISTINCT $userCol AS u,
           CAST(floor(epoch_ms($tsCol) / 86400000) AS BIGINT) AS day FROM $tbl),
       c AS (SELECT u, min(day) AS cohort_day FROM a GROUP BY 1)
       SELECT c.cohort_day, a.day - c.cohort_day AS day_offset, COUNT(*) AS n_users
       FROM a JOIN c USING (u) GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Exponentially time-decayed per-user engagement: each event contributes
    * `value · 0.5^(Δt / halfLife)` where Δt is its age relative to the
    * corpus's newest event (one broadcast scalar — a recency-weighted score a
    * ranking pipeline recomputes per snapshot).
    *
    * Determinism: each term is rounded to 4 decimals and accumulated in
    * DECIMAL(18,4) — exact and associative, so partitioning cannot reorder
    * the float sum (same discipline as the LM scorers).
    */
  def decayAgg(df: DataFrame, userCol: String, tsCol: String, valCol: String,
      halfLifeSec: Long): DataFrame = {
    val maxTs = df.agg(max(unix_millis(col(tsCol))).as("t_max"))
    val term = round(
      col(valCol) * pow(lit(0.5),
        (col("t_max") - unix_millis(col(tsCol))).cast("double") /
          (halfLifeSec * 1000.0)), 4).cast("decimal(18,4)")
    df.crossJoin(broadcast(maxTs))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        sum(term).cast("double").as("decayed_value"))
      .orderBy(userCol)
  }

  /** DuckDB mirror of [[decayAgg]]. */
  def decayAggSql(tbl: String, userCol: String, tsCol: String, valCol: String,
      halfLifeSec: Long): String =
    s"""WITH m AS (SELECT max(epoch_ms($tsCol)) AS t_max FROM $tbl)
       SELECT $userCol, COUNT(*) AS n_events,
         CAST(SUM(CAST(round($valCol * pow(0.5,
             CAST(t_max - epoch_ms($tsCol) AS DOUBLE) / ${halfLifeSec * 1000.0}), 4)
           AS DECIMAL(18,4))) AS DOUBLE) AS decayed_value
       FROM $tbl CROSS JOIN m GROUP BY $userCol ORDER BY $userCol"""

  /** Trailing-window per-event rolling aggregate: for every event, the sum
    * of `valCol` and the event count over the SAME user's events in the
    * trailing `windowSec` (inclusive range frame — peers at the same
    * timestamp are in each other's frames, the standard RANGE semantics
    * both engines share).
    *
    * Shape: ONE user-partitioned range window — per-user partitions are
    * workload-bounded in an analytics log; the frame is time-bounded so
    * state per row is O(events-in-window). Sums accumulate in
    * DECIMAL(18,6) (exact; the frame's accumulation order is
    * engine-internal and must not show).
    */
  def rollingWindow(df: DataFrame, userCol: String, tsCol: String,
      valCol: String, idCol: String, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_ms"))
      .rangeBetween(-windowSec * 1000L, 0L)
    df.select(col(idCol), col(userCol), unix_millis(col(tsCol)).as("ts_ms"),
        col(valCol))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window",
        sum(col(valCol).cast("decimal(18,6)")).over(w).cast("double"))
      .drop(valCol)
      .orderBy(idCol)
  }

  /** DuckDB mirror of [[rollingWindow]]. */
  def rollingWindowSql(tbl: String, userCol: String, tsCol: String,
      valCol: String, idCol: String, windowSec: Long): String =
    s"""SELECT $idCol, $userCol, epoch_ms($tsCol) AS ts_ms,
         COUNT(*) OVER w AS n_window,
         CAST(SUM(CAST($valCol AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_window
       FROM $tbl
       WINDOW w AS (PARTITION BY $userCol ORDER BY epoch_ms($tsCol)
         RANGE BETWEEN ${windowSec * 1000L} PRECEDING AND CURRENT ROW)
       ORDER BY $idCol"""

  /** Top user-journey paths: the most common 3-step event-type sequences
    * across users — the "what do users actually do" path-mining readout
    * (and, as a data shape, the order-k Markov context table
    * [[transitions]] generalizes to).
    *
    * Same single-window discipline as [[transitions]]: TWO leads over one
    * user-partitioned window (one window shuffle total), then a bounded agg
    * (≤ |types|³ keys) and the salted-safe TakeOrdered top-k. Ties in count
    * break on the path triple so the top-k cut is total-ordered.
    */
  def pathTrigrams(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, topN: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    df.select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(w))
      .withColumn("s3", lead(col("s1"), 2).over(w))
      .where(col("s3").isNotNull)
      .groupBy("s1", "s2", "s3").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
      .limit(topN)
  }

  /** Two-proportion experiment readout (A/B test): users are assigned to
    * arms by the md5 parity of their id (the [[graft.operators.Sampling]]
    * determinism mechanic standing in for a real assignment column),
    * conversion is "user emitted ≥ `minCount` `convType` events", and the arms are
    * compared with the pooled two-proportion z statistic — the analytics
    * primitive an event engine's dashboard computes on every experiment.
    *
    * Shape: one scan → per-user (arm, converted) aggregation (user-keyed,
    * map-side combinable) → a 2-row arm rollup → one output row. Every
    * statistic derives from integer counts, so both engines compute
    * identical doubles; z rounds to 4.
    */
  def abConversion(df: DataFrame, userCol: String, typeCol: String,
      convType: String, minCount: Int = 1, salt: String = "arm"): DataFrame = {
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val perUser = df.select(col(userCol).as("u"), arm,
        (col(typeCol) === convType).cast("int").as("cv"))
      .groupBy("u", "arm")
      .agg((sum("cv") >= minCount).cast("int").as("converted"))
    // ONE pass: conditional aggregation pivots both arms out of a single
    // global agg. The earlier where(arm=0)/where(arm=1) branch pair +
    // crossJoin re-evaluated the full scan AND the per-user shuffle twice —
    // the round-7 idle bench caught the 2x (0.28 → 0.66 s at sf0.1); at
    // 100 TB that's a doubled fact-table scan for a 1-row readout.
    val one = perUser.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0, col("converted").cast("long")).otherwise(0L)).as("c_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1, col("converted").cast("long")).otherwise(0L)).as("c_b"))
    val pa = col("c_a").cast("double") / col("n_a").cast("double")
    val pb = col("c_b").cast("double") / col("n_b").cast("double")
    val pp = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    // empty-arm degenerate case lands 0 rows, exactly like the oracle's
    // CROSS JOIN of an empty arm CTE (and like the old branch-pair shape)
    one.where(col("n_a") > 0 && col("n_b") > 0)
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        round(pa, 6).as("conv_a"), round(pb, 6).as("conv_b"),
        // 1e-12 variance floor (the rateAnomaly convention): a degenerate
        // experiment where EVERY user converts has zero pooled variance
        round((pa - pb) /
          sqrt(greatest(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_a").cast("double") +
             lit(1.0) / col("n_b").cast("double")), lit(1e-12))), 4).as("z"))
  }

  /** Welch's t-test on per-event VALUES between the same md5 arms — the
    * continuous-metric companion to [[abConversion]]'s proportions z
    * (revenue-per-purchase experiments, where variances differ by arm and
    * pooled-variance t would be wrong). Every moment folds from DECIMAL
    * Σx / Σx² (exact, order-free); the t statistic and Welch–Satterthwaite
    * df derive from those exact sums in one fixed double-arithmetic shape,
    * so both engines agree bit-for-bit. One scan, a 2-row arm aggregate,
    * one output row.
    */
  /** DAU/WAU/MAU active-user curves with the DAU/MAU stickiness ratio —
    * the product-analytics pulse. Trailing windows are EXACT distinct
    * counts: the (user, day) relation fans out to the ≤28 future days
    * each activity keeps a user "active" for, then one distinct-agg per
    * horizon — a deliberate 28× expansion of the user-day relation
    * (documented cost; the HLL sketch drops in for the approximate
    * variant at extreme scale, fold unchanged). Calendar-bounded output.
    */
  def activeUsers(df: DataFrame, userCol: String, tsCol: String,
      wauDays: Int = 7, mauDays: Int = 28): DataFrame = {
    require(wauDays < mauDays, "activeUsers: wau must be < mau")
    def d(c: Column) = c.cast("double")
    val day = floor(unix_millis(col(tsCol)) / 86400000L)
    val ud = df.select(col(userCol).as("u"), day.as("day")).distinct()
    val span = ud.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"))
    val grid = span.select(
      explode(sequence(col("dmin"), col("dmax"))).as("day"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val fan = ud.crossJoin(broadcast(span))
      .select(col("u"), col("day"),
        explode(sequence(col("day"), least(col("day") + (mauDays - 1),
          col("dmax")))).as("t"))
      .select(col("u"), col("t"), (col("t") - col("day")).as("off"))
    val wau = fan.where(col("off") < wauDays)
      .select(col("t"), col("u")).distinct()
      .groupBy(col("t")).agg(count(lit(1)).as("wau"))
    val mau = fan.select(col("t"), col("u")).distinct()
      .groupBy(col("t")).agg(count(lit(1)).as("mau"))
    grid
      .join(dau, Seq("day"), "left")
      .join(wau, grid("day") === wau("t"), "left").drop("t")
      .join(mau, grid("day") === mau("t"), "left").drop("t")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
      .withColumn("stickiness",
        when(col("mau") > 0,
          round(d(col("dau")) / d(col("mau")), 6)))
      .orderBy("day")
  }

  /** DuckDB mirror of [[activeUsers]]. */
  def activeUsersSql(tbl: String, userCol: String, tsCol: String,
      wauDays: Int = 7, mauDays: Int = 28): String =
    s"""WITH ud AS (SELECT DISTINCT $userCol AS u,
           CAST(floor(epoch_ms($tsCol) / 86400000) AS BIGINT) AS day
         FROM $tbl),
       span AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM ud),
       grid AS (SELECT CAST(g.d AS BIGINT) AS day FROM span,
         unnest(range(dmin, dmax + 1)) AS g(d)),
       dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
       fan AS (SELECT u, CAST(t AS BIGINT) AS t, CAST(t AS BIGINT) - day AS off
         FROM ud CROSS JOIN span,
           unnest(range(day, least(day + $mauDays, dmax + 1))) AS g(t)),
       wau AS (SELECT t, COUNT(*) AS wau FROM
         (SELECT DISTINCT t, u FROM fan WHERE off < $wauDays) GROUP BY t),
       mau AS (SELECT t, COUNT(*) AS mau FROM
         (SELECT DISTINCT t, u FROM fan) GROUP BY t)
       SELECT grid.day, COALESCE(dau, 0) AS dau, COALESCE(wau, 0) AS wau,
         COALESCE(mau, 0) AS mau,
         CASE WHEN COALESCE(mau, 0) > 0
           THEN round(CAST(COALESCE(dau, 0) AS DOUBLE) / mau, 6) END
           AS stickiness
       FROM grid LEFT JOIN dau ON dau.day = grid.day
       LEFT JOIN wau ON wau.t = grid.day
       LEFT JOIN mau ON mau.t = grid.day
       ORDER BY grid.day"""

  /** Cohen's effect sizes for the md5-arm experiment, both families in
    * one row: h = 2·(asin√p_a − asin√p_b) for the conversion proportions
    * (the arcsine-stabilized gap [[graft.operators]] power planning uses)
    * and d = (m_a − m_b)/s_pooled for the continuous value metric. The
    * MAGNITUDE companions to the yes/no tests — two experiments with
    * equal p-values can carry wildly different h/d.
    */
  def effectSizes(df: DataFrame, userCol: String, typeCol: String,
      valCol: String, convType: String, minCount: Int = 1,
      salt: String = "arm"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val pu = df.groupBy(col(userCol), arm)
      .agg((sum(when(col(typeCol) === convType, 1L).otherwise(0L)) >=
        minCount).as("conv"))
    val props = pu.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0 && col("conv"), 1L).otherwise(0L)).as("c_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1 && col("conv"), 1L).otherwise(0L)).as("c_b"))
    val vals = df.where(col(typeCol) === convType)
      .select(arm, col(valCol).cast("decimal(18,6)").as("x"))
      .groupBy("arm")
      .agg(count(lit(1)).as("nv"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val va = vals.where(col("arm") === 0)
      .select(col("nv").as("nva"), col("sx").as("sxa"), col("sxx").as("sxxa"))
    val vb = vals.where(col("arm") === 1)
      .select(col("nv").as("nvb"), col("sx").as("sxb"), col("sxx").as("sxxb"))
    val pa = d(col("c_a")) / d(col("n_a"))
    val pb = d(col("c_b")) / d(col("n_b"))
    val h = lit(2.0) * (asin(sqrt(pa)) - asin(sqrt(pb)))
    val ma = d(col("sxa")) / d(col("nva"))
    val mb = d(col("sxb")) / d(col("nvb"))
    val ssA = d(col("sxxa")) - d(col("sxa")) * d(col("sxa")) / d(col("nva"))
    val ssB = d(col("sxxb")) - d(col("sxb")) * d(col("sxb")) / d(col("nvb"))
    val sp = sqrt((ssA + ssB) / (d(col("nva")) + d(col("nvb")) - lit(2.0)))
    props.crossJoin(broadcast(va)).crossJoin(broadcast(vb))
      .select(col("n_a"), col("n_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round(h, 6).as("cohens_h"),
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        when(sp > 0, round((ma - mb) / sp, 6)).as("cohens_d"))
  }

  /** DuckDB mirror of [[effectSizes]]. */
  def effectSizesSql(tbl: String, userCol: String, typeCol: String,
      valCol: String, convType: String, minCount: Int = 1,
      salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) >= $minCount AS conv
         FROM $tbl GROUP BY 1, 2),
       props AS (SELECT
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c_b
         FROM pu),
       vals AS (SELECT
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           COUNT(*) AS nv, SUM(CAST($valCol AS DECIMAL(18,6))) AS sx,
           SUM(CAST($valCol AS DECIMAL(18,6)) * CAST($valCol AS DECIMAL(18,6))) AS sxx
         FROM $tbl WHERE $typeCol = ${OracleSql.lit(convType)} GROUP BY 1),
       va AS (SELECT nv AS nva, sx AS sxa, sxx AS sxxa FROM vals WHERE arm = 0),
       vb AS (SELECT nv AS nvb, sx AS sxb, sxx AS sxxb FROM vals WHERE arm = 1),
       f AS (SELECT n_a, n_b,
           CAST(c_a AS DOUBLE) / n_a AS pa, CAST(c_b AS DOUBLE) / n_b AS pb,
           CAST(sxa AS DOUBLE) / nva AS ma, CAST(sxb AS DOUBLE) / nvb AS mb,
           sqrt(((CAST(sxxa AS DOUBLE) - CAST(sxa AS DOUBLE) * sxa / nva)
             + (CAST(sxxb AS DOUBLE) - CAST(sxb AS DOUBLE) * sxb / nvb))
             / (CAST(nva AS DOUBLE) + nvb - 2.0)) AS sp
         FROM props CROSS JOIN va CROSS JOIN vb)
       SELECT n_a, n_b, round(pa, 6) AS p_a, round(pb, 6) AS p_b,
         round(2.0 * (asin(sqrt(pa)) - asin(sqrt(pb))), 6) AS cohens_h,
         round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
         CASE WHEN sp > 0 THEN round((ma - mb) / sp, 6) END AS cohens_d
       FROM f"""

  /** Discrete-time churn hazard over observed user lifetimes: for each
    * lifetime age a (days between first and last activity), the hazard
    * h(a) = (users whose lifetime ENDED at a) / (users still alive at a).
    * The per-age readout behind "when do we lose people" —
    * [[graft.operators.Survival]]'s KM curve integrates this; the raw
    * hazard localizes WHICH age the drop concentrates at (day-1 churn vs
    * slow decay), which the smoothed curve hides.
    *
    * One per-user agg to lifetimes, one age-bounded count relation, a
    * reverse cumulative window over ≤span ages. Integer until the ratio.
    */
  def churnHazard(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val day = floor(unix_millis(col(tsCol)) / 86400000L)
    val life = df.select(col(userCol).as("u"), day.as("day"))
      .groupBy("u").agg((max("day") - min("day")).as("l"))
    val byAge = life.groupBy(col("l").as("age"))
      .agg(count(lit(1)).as("n_churned"))
    val w = Window.orderBy(col("age").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byAge
      .withColumn("at_risk", sum(col("n_churned")).over(w))
      .select(col("age"), col("at_risk"), col("n_churned"),
        round(d(col("n_churned")) / d(col("at_risk")), 6).as("hazard"))
      .orderBy("age")
  }

  /** DuckDB mirror of [[churnHazard]]. */
  def churnHazardSql(tbl: String, userCol: String, tsCol: String): String =
    s"""WITH life AS (SELECT $userCol AS u,
           MAX(CAST(floor(epoch_ms($tsCol) / 86400000) AS BIGINT))
             - MIN(CAST(floor(epoch_ms($tsCol) / 86400000) AS BIGINT)) AS l
         FROM $tbl GROUP BY 1),
       byage AS (SELECT l AS age, COUNT(*) AS n_churned FROM life GROUP BY 1),
       cum AS (SELECT age, n_churned,
           SUM(n_churned) OVER (ORDER BY age DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS at_risk
         FROM byage)
       SELECT age, CAST(at_risk AS BIGINT) AS at_risk, n_churned,
         round(CAST(n_churned AS DOUBLE) / at_risk, 6) AS hazard
       FROM cum ORDER BY age"""

  /** Market-basket association over per-user event-type sets (Agrawal
    * et al. 1993 support/confidence/lift, plus audience Jaccard): for
    * every unordered type pair, how much more often do the SAME users do
    * both than independence predicts? lift > 1 = complementary behaviors
    * (bundle them in the funnel), lift < 1 = substitutes. The
    * type-pair-level companion to [[eventTransitions]]' sequence view —
    * co-audience, not co-occurrence-in-time.
    *
    * The corpus collapses once to distinct (user, type); the pair layer
    * is a per-user self-join bounded by |types|² per user; marginals
    * broadcast back. Integer counts until the final ratios.
    */
  def basketLift(df: DataFrame, userCol: String, typeCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    // barrier: the (user, type) relation feeds the user count, the
    // marginals AND both sides of the pair self-join — four re-expansions
    // of the scan+distinct without it
    val ut = Dedup.parallelize(df)
      .select(col(userCol).as("u"), col(typeCol).as("t")).distinct()
      .localCheckpoint()
    val nUsers = ut.select("u").distinct().agg(count(lit(1)).as("n_users"))
    val marg = ut.groupBy("t").agg(count(lit(1)).as("nt"))
    val pairs = ut.join(ut.select(col("u"), col("t").as("t2")), "u")
      .where(col("t") < col("t2"))
      .groupBy(col("t").as("type_a"), col("t2").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(marg.select(col("t").as("type_a"), col("nt").as("n_a"))),
        "type_a")
      .join(broadcast(marg.select(col("t").as("type_b"), col("nt").as("n_b"))),
        "type_b")
      .crossJoin(broadcast(nUsers))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        round(d(col("n_both")) / d(col("n_users")), 6).as("support"),
        round(d(col("n_both")) / d(col("n_a")), 6).as("conf_a_b"),
        round(d(col("n_both")) / d(col("n_b")), 6).as("conf_b_a"),
        round(d(col("n_users")) * d(col("n_both")) /
          (d(col("n_a")) * d(col("n_b"))), 6).as("lift"),
        round(d(col("n_both")) /
          (d(col("n_a")) + d(col("n_b")) - d(col("n_both"))), 6)
          .as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  /** DuckDB mirror of [[basketLift]]. */
  def basketLiftSql(tbl: String, userCol: String, typeCol: String): String =
    s"""WITH ut AS (SELECT DISTINCT $userCol AS u, $typeCol AS t FROM $tbl),
       nu AS (SELECT COUNT(DISTINCT u) AS n_users FROM ut),
       marg AS (SELECT t, COUNT(*) AS nt FROM ut GROUP BY t),
       pairs AS (SELECT a.t AS type_a, b.t AS type_b, COUNT(*) AS n_both
         FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
         GROUP BY 1, 2)
       SELECT type_a, type_b,
         ma.nt AS n_a, mb.nt AS n_b, n_both,
         round(CAST(n_both AS DOUBLE) / n_users, 6) AS support,
         round(CAST(n_both AS DOUBLE) / ma.nt, 6) AS conf_a_b,
         round(CAST(n_both AS DOUBLE) / mb.nt, 6) AS conf_b_a,
         round(CAST(n_users AS DOUBLE) * n_both
           / (CAST(ma.nt AS DOUBLE) * mb.nt), 6) AS lift,
         round(CAST(n_both AS DOUBLE) / (ma.nt + mb.nt - n_both), 6) AS jaccard
       FROM pairs
       JOIN marg ma ON ma.t = type_a
       JOIN marg mb ON mb.t = type_b
       CROSS JOIN nu
       ORDER BY type_a, type_b"""

  /** Post-stratified A/B estimate (Miratrix et al. 2013): the arm
    * difference re-weighted within strata of a PRE-treatment covariate
    * (the user's first-activity day-of-week) — removes the variance and
    * bias a lumpy covariate mix injects into the raw difference. Reports
    * raw vs post-stratified diff + SE: when the two disagree, the raw
    * readout was confounded by the mix.
    *
    * One per-user pass (arm, stratum, converted), a strata-bounded 2×2
    * layer, round-then-DECIMAL weighted folds.
    */
  def postStrat(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, convType: String, minCount: Int = 1,
      salt: String = "arm"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val pu = df.groupBy(col(userCol), arm)
      .agg(
        ((pmod(floor(min(unix_millis(col(tsCol))) / 86400000L) + 4, lit(7)))
          .cast("int")).as("stratum"),
        (sum(when(col(typeCol) === convType, 1L).otherwise(0L)) >=
          minCount).as("conv"))
    val byS = pu.groupBy("stratum")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0 && col("conv"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1 && col("conv"), 1L).otherwise(0L)).as("cb"))
      .where(col("na") > 0 && col("nb") > 0)
    val tot = byS.agg(sum(col("na") + col("nb")).as("n"),
      sum(col("na")).as("nat"), sum(col("ca")).as("cat"),
      sum(col("nb")).as("nbt"), sum(col("cb")).as("cbt"))
    val pa = d(col("ca")) / d(col("na"))
    val pb = d(col("cb")) / d(col("nb"))
    val w = (d(col("na")) + d(col("nb"))) / d(col("n"))
    val terms = byS.crossJoin(broadcast(tot))
      .select(col("n"), col("nat"), col("cat"), col("nbt"), col("cbt"),
        round(w * (pa - pb), 9).cast("decimal(28,9)").as("wd"),
        round(w * w * (pa * (lit(1.0) - pa) / d(col("na")) +
          pb * (lit(1.0) - pb) / d(col("nb"))), 9)
          .cast("decimal(28,9)").as("wv"),
        lit(1L).as("one"))
    val agg = terms.groupBy("n", "nat", "cat", "nbt", "cbt")
      .agg(sum(col("wd")).as("psd"), sum(col("wv")).as("psv"),
        sum(col("one")).as("k_strata"))
    val rawDiff = d(col("cat")) / d(col("nat")) - d(col("cbt")) / d(col("nbt"))
    val z = d(col("psd")) / sqrt(d(col("psv")))
    agg.select(col("n").cast("long").as("n_users"), col("k_strata"),
      round(rawDiff, 6).as("raw_diff"),
      round(d(col("psd")), 6).as("poststrat_diff"),
      round(sqrt(d(col("psv"))), 6).as("se"),
      when(col("psv") > 0, round(z, 4)).as("z"),
      when(col("psv") > 0, abs(z) > 1.96).as("sig_95"))
  }

  /** DuckDB mirror of [[postStrat]] (dow = (epoch_days + 4) mod 7, the
    * board's portable day-of-week).
    */
  def postStratSql(tbl: String, userCol: String, typeCol: String,
      tsCol: String, convType: String, minCount: Int = 1,
      salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CAST((CAST(floor(MIN(epoch_ms($tsCol)) / 86400000) AS BIGINT) + 4) % 7 AS INT) AS stratum,
           SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) >= $minCount AS conv
         FROM $tbl GROUP BY 1, 2),
       bys AS (SELECT stratum,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
           CAST(SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS cb
         FROM pu GROUP BY 1 HAVING SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0
           AND SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0),
       tot AS (SELECT CAST(SUM(na + nb) AS BIGINT) AS n,
           CAST(SUM(na) AS BIGINT) AS nat, CAST(SUM(ca) AS BIGINT) AS cat,
           CAST(SUM(nb) AS BIGINT) AS nbt, CAST(SUM(cb) AS BIGINT) AS cbt
         FROM bys),
       terms AS (SELECT n, nat, cat, nbt, cbt,
           CAST(round((CAST(na + nb AS DOUBLE) / n)
             * (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb), 9)
             AS DECIMAL(28,9)) AS wd,
           CAST(round((CAST(na + nb AS DOUBLE) / n) * (CAST(na + nb AS DOUBLE) / n)
             * ((CAST(ca AS DOUBLE) / na) * (1.0 - CAST(ca AS DOUBLE) / na) / na
              + (CAST(cb AS DOUBLE) / nb) * (1.0 - CAST(cb AS DOUBLE) / nb) / nb), 9)
             AS DECIMAL(28,9)) AS wv
         FROM bys CROSS JOIN tot),
       agg AS (SELECT n, nat, cat, nbt, cbt, SUM(wd) AS psd, SUM(wv) AS psv,
           COUNT(*) AS k_strata
         FROM terms GROUP BY 1, 2, 3, 4, 5)
       SELECT n AS n_users, k_strata,
         round(CAST(cat AS DOUBLE) / nat - CAST(cbt AS DOUBLE) / nbt, 6) AS raw_diff,
         round(CAST(psd AS DOUBLE), 6) AS poststrat_diff,
         round(sqrt(CAST(psv AS DOUBLE)), 6) AS se,
         CASE WHEN psv > 0 THEN round(CAST(psd AS DOUBLE) / sqrt(CAST(psv AS DOUBLE)), 4) END AS z,
         CASE WHEN psv > 0 THEN abs(CAST(psd AS DOUBLE) / sqrt(CAST(psv AS DOUBLE))) > 1.96 END AS sig_95
       FROM agg"""

  /** Simpson's-paradox detector over the same stratification as
    * [[postStrat]]: the paradox fires when EVERY stratum's arm difference
    * carries one sign and the pooled difference carries the other — the
    * aggregation artifact that makes a harmful variant look good (or vice
    * versa) purely through mix shift. Reported with the stratum sign
    * census so a near-paradox (most-but-not-all strata flipped) is
    * visible before it matures into a full one.
    */
  def simpsonsCheck(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, convType: String, minCount: Int = 1,
      salt: String = "arm"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val pu = df.groupBy(col(userCol), arm)
      .agg(
        ((pmod(floor(min(unix_millis(col(tsCol))) / 86400000L) + 4, lit(7)))
          .cast("int")).as("stratum"),
        (sum(when(col(typeCol) === convType, 1L).otherwise(0L)) >=
          minCount).as("conv"))
    val byS = pu.groupBy("stratum")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("arm") === 0 && col("conv"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("arm") === 1 && col("conv"), 1L).otherwise(0L)).as("cb"))
      .where(col("na") > 0 && col("nb") > 0)
    // integer cross-multiplied sign: ca·nb − cb·na
    val sgn = col("ca") * col("nb") - col("cb") * col("na")
    val census = byS.agg(count(lit(1)).as("k_strata"),
      sum(when(sgn > 0, 1L).otherwise(0L)).as("n_pos"),
      sum(when(sgn < 0, 1L).otherwise(0L)).as("n_neg"),
      sum(col("na")).as("nat"), sum(col("ca")).as("cat"),
      sum(col("nb")).as("nbt"), sum(col("cb")).as("cbt"))
    val overall = col("cat") * col("nbt") - col("cbt") * col("nat")
    census.select(col("k_strata"), col("n_pos").as("n_strata_pos"),
      col("n_neg").as("n_strata_neg"),
      round(d(col("cat")) / d(col("nat")) - d(col("cbt")) / d(col("nbt")), 6)
        .as("overall_diff"),
      ((overall > 0 && col("n_pos") === 0 && col("n_neg") > 0) ||
        (overall < 0 && col("n_neg") === 0 && col("n_pos") > 0))
        .as("paradox"))
  }

  /** DuckDB mirror of [[simpsonsCheck]]. */
  def simpsonsCheckSql(tbl: String, userCol: String, typeCol: String,
      tsCol: String, convType: String, minCount: Int = 1,
      salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CAST((CAST(floor(MIN(epoch_ms($tsCol)) / 86400000) AS BIGINT) + 4) % 7 AS INT) AS stratum,
           SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) >= $minCount AS conv
         FROM $tbl GROUP BY 1, 2),
       bys AS (SELECT stratum,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS ca,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
           CAST(SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS cb
         FROM pu GROUP BY 1 HAVING SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0
           AND SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0),
       c AS (SELECT COUNT(*) AS k_strata,
           CAST(SUM(CASE WHEN ca * nb - cb * na > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN ca * nb - cb * na < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           CAST(SUM(na) AS BIGINT) AS nat, CAST(SUM(ca) AS BIGINT) AS cat,
           CAST(SUM(nb) AS BIGINT) AS nbt, CAST(SUM(cb) AS BIGINT) AS cbt
         FROM bys)
       SELECT k_strata, n_pos AS n_strata_pos, n_neg AS n_strata_neg,
         round(CAST(cat AS DOUBLE) / nat - CAST(cbt AS DOUBLE) / nbt, 6)
           AS overall_diff,
         (cat * nbt - cbt * nat > 0 AND n_pos = 0 AND n_neg > 0)
           OR (cat * nbt - cbt * nat < 0 AND n_neg = 0 AND n_pos > 0)
           AS paradox
       FROM c"""

  /** Ratio-metric A/B with the delta-method variance (the "revenue per
    * event" class): R = Σvalue/Σevents per arm is a ratio of two RANDOM
    * per-user sums, so the naive per-event t-test understates the
    * variance whenever users differ in volume (they always do). Delta
    * method on the per-user (x=value, y=events) pairs:
    * Var(R) = (Sxx − 2R·Sxy + R²·Syy) / (n·ȳ²), z on the arm difference.
    * The correction every experimentation platform ships for per-unit
    * ratio metrics; [[abValueTtest]] covers the per-event metric where
    * the unit IS the observation.
    *
    * One per-user DECIMAL moment pass, a 2-row arm rollup, fixed double
    * shape — the abConversion scan pattern.
    */
  def ratioMetricAb(df: DataFrame, userCol: String, typeCol: String,
      valCol: String, convType: String, salt: String = "arm"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val pu = df.groupBy(col(userCol), arm)
      .agg(sum(when(col(typeCol) === convType,
          col(valCol).cast("decimal(18,6)")).otherwise(lit(0).cast("decimal(18,6)")))
          .as("x"),
        sum(when(col(typeCol) === convType, 1L).otherwise(0L)).as("y"))
    val arms = pu.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,6)")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    def side(a: Int, suffix: String) = arms.where(col("arm") === a)
      .select(col("n").as(s"n$suffix"), col("sx").as(s"sx$suffix"),
        col("sy").as(s"sy$suffix"), col("sxx").as(s"sxx$suffix"),
        col("sxy").as(s"sxy$suffix"), col("syy").as(s"syy$suffix"))
    val j = side(0, "a").crossJoin(broadcast(side(1, "b")))
    def ratio(sx: Column, sy: Column) = d(sx) / d(sy)
    def varR(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
        syy: Column) = {
      val nn = d(n)
      val r = ratio(sx, sy)
      val ybar = d(sy) / nn
      val mxx = (d(sxx) - d(sx) * d(sx) / nn) / (nn - lit(1.0))
      val mxy = (d(sxy) - d(sx) * d(sy) / nn) / (nn - lit(1.0))
      val myy = (d(syy) - d(sy) * d(sy) / nn) / (nn - lit(1.0))
      (mxx - lit(2.0) * r * mxy + r * r * myy) / (nn * ybar * ybar)
    }
    val ra = ratio(col("sxa"), col("sya"))
    val rb = ratio(col("sxb"), col("syb"))
    val va = varR(col("na"), col("sxa"), col("sya"), col("sxxa"),
      col("sxya"), col("syya"))
    val vb = varR(col("nb"), col("sxb"), col("syb"), col("sxxb"),
      col("sxyb"), col("syyb"))
    val z = (ra - rb) / sqrt(va + vb)
    j.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(ra, 6).as("ratio_a"), round(rb, 6).as("ratio_b"),
      round(ra - rb, 6).as("diff"),
      when(va + vb > 0, round(sqrt(va + vb), 6)).as("se"),
      when(va + vb > 0, round(z, 4)).as("z"),
      when(va + vb > 0, abs(z) > 1.96).as("sig_95"))
  }

  /** DuckDB mirror of [[ratioMetricAb]]. */
  def ratioMetricAbSql(tbl: String, userCol: String, typeCol: String,
      valCol: String, convType: String, salt: String = "arm"): String = {
    def varR(p: String) =
      s"""((sxx$p - CAST(sx$p AS DOUBLE) * sx$p / n$p) / (n$p - 1.0)
         - 2.0 * (CAST(sx$p AS DOUBLE) / sy$p)
           * ((sxy$p - CAST(sx$p AS DOUBLE) * sy$p / n$p) / (n$p - 1.0))
         + (CAST(sx$p AS DOUBLE) / sy$p) * (CAST(sx$p AS DOUBLE) / sy$p)
           * ((syy$p - CAST(sy$p AS DOUBLE) * sy$p / n$p) / (n$p - 1.0)))
        / (n$p * (CAST(sy$p AS DOUBLE) / n$p) * (CAST(sy$p AS DOUBLE) / n$p))"""
    s"""WITH pu AS (SELECT $userCol,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)}
             THEN CAST($valCol AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS x,
           CAST(SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) AS BIGINT) AS y
         FROM $tbl GROUP BY 1, 2),
       arms AS (SELECT arm, COUNT(*) AS n, SUM(x) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy, SUM(x * x) AS sxx,
           SUM(CAST(x * y AS DECIMAL(38,6))) AS sxy,
           CAST(SUM(y * y) AS BIGINT) AS syy
         FROM pu GROUP BY arm),
       a AS (SELECT CAST(n AS DOUBLE) AS na, CAST(sx AS DOUBLE) AS sxa,
           CAST(sy AS DOUBLE) AS sya, CAST(sxx AS DOUBLE) AS sxxa,
           CAST(sxy AS DOUBLE) AS sxya, CAST(syy AS DOUBLE) AS syya,
           n AS n_a FROM arms WHERE arm = 0),
       b AS (SELECT CAST(n AS DOUBLE) AS nb, CAST(sx AS DOUBLE) AS sxb,
           CAST(sy AS DOUBLE) AS syb, CAST(sxx AS DOUBLE) AS sxxb,
           CAST(sxy AS DOUBLE) AS sxyb, CAST(syy AS DOUBLE) AS syyb,
           n AS n_b FROM arms WHERE arm = 1),
       f AS (SELECT n_a, n_b,
           sxa / sya AS ra, sxb / syb AS rb,
           ${varR("a")} AS va, ${varR("b")} AS vb
         FROM a CROSS JOIN b)
       SELECT n_a, n_b, round(ra, 6) AS ratio_a, round(rb, 6) AS ratio_b,
         round(ra - rb, 6) AS diff,
         CASE WHEN va + vb > 0 THEN round(sqrt(va + vb), 6) END AS se,
         CASE WHEN va + vb > 0 THEN round((ra - rb) / sqrt(va + vb), 4) END AS z,
         CASE WHEN va + vb > 0
           THEN abs((ra - rb) / sqrt(va + vb)) > 1.96 END AS sig_95
       FROM f"""
  }

  /** Sample-ratio mismatch check (the experimentation-platform staple):
    * χ²(1) of the observed arm split against the designed 50/50. A
    * significant SRM means the assignment itself is broken (bot
    * filtering, logging loss, redirect asymmetry) and EVERY downstream
    * readout on this experiment is suspect — the test to run before any
    * of [[abConversion]]/[[oddsRatio]]/[[msprtAb]] is believed.
    */
  def srmCheck(df: DataFrame, userCol: String,
      salt: String = "arm"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val cells = df.select(col(userCol), arm).distinct()
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
    val n = d(col("n_a")) + d(col("n_b"))
    val chi2 = (d(col("n_a")) - d(col("n_b"))) *
      (d(col("n_a")) - d(col("n_b"))) / n
    cells.select(col("n_a"), col("n_b"),
      round(d(col("n_a")) / n, 6).as("share_a"),
      round(chi2, 4).as("chi2"),
      (chi2 > 3.841).as("srm_detected"))
  }

  /** DuckDB mirror of [[srmCheck]]. */
  def srmCheckSql(tbl: String, userCol: String,
      salt: String = "arm"): String =
    s"""WITH u AS (SELECT DISTINCT $userCol,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm
         FROM $tbl),
       c2 AS (SELECT
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
         FROM u),
       f AS (SELECT n_a, n_b,
           (CAST(n_a AS DOUBLE) - n_b) * (CAST(n_a AS DOUBLE) - n_b)
             / (CAST(n_a AS DOUBLE) + n_b) AS chi2
         FROM c2)
       SELECT n_a, n_b,
         round(CAST(n_a AS DOUBLE) / (n_a + n_b), 6) AS share_a,
         round(chi2, 4) AS chi2, chi2 > 3.841 AS srm_detected
       FROM f"""

  /** Φ(z) via the Abramowitz & Stegun 7.1.26 erf polynomial (|ε| <
    * 1.5e-7) — pure fixed-shape arithmetic both engines can evaluate
    * bit-consistently, unlike a native erf neither ships.
    */
  private def phiAs(z: Column): Column = {
    val x = abs(z) / lit(math.sqrt(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = (lit(0.254829592) * t - lit(0.284496736) * t * t +
      lit(1.421413741) * t * t * t - lit(1.453152027) * t * t * t * t +
      lit(1.061405429) * t * t * t * t * t)
    val erf = lit(1.0) - poly * exp(-(x * x))
    when(z >= 0, lit(0.5) * (lit(1.0) + erf))
      .otherwise(lit(0.5) * (lit(1.0) - erf))
  }

  /** Bayesian A/B readout (Beta-Binomial with uniform priors): posterior
    * conversion means and P(A beats B) via the normal approximation to
    * the posterior difference — the stakeholder-readable "there's a 97%
    * chance A is better" that a p-value is not. Same per-user integer
    * 2×2 as [[abConversion]]; Φ via the A&S erf polynomial so both
    * engines agree bit-for-bit.
    */
  def bayesAb(df: DataFrame, userCol: String, typeCol: String,
      convType: String, minCount: Int = 1, salt: String = "arm"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val pu = df.groupBy(col(userCol), arm)
      .agg((sum(when(col(typeCol) === convType, 1L).otherwise(0L)) >=
        minCount).as("conv"))
    val cells = pu.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0 && col("conv"), 1L).otherwise(0L)).as("c_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1 && col("conv"), 1L).otherwise(0L)).as("c_b"))
    def postMean(c: Column, n: Column) =
      (d(c) + lit(1.0)) / (d(n) + lit(2.0))
    def postVar(c: Column, n: Column) = {
      val m = postMean(c, n)
      m * (lit(1.0) - m) / (d(n) + lit(3.0))
    }
    val ma = postMean(col("c_a"), col("n_a"))
    val mb = postMean(col("c_b"), col("n_b"))
    val z = (ma - mb) / sqrt(postVar(col("c_a"), col("n_a")) +
      postVar(col("c_b"), col("n_b")))
    cells.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      round(ma, 6).as("post_mean_a"), round(mb, 6).as("post_mean_b"),
      round(phiAs(z), 6).as("p_a_beats_b"))
  }

  /** DuckDB mirror of [[bayesAb]] (same A&S 7.1.26 polynomial). */
  def bayesAbSql(tbl: String, userCol: String, typeCol: String,
      convType: String, minCount: Int = 1, salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) >= $minCount AS conv
         FROM $tbl GROUP BY 1, 2),
       c2 AS (SELECT
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c_b
         FROM pu),
       f AS (SELECT n_a, c_a, n_b, c_b,
           (CAST(c_a AS DOUBLE) + 1.0) / (n_a + 2.0) AS ma,
           (CAST(c_b AS DOUBLE) + 1.0) / (n_b + 2.0) AS mb,
           ((CAST(c_a AS DOUBLE) + 1.0) / (n_a + 2.0))
             * (1.0 - (CAST(c_a AS DOUBLE) + 1.0) / (n_a + 2.0)) / (n_a + 3.0)
           + ((CAST(c_b AS DOUBLE) + 1.0) / (n_b + 2.0))
             * (1.0 - (CAST(c_b AS DOUBLE) + 1.0) / (n_b + 2.0)) / (n_b + 3.0)
             AS v
         FROM c2),
       g AS (SELECT n_a, c_a, n_b, c_b, ma, mb,
           (ma - mb) / sqrt(v) AS z FROM f),
       h AS (SELECT n_a, c_a, n_b, c_b, ma, mb, z,
           abs(z) / sqrt(2.0) AS x FROM g),
       i AS (SELECT n_a, c_a, n_b, c_b, ma, mb, z, x,
           1.0 / (1.0 + 0.3275911 * x) AS t FROM h),
       j AS (SELECT n_a, c_a, n_b, c_b, ma, mb, z,
           1.0 - (0.254829592 * t - 0.284496736 * t * t
             + 1.421413741 * t * t * t - 1.453152027 * t * t * t * t
             + 1.061405429 * t * t * t * t * t) * exp(-(x * x)) AS erf
         FROM i)
       SELECT n_a, c_a, n_b, c_b,
         round(ma, 6) AS post_mean_a, round(mb, 6) AS post_mean_b,
         round(CASE WHEN z >= 0 THEN 0.5 * (1.0 + erf)
                    ELSE 0.5 * (1.0 - erf) END, 6) AS p_a_beats_b
       FROM j"""

  /** Odds ratio + risk ratio with Woolf log-CIs for the md5-arm × conversion
    * 2×2 — the epidemiology-standard readout alongside [[abConversion]]'s
    * z: the z answers "is there an effect", OR/RR answer "how big, on the
    * multiplicative scale a stakeholder compares across experiments".
    * CI95 via ln OR ± 1.96·√(1/a+1/b+1/c+1/d) (Woolf 1955) and the
    * analogous Katz interval for RR.
    *
    * Same per-user integer 2×2 as abConversion; one fixed double shape.
    */
  def oddsRatio(df: DataFrame, userCol: String, typeCol: String,
      convType: String, minCount: Int = 1, salt: String = "arm"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val pu = df.groupBy(col(userCol), arm)
      .agg((sum(when(col(typeCol) === convType, 1L).otherwise(0L)) >=
        minCount).as("conv"))
    val cells = pu.agg(
      sum(when(col("arm") === 0 && col("conv"), 1L).otherwise(0L)).as("a"),
      sum(when(col("arm") === 0 && !col("conv"), 1L).otherwise(0L)).as("b"),
      sum(when(col("arm") === 1 && col("conv"), 1L).otherwise(0L)).as("c"),
      sum(when(col("arm") === 1 && !col("conv"), 1L).otherwise(0L)).as("d"))
    val orv = (d(col("a")) * d(col("d"))) / (d(col("b")) * d(col("c")))
    val rr = (d(col("a")) / (d(col("a")) + d(col("b")))) /
      (d(col("c")) / (d(col("c")) + d(col("d"))))
    val seLnOr = sqrt(lit(1.0) / d(col("a")) + lit(1.0) / d(col("b")) +
      lit(1.0) / d(col("c")) + lit(1.0) / d(col("d")))
    val ok = col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0
    cells.select(col("a").as("conv_a"), col("b").as("noconv_a"),
      col("c").as("conv_b"), col("d").as("noconv_b"),
      when(ok, round(orv, 4)).as("odds_ratio"),
      when(ok, round(exp(log(orv) - lit(1.96) * seLnOr), 4)).as("or_lo95"),
      when(ok, round(exp(log(orv) + lit(1.96) * seLnOr), 4)).as("or_hi95"),
      when(ok, round(rr, 4)).as("risk_ratio"))
  }

  /** DuckDB mirror of [[oddsRatio]]. */
  def oddsRatioSql(tbl: String, userCol: String, typeCol: String,
      convType: String, minCount: Int = 1, salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) >= $minCount AS conv
         FROM $tbl GROUP BY 1, 2),
       c2 AS (SELECT
           CAST(SUM(CASE WHEN arm = 0 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN arm = 0 AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN arm = 1 AND conv THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN arm = 1 AND NOT conv THEN 1 ELSE 0 END) AS BIGINT) AS d
         FROM pu),
       f AS (SELECT a, b, c, d,
           (CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c) AS orv,
           (CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + d)) AS rr,
           sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d) AS se,
           a > 0 AND b > 0 AND c > 0 AND d > 0 AS ok
         FROM c2)
       SELECT a AS conv_a, b AS noconv_a, c AS conv_b, d AS noconv_b,
         CASE WHEN ok THEN round(orv, 4) END AS odds_ratio,
         CASE WHEN ok THEN round(exp(ln(orv) - 1.96 * se), 4) END AS or_lo95,
         CASE WHEN ok THEN round(exp(ln(orv) + 1.96 * se), 4) END AS or_hi95,
         CASE WHEN ok THEN round(rr, 4) END AS risk_ratio
       FROM f"""

  /** Permutation test (Fisher 1935) of the arm mean difference: the
    * EXACT-inference companion to [[abValueTtest]] — no normality, no
    * variance model, the null distribution is the data itself under B
    * deterministic relabelings. Each replica reassigns every USER (not
    * event — cluster-consistent, the same unit the real arm hash uses) via
    * md5("perm:r:user"), so both engines build bit-identical replicas
    * (the [[graft.operators.Bootstrap]] discipline applied to labels).
    * p = (1 + #{|Δ_r| ≥ |Δ_obs|}) / (B+1), the add-one unbiased form.
    *
    * Shape: one scan exploded ×B with map-side combine straight down to B
    * rows; diffs round to 6 pre-compare so the ≥ is deterministic.
    */
  def permutationTest(df: DataFrame, userCol: String, typeCol: String,
      valCol: String, convType: String, b: Int = 256,
      salt: String = "arm"): DataFrame = {
    require(b >= 16, "permutationTest: need b >= 16 replicas")
    def d(c: Column) = c.cast("double")
    val base = Dedup.parallelize(df).where(col(typeCol) === convType)
      .select(col(userCol).cast("string").as("u"),
        col(valCol).cast("decimal(18,6)").as("v"))
    def armOf(prefix: Column) =
      conv(substring(md5(concat(prefix, col("u"))), 1, 2), 16, 10)
        .cast("int") % 2
    def diffOf(grouped: DataFrame, keyCols: Seq[String]) = {
      val aggd = grouped
        .groupBy(keyCols.map(col): _*)
        .agg(sum(when(col("arm") === 0, col("v"))).as("s0"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 1, col("v"))).as("s1"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"))
      aggd.withColumn("diff",
        when(col("n0") > 0 && col("n1") > 0,
          round(d(col("s0")) / d(col("n0")) - d(col("s1")) / d(col("n1")), 6)))
    }
    val obs = diffOf(base.select(armOf(lit(salt + ":")).as("arm"), col("v")),
        Seq())
      .select(col("n0").as("n_a"), col("n1").as("n_b"),
        col("diff").as("diff_obs"))
    val reps = diffOf(
      base.select(col("u"), col("v"),
          explode(sequence(lit(0L), lit(b - 1L))).as("r"))
        .select(col("r"),
          armOf(concat(lit("perm:"), col("r").cast("string"), lit(":")))
            .as("arm"),
          col("v")),
      Seq("r"))
    reps.crossJoin(broadcast(obs))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(col("diff_obs")).as("da"),
        sum(when(col("diff").isNotNull, 1L).otherwise(0L)).as("b_valid"),
        sum(when(col("diff").isNotNull &&
          abs(col("diff")) >= abs(col("diff_obs")), 1L).otherwise(0L))
          .as("n_ge"))
      .select(col("n_a"), col("n_b"), col("da").as("diff_obs"),
        lit(b.toLong).as("b"), col("b_valid"),
        round((d(col("n_ge")) + lit(1.0)) / (d(col("b_valid")) + lit(1.0)), 6)
          .as("p_value"))
  }

  /** DuckDB mirror of [[permutationTest]]. */
  def permutationTestSql(tbl: String, userCol: String, typeCol: String,
      valCol: String, convType: String, b: Int = 256,
      salt: String = "arm"): String =
    s"""WITH base AS (SELECT CAST($userCol AS VARCHAR) AS u,
           CAST($valCol AS DECIMAL(18,6)) AS v
         FROM $tbl WHERE $typeCol = ${OracleSql.lit(convType)}),
       oarm AS (SELECT CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||u),1,2) AS INT) % 2 AS arm, v
         FROM base),
       obs AS (SELECT
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           round(CAST(SUM(CASE WHEN arm = 0 THEN v END) AS DOUBLE)
               / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
             - CAST(SUM(CASE WHEN arm = 1 THEN v END) AS DOUBLE)
               / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 6) AS diff_obs
         FROM oarm),
       reps AS (SELECT r,
           CAST('0x'||substr(md5('perm:'||CAST(r AS VARCHAR)||':'||u),1,2) AS INT) % 2 AS arm,
           v
         FROM base CROSS JOIN range($b) AS t(r)),
       rd AS (SELECT r,
           CASE WHEN SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) > 0
                 AND SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) > 0
             THEN round(CAST(SUM(CASE WHEN arm = 0 THEN v END) AS DOUBLE)
                 / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
               - CAST(SUM(CASE WHEN arm = 1 THEN v END) AS DOUBLE)
                 / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 6) END AS diff
         FROM reps GROUP BY r)
       SELECT n_a, n_b, diff_obs, CAST($b AS BIGINT) AS b,
         CAST(SUM(CASE WHEN diff IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS b_valid,
         round((CAST(SUM(CASE WHEN diff IS NOT NULL
               AND abs(diff) >= abs(diff_obs) THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
           / (CAST(SUM(CASE WHEN diff IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) + 1.0),
           6) AS p_value
       FROM rd CROSS JOIN obs
       GROUP BY n_a, n_b, diff_obs"""

  def abValueTtest(df: DataFrame, userCol: String, typeCol: String,
      valCol: String, convType: String, salt: String = "arm"): DataFrame = {
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val x = col(valCol).cast("decimal(18,6)")
    val arms = df.where(col(typeCol) === convType)
      .select(arm, x.as("x"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val a = arms.where(col("arm") === 0)
      .select(col("n").as("n_a"), col("sx").as("sx_a"), col("sxx").as("sxx_a"))
    val b = arms.where(col("arm") === 1)
      .select(col("n").as("n_b"), col("sx").as("sx_b"), col("sxx").as("sxx_b"))
    def m(sx: Column, n: Column) = sx.cast("double") / n.cast("double")
    def v(sxx: Column, sx: Column, n: Column) =
      (sxx.cast("double") - sx.cast("double") * sx.cast("double") / n.cast("double")) /
        (n.cast("double") - 1.0)
    val (ma, mb) = (m(col("sx_a"), col("n_a")), m(col("sx_b"), col("n_b")))
    val (va, vb) = (v(col("sxx_a"), col("sx_a"), col("n_a")),
      v(col("sxx_b"), col("sx_b"), col("n_b")))
    val (wa, wb) = (va / col("n_a").cast("double"), vb / col("n_b").cast("double"))
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("n_b"),
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        round((ma - mb) / sqrt(greatest(wa + wb, lit(1e-12))), 4).as("t"),
        round((wa + wb) * (wa + wb) /
          greatest(wa * wa / (col("n_a").cast("double") - 1.0) +
            wb * wb / (col("n_b").cast("double") - 1.0), lit(1e-12)), 2).as("df"))
  }

  /** TRIMMED-mean A/B readout: per-arm means of the conversion values
    * with the pooled tails cut at the [lo, hi] percentiles — the robust
    * metric large experiment platforms report beside the raw mean (one
    * whale order drags a mean arbitrarily; the 5–95 trimmed mean has a
    * bounded influence function). Thresholds come from the POOLED
    * distribution (both arms), so trimming is assignment-independent and
    * cannot itself induce an arm difference.
    *
    * Exactness: thresholds are exact percentiles rounded to 4 (the
    * percentiles-query convention), the gate compares against the
    * rounded values in both engines, and the kept-row means are
    * DECIMAL-exact sums divided once in double.
    */
  def trimmedMeanAb(df: DataFrame, userCol: String, typeCol: String,
      valCol: String, convType: String, lo: Double = 0.05,
      hi: Double = 0.95, salt: String = "arm"): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "trimmedMeanAb: bad trim bounds")
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val conv_ = df.where(col(typeCol) === convType)
      .select(arm, col(valCol).cast("double").as("v"))
    val th = conv_
      .agg(expr(s"percentile(v, array($lo, $hi))").as("_q"))
      .select(round(col("_q").getItem(0), 4).as("q_lo"),
        round(col("_q").getItem(1), 4).as("q_hi"))
    val kept = conv_.crossJoin(broadcast(th))
      .where(col("v") >= col("q_lo") && col("v") <= col("q_hi"))
    val arms = kept.groupBy("arm").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,6)")).as("s"))
    val a = arms.where(col("arm") === 0)
      .select(col("n").as("n_a"), col("s").as("s_a"))
    val b = arms.where(col("arm") === 1)
      .select(col("n").as("n_b"), col("s").as("s_b"))
    val ma = col("s_a").cast("double") / col("n_a").cast("double")
    val mb = col("s_b").cast("double") / col("n_b").cast("double")
    a.crossJoin(broadcast(b)).crossJoin(broadcast(th))
      .select(col("q_lo"), col("q_hi"), col("n_a"), col("n_b"),
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        round(ma - mb, 6).as("diff"))
  }

  /** DuckDB mirror of [[trimmedMeanAb]]. */
  def trimmedMeanAbSql(tbl: String, userCol: String, typeCol: String,
      valCol: String, convType: String, lo: Double = 0.05,
      hi: Double = 0.95, salt: String = "arm"): String =
    s"""WITH c AS (SELECT
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CAST($valCol AS DOUBLE) AS v
         FROM $tbl WHERE $typeCol = ${OracleSql.lit(convType)}),
       th AS (SELECT round(quantile_cont(v, $lo), 4) AS q_lo,
           round(quantile_cont(v, $hi), 4) AS q_hi FROM c),
       kept AS (SELECT arm, v FROM c CROSS JOIN th
         WHERE v >= q_lo AND v <= q_hi),
       arms AS (SELECT arm, COUNT(*) AS n,
           SUM(CAST(v AS DECIMAL(18,6))) AS s FROM kept GROUP BY arm),
       a AS (SELECT n AS n_a, s AS s_a FROM arms WHERE arm = 0),
       b AS (SELECT n AS n_b, s AS s_b FROM arms WHERE arm = 1)
       SELECT q_lo, q_hi, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS mean_a,
         round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS mean_b,
         round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS diff
       FROM a CROSS JOIN b CROSS JOIN th"""

  /** DuckDB mirror of [[abValueTtest]]. */
  def abValueTtestSql(tbl: String, userCol: String, typeCol: String,
      valCol: String, convType: String, salt: String = "arm"): String =
    s"""WITH e AS (SELECT
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CAST($valCol AS DECIMAL(18,6)) AS x
         FROM $tbl WHERE $typeCol = ${OracleSql.lit(convType)}),
       arms AS (SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
         FROM e GROUP BY arm),
       a AS (SELECT n AS n_a, sx AS sx_a, sxx AS sxx_a FROM arms WHERE arm = 0),
       b AS (SELECT n AS n_b, sx AS sx_b, sxx AS sxx_b FROM arms WHERE arm = 1),
       s AS (SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
           CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
           (CAST(sxx_a AS DOUBLE) - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))
             / (CAST(n_a AS DOUBLE) - 1.0) / CAST(n_a AS DOUBLE) AS wa,
           (CAST(sxx_b AS DOUBLE) - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / (CAST(n_b AS DOUBLE) - 1.0) / CAST(n_b AS DOUBLE) AS wb
         FROM a CROSS JOIN b)
       SELECT n_a, n_b, round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
         round((ma - mb) / sqrt(greatest(wa + wb, 1e-12)), 4) AS t,
         round((wa + wb) * (wa + wb) /
           greatest(wa * wa / (CAST(n_a AS DOUBLE) - 1.0) +
             wb * wb / (CAST(n_b AS DOUBLE) - 1.0), 1e-12), 2) AS df
       FROM s"""

  /** Mann-Whitney U (Wilcoxon rank-sum) between the two md5 arms on the
    * conversion-value metric — the distribution-free companion to
    * [[abValueTtest]]: no normality assumption, robust to the heavy right
    * tail purchase values always have. Tie-corrected normal approximation
    * with continuity correction, plus Cliff's delta (= 2U/(n₁n₂) − 1),
    * the effect size U already determines.
    *
    * Exactness/scale: values are DECIMAL(18,6), so the engine collapses
    * the metric to its VALUE TYPE TABLE first (the [[Audit.scoreAuc]]
    * discipline — U never enumerates pairs and no per-row global rank is
    * assigned); 2U and the tie cubes fold as DECIMAL(38,0) integers, and
    * the single ordered window runs over value groups, not rows. Floating
    * point enters only in the final variance/z arithmetic, one fixed op
    * order in both engines.
    */
  def mannWhitney(df: DataFrame, userCol: String, typeCol: String,
      valCol: String, convType: String, salt: String = "arm"): DataFrame = {
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val byV = df.where(col(typeCol) === convType)
      .select(arm, col(valCol).cast("decimal(18,6)").as("s"))
      .groupBy("s")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"))
    val w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    val terms = byV
      .withColumn("cum1", coalesce(sum(col("c1")).over(w), lit(0L)))
      .select(col("c0"), col("c1"),
        (col("c0") * (col("cum1") * 2 + col("c1"))).cast("decimal(38,0)").as("u2t"),
        ((col("c0") + col("c1")) * (col("c0") + col("c1")) * (col("c0") + col("c1"))
          - (col("c0") + col("c1"))).cast("decimal(38,0)").as("t3t"))
    def d(c: Column) = c.cast("double")
    val agg = terms.agg(sum(col("c0")).as("n_a"), sum(col("c1")).as("n_b"),
      sum(col("u2t")).as("u2"), sum(col("t3t")).as("t3"))
    val (na, nb) = (d(col("n_a")), d(col("n_b")))
    val bigN = na + nb
    val varU = (na * nb / lit(12.0)) *
      ((bigN + lit(1.0)) - d(col("t3")) / (bigN * (bigN - lit(1.0))))
    val diff2 = d(col("u2")) - na * nb // 2·(U − mean)
    val z = when(diff2 === 0.0, lit(0.0))
      .otherwise((diff2 - signum(diff2)) / (lit(2.0) * sqrt(varU)))
    agg.select(col("n_a"), col("n_b"),
      round(d(col("u2")) / lit(2.0), 1).as("u"),
      round(d(col("u2")) / (na * nb) - lit(1.0), 6).as("cliff_delta"),
      when(varU > 0, round(z, 4)).as("z"),
      when(varU > 0, abs(z) > lit(1.96)).as("sig_95"),
      when(varU > 0, abs(z) > lit(2.576)).as("sig_99"))
  }

  /** DuckDB mirror of [[mannWhitney]]. */
  def mannWhitneySql(tbl: String, userCol: String, typeCol: String,
      valCol: String, convType: String, salt: String = "arm"): String =
    s"""WITH e AS (SELECT
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CAST($valCol AS DECIMAL(18,6)) AS s
         FROM $tbl WHERE $typeCol = ${OracleSql.lit(convType)}),
       byv AS (SELECT s,
           SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
           SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
         FROM e GROUP BY s),
       terms AS (SELECT c0, c1,
           CAST(c0 * (COALESCE(SUM(c1) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 2 + c1)
             AS DECIMAL(38,0)) AS u2t,
           CAST((c0 + c1) * (c0 + c1) * (c0 + c1) - (c0 + c1)
             AS DECIMAL(38,0)) AS t3t
         FROM byv),
       agg AS (SELECT CAST(SUM(c0) AS BIGINT) AS n_a, CAST(SUM(c1) AS BIGINT) AS n_b,
           SUM(u2t) AS u2, SUM(t3t) AS t3 FROM terms),
       f AS (SELECT n_a, n_b,
           CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
           CAST(u2 AS DOUBLE) AS u2d, CAST(t3 AS DOUBLE) AS t3d
         FROM agg),
       g AS (SELECT n_a, n_b, na, nb, u2d,
           (na * nb / 12.0) * ((na + nb + 1.0) - t3d / ((na + nb) * (na + nb - 1.0))) AS varu,
           u2d - na * nb AS diff2
         FROM f)
       SELECT n_a, n_b,
         round(u2d / 2.0, 1) AS u,
         round(u2d / (na * nb) - 1.0, 6) AS cliff_delta,
         CASE WHEN varu > 0 THEN round(CASE WHEN diff2 = 0.0 THEN 0.0
           ELSE (diff2 - sign(diff2)) / (2.0 * sqrt(varu)) END, 4) END AS z,
         CASE WHEN varu > 0 THEN abs(CASE WHEN diff2 = 0.0 THEN 0.0
           ELSE (diff2 - sign(diff2)) / (2.0 * sqrt(varu)) END) > 1.96 END AS sig_95,
         CASE WHEN varu > 0 THEN abs(CASE WHEN diff2 = 0.0 THEN 0.0
           ELSE (diff2 - sign(diff2)) / (2.0 * sqrt(varu)) END) > 2.576 END AS sig_99
       FROM g"""

  /** DuckDB mirror of [[abConversion]]. */
  def abConversionSql(tbl: String, userCol: String, typeCol: String,
      convType: String, minCount: Int = 1, salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol AS u,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CASE WHEN SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) >= $minCount
                THEN 1 ELSE 0 END AS converted
         FROM $tbl GROUP BY 1, 2),
       arms AS (SELECT arm, COUNT(*) AS n, SUM(converted) AS c FROM pu GROUP BY arm),
       a AS (SELECT n AS n_a, c AS c_a FROM arms WHERE arm = 0),
       b AS (SELECT n AS n_b, c AS c_b FROM arms WHERE arm = 1)
       SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
         CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
         round(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS conv_a,
         round(CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS conv_b,
         round((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
           sqrt(greatest((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)), 1e-12)), 4) AS z
       FROM a CROSS JOIN b"""

  /** Always-valid (anytime) A/B readout via the mixture sequential
    * probability ratio test — mSPRT (Johari, Koomen, Pekelis, Walsh,
    * KDD 2017 / "Always Valid Inference"; the construction behind
    * industrial sequential stats engines). The fixed-n z-test's p-value is
    * only valid at a PRE-COMMITTED sample size; peeking every day inflates
    * false positives badly. The mSPRT likelihood ratio
    * Λ = √(se²/(se²+τ²)) · exp(θ̂²τ² / (2·se²·(se²+τ²))) is a
    * nonnegative supermartingale under H0: θ=0, so p_av = min(1, 1/Λ) is
    * valid at EVERY interim look simultaneously — the experiment can stop
    * the moment it crosses α.
    *
    * θ̂ is the conversion-rate difference between the md5 arms, se² its
    * plug-in variance, τ² the mixture scale (a fixed analysis constant).
    * Everything derives from the same integer per-arm counts as
    * [[abConversion]] in one fixed double-arithmetic shape; Λ and p_av
    * round to 6. Same scan shape: per-user agg → 2-row rollup → one row.
    */
  def msprtAb(df: DataFrame, userCol: String, typeCol: String,
      convType: String, tauSq: Double = 0.01, minCount: Int = 1,
      salt: String = "arm"): DataFrame = {
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val perUser = df.select(col(userCol).as("u"), arm,
        (col(typeCol) === convType).cast("int").as("cv"))
      .groupBy("u", "arm")
      .agg((sum("cv") >= minCount).cast("int").as("converted"))
    val arms = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("converted").as("c"))
    val a = arms.where(col("arm") === 0).select(col("n").as("n_a"), col("c").as("c_a"))
    val b = arms.where(col("arm") === 1).select(col("n").as("n_b"), col("c").as("c_b"))
    val pa = col("c_a").cast("double") / col("n_a").cast("double")
    val pb = col("c_b").cast("double") / col("n_b").cast("double")
    val theta = pb - pa
    // 1e-12 variance floor (the abConversion convention) for the
    // degenerate all-convert / none-convert arms
    val seSq = greatest(
      pa * (lit(1.0) - pa) / col("n_a").cast("double") +
        pb * (lit(1.0) - pb) / col("n_b").cast("double"), lit(1e-12))
    val lam = sqrt(seSq / (seSq + lit(tauSq))) *
      exp(theta * theta * lit(tauSq) / (lit(2.0) * seSq * (seSq + lit(tauSq))))
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        round(theta, 6).as("theta"),
        round(lam, 6).as("lambda"),
        round(least(lit(1.0) / lam, lit(1.0)), 6).as("p_always_valid"),
        (least(lit(1.0) / lam, lit(1.0)) < lit(0.05)).as("significant"))
  }

  /** DuckDB mirror of [[msprtAb]]. */
  def msprtAbSql(tbl: String, userCol: String, typeCol: String,
      convType: String, tauSq: Double = 0.01, minCount: Int = 1,
      salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol AS u,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CASE WHEN SUM(CASE WHEN $typeCol = ${OracleSql.lit(convType)} THEN 1 ELSE 0 END) >= $minCount
                THEN 1 ELSE 0 END AS converted
         FROM $tbl GROUP BY 1, 2),
       arms AS (SELECT arm, COUNT(*) AS n, SUM(converted) AS c FROM pu GROUP BY arm),
       a AS (SELECT n AS n_a, c AS c_a FROM arms WHERE arm = 0),
       b AS (SELECT n AS n_b, c AS c_b FROM arms WHERE arm = 1),
       s AS (SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
           CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS theta,
           greatest(
             (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
               * (1.0 - CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / CAST(n_a AS DOUBLE)
             + (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               * (1.0 - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / CAST(n_b AS DOUBLE),
             1e-12) AS se_sq
         FROM a CROSS JOIN b),
       l AS (SELECT *, sqrt(se_sq / (se_sq + $tauSq))
             * exp(theta * theta * $tauSq / (2.0 * se_sq * (se_sq + $tauSq))) AS lam
         FROM s)
       SELECT n_a, c_a, n_b, c_b, round(theta, 6) AS theta,
         round(lam, 6) AS lambda,
         round(least(1.0 / lam, 1.0), 6) AS p_always_valid,
         least(1.0 / lam, 1.0) < 0.05 AS significant
       FROM l"""

  /** Experiment sample-size planner (fixed-n power analysis, the standard
    * two-sample normal approximation): given the CURRENT per-arm user-value
    * moments, the per-arm n required to detect a `liftFrac` relative lift
    * of the pooled mean at two-sided α = 0.05 with power 0.8:
    *   n = (z_{α/2} + z_β)² · (s²_a + s²_b) / δ²,  δ = liftFrac · pooled mean.
    * The planning readout that should gate STARTING an experiment — an A/B
    * run without it either wastes traffic or is doomed to inconclusiveness.
    * Same DECIMAL moment folds as [[abValueTtest]]; z constants are fixed
    * literals so both engines compute one identical double shape.
    */
  def powerPlanner(df: DataFrame, userCol: String, valCol: String,
      liftFrac: Double = 0.05, salt: String = "arm"): DataFrame = {
    val zAlpha = 1.959964 // two-sided 0.05
    val zBeta = 0.841621  // power 0.8
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val perUser = df.select(col(userCol).as("u"), arm,
        col(valCol).cast("decimal(18,6)").as("v"))
      .groupBy("u", "arm")
      .agg(sum(col("v")).cast("decimal(18,6)").as("y"))
    val arms = perUser.groupBy("arm").agg(
      count(lit(1)).as("n"), sum(col("y")).as("sy"),
      sum(col("y") * col("y")).as("syy"))
    val a = arms.where(col("arm") === 0).select(col("n").as("n_a"),
      col("sy").as("sy_a"), col("syy").as("syy_a"))
    val b = arms.where(col("arm") === 1).select(col("n").as("n_b"),
      col("sy").as("sy_b"), col("syy").as("syy_b"))
    def d(c: Column) = c.cast("double")
    val na = d(col("n_a")); val nb = d(col("n_b"))
    val pooledMean = (d(col("sy_a")) + d(col("sy_b"))) / (na + nb)
    val varA = (d(col("syy_a")) - d(col("sy_a")) * d(col("sy_a")) / na) / (na - 1.0)
    val varB = (d(col("syy_b")) - d(col("sy_b")) * d(col("sy_b")) / nb) / (nb - 1.0)
    val delta = greatest(abs(pooledMean) * lit(liftFrac), lit(1e-12))
    val zz = lit((zAlpha + zBeta) * (zAlpha + zBeta))
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("n_b"),
        round(pooledMean, 6).as("pooled_mean"),
        round(varA, 6).as("var_a"), round(varB, 6).as("var_b"),
        round(delta, 6).as("delta"),
        ceil(zz * (varA + varB) / (delta * delta)).cast("bigint")
          .as("n_required_per_arm"))
  }

  /** DuckDB mirror of [[powerPlanner]]. */
  def powerPlannerSql(tbl: String, userCol: String, valCol: String,
      liftFrac: Double = 0.05, salt: String = "arm"): String = {
    val zz = (1.959964 + 0.841621) * (1.959964 + 0.841621)
    s"""WITH pu AS (SELECT $userCol AS u,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CAST(SUM(CAST($valCol AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
         FROM $tbl GROUP BY 1, 2),
       arms AS (SELECT arm, COUNT(*) AS n, SUM(y) AS sy,
           SUM(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS syy
         FROM pu GROUP BY arm),
       a AS (SELECT n AS n_a, sy AS sy_a, syy AS syy_a FROM arms WHERE arm = 0),
       b AS (SELECT n AS n_b, sy AS sy_b, syy AS syy_b FROM arms WHERE arm = 1),
       s AS (SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           (CAST(sy_a AS DOUBLE) + CAST(sy_b AS DOUBLE))
             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pooled_mean,
           (CAST(syy_a AS DOUBLE) - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE)
              / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
           (CAST(syy_b AS DOUBLE) - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE)
              / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS var_b
         FROM a CROSS JOIN b),
       s2 AS (SELECT *, greatest(abs(pooled_mean) * $liftFrac, 1e-12) AS delta FROM s)
       SELECT n_a, n_b, round(pooled_mean, 6) AS pooled_mean,
         round(var_a, 6) AS var_a, round(var_b, 6) AS var_b,
         round(delta, 6) AS delta,
         CAST(ceil($zz * (var_a + var_b) / (delta * delta)) AS BIGINT)
           AS n_required_per_arm
       FROM s2"""
  }

  /** DuckDB mirror of [[pathTrigrams]]. */
  def pathTrigramsSql(tbl: String, userCol: String, tsCol: String,
      typeCol: String, idCol: String, topN: Int): String =
    s"""WITH p AS (SELECT $typeCol AS s1,
           lead($typeCol, 1) OVER w AS s2, lead($typeCol, 2) OVER w AS s3
         FROM $tbl
         WINDOW w AS (PARTITION BY $userCol ORDER BY $tsCol, $idCol))
       SELECT s1, s2, s3, COUNT(*) AS n FROM p WHERE s3 IS NOT NULL
       GROUP BY 1, 2, 3 ORDER BY n DESC, s1, s2, s3 LIMIT $topN"""
}
