package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal stream diagnostics over event logs. */
object Temporal {

  /** Per-key burstiness as the Fano factor (variance/mean of per-bucket
    * event counts over the corpus's full time range — 1.0 for a Poisson
    * stream, ≫1 for bursty arrivals, the standard dispersion diagnostic
    * for ingest anomaly triage).
    *
    * Shape: NOTHING is ordered and nothing windows — inter-arrival-gap
    * formulations need a per-key `lag` over event order, an unsplittable
    * per-key sort at corpus scale; bucket counting is two map-side-
    * combinable aggregations plus one broadcast scalar. Empty buckets
    * count as zeros WITHOUT materializing them: with B total buckets and
    * per-bucket counts c_i (zeros included),
    * var = (Σc² − (Σc)²/B) / B — only non-empty buckets contribute to Σc²
    * and Σc, so the observed (key, bucket) relation suffices.
    */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "burstiness: bucketSeconds must be positive")
    val bucket = floor(unix_seconds(col(tsCol)) / bucketSeconds)
    val perBucket = df
      .select(col(keyCol).as("key"), bucket.as("b"))
      .groupBy("key", "b").agg(count(lit(1)).as("c"))
    // the corpus-wide bucket span (shared across keys: a key silent for a
    // day IS bursty relative to the stream it belongs to)
    val span = df.agg(
      ((floor(unix_seconds(max(col(tsCol))) / bucketSeconds) -
        floor(unix_seconds(min(col(tsCol))) / bucketSeconds)) + 1).as("n_buckets"))
    perBucket
      .groupBy("key")
      .agg(sum("c").as("n_events"),
        sum(col("c") * col("c")).as("_t_sumsq"))
      .crossJoin(broadcast(span))
      .select(col("key").as(keyCol), col("n_events"), col("n_buckets"),
        round(
          (col("_t_sumsq").cast("double") -
            col("n_events").cast("double") * col("n_events").cast("double") /
              col("n_buckets").cast("double")) /
            col("n_buckets").cast("double") /
            (col("n_events").cast("double") / col("n_buckets").cast("double")),
          4).as("fano"))
  }

  /** Event-rate anomaly gate: per (key, time-bucket) counts z-scored
    * against the key's TRAILING `lookback` observed buckets (rows-frame,
    * excluding the current one); buckets with |z| above `zThresh` — traffic
    * spikes and droughts — are returned for alerting.
    *
    * Determinism: every statistic derives from integer counts (exact sums;
    * std via the Σc²−(Σc)²/n closed form), so both engines compute
    * bit-identical doubles; z rounds to 4. Buckets with fewer than
    * `lookback` PRIOR observed buckets are warm-up and not judged.
    *
    * Shape: one map-side-combinable (key, bucket) count, then one window
    * per key ordered by bucket — partitions are bucket-count-sized (time
    * range / bucket width), bounded regardless of event volume. "Trailing"
    * means observed buckets: an hour with zero events of a key does not
    * appear in its history (the closed-form Fano diagnostic above is the
    * empty-bucket-aware companion).
    */
  def rateAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      bucketSeconds: Long, lookback: Int, zThresh: Double): DataFrame = {
    require(bucketSeconds > 0 && lookback > 1, "rateAnomaly: bad params")
    import org.apache.spark.sql.expressions.Window
    val bucket = floor(unix_seconds(col(tsCol)) / bucketSeconds)
    val perBucket = df
      .select(col(keyCol).as("key"), bucket.as("b"))
      .groupBy("key", "b").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("key").orderBy("b").rowsBetween(-lookback, -1)
    val stats = perBucket
      .withColumn("n_hist", count(lit(1)).over(w))
      .withColumn("s1", sum("c").over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .where(col("n_hist") === lookback)
    val mean = col("s1").cast("double") / lookback
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / lookback) / lookback
    stats
      .select(col("key").as(keyCol), (col("b") * bucketSeconds * 1000).as("bucket_ms"),
        col("c").as("n"),
        round((col("c").cast("double") - mean) /
          sqrt(greatest(variance, lit(1e-12))), 4).as("z"))
      .where(abs(col("z")) > zThresh)
      .orderBy(keyCol, "bucket_ms")
  }

  /** DuckDB mirror of [[rateAnomaly]]. */
  def rateAnomalySql(tbl: String, keyCol: String, tsCol: String,
      bucketSeconds: Long, lookback: Int, zThresh: Double): String =
    s"""WITH pb AS (SELECT $keyCol AS key,
            CAST(floor(epoch($tsCol) / $bucketSeconds) AS BIGINT) AS b, COUNT(*) AS c
          FROM $tbl GROUP BY 1, 2),
       st AS (SELECT key, b, c,
                COUNT(*) OVER w AS n_hist, SUM(c) OVER w AS s1, SUM(c*c) OVER w AS s2
              FROM pb
              WINDOW w AS (PARTITION BY key ORDER BY b
                ROWS BETWEEN $lookback PRECEDING AND 1 PRECEDING)),
       z AS (SELECT key AS $keyCol, b * ${bucketSeconds * 1000} AS bucket_ms,
               CAST(c AS BIGINT) AS n,
               round((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / $lookback) /
                 sqrt(greatest((CAST(s2 AS DOUBLE) -
                   CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / $lookback) / $lookback,
                   1e-12)), 4) AS z
             FROM st WHERE n_hist = $lookback)
       SELECT * FROM z WHERE abs(z) > $zThresh ORDER BY $keyCol, bucket_ms"""

  /** DuckDB mirror of [[burstiness]]. */
  def burstinessSql(tbl: String, keyCol: String, tsCol: String,
      bucketSeconds: Long): String =
    s"""WITH pb AS (SELECT $keyCol AS key,
            CAST(floor(epoch($tsCol) / $bucketSeconds) AS BIGINT) AS b, COUNT(*) AS c
          FROM $tbl GROUP BY 1, 2),
        span AS (SELECT CAST(floor(epoch(max($tsCol)) / $bucketSeconds) AS BIGINT) -
                        CAST(floor(epoch(min($tsCol)) / $bucketSeconds) AS BIGINT) + 1 AS n_buckets
                 FROM $tbl),
        agg AS (SELECT key, SUM(c) AS n_events, SUM(c * c) AS sumsq FROM pb GROUP BY key)
        SELECT key AS $keyCol, CAST(n_events AS BIGINT) AS n_events, n_buckets,
          round((CAST(sumsq AS DOUBLE) -
                 CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE) / CAST(n_buckets AS DOUBLE))
                / CAST(n_buckets AS DOUBLE)
                / (CAST(n_events AS DOUBLE) / CAST(n_buckets AS DOUBLE)), 4) AS fano
        FROM agg CROSS JOIN span ORDER BY $keyCol"""

  /** Daily gap fill with forward fill (time-series densification): per key,
    * the daily value series on a COMPLETE day grid between that key's first
    * and last active day, missing days carrying the last observed value —
    * the resample-and-ffill primitive behind per-entity rate dashboards and
    * any model that needs a dense regular series from a sparse event log.
    *
    * Shape: daily totals are one map-side-combinable (key, day) aggregation;
    * the grid materializes per key via `sequence()` explode (output is
    * Σ per-key span-days — the densified series itself, nothing bigger);
    * the fill is one `last(_, ignoreNulls)` window per key ordered by day.
    * Per-key windows sort only that key's days (bounded by the calendar
    * span, never the event count) — no global sort anywhere. Daily sums
    * accumulate via DECIMAL(18,6), so partitioning cannot reorder float
    * addition.
    */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valCol).cast("decimal(18,6)")).cast("double").as("v"))
    val span = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        round(last(col("v"), ignoreNulls = true).over(w), 6).as("v_fill"),
        col("v").isNull.as("filled"))
      .orderBy(keyCol, "day")
  }

  /** Per-key linear trend of DAILY event counts (is this stream growing,
    * shrinking, or flat?): OLS slope of count-vs-day-index over the
    * corpus's full calendar span, with EMPTY days participating as zeros
    * WITHOUT being materialized — the [[burstiness]] closed-form trick
    * applied to regression: with x = 0..D−1 over all days, Σx and Σx² are
    * closed-form in D, Σy is the key's event total, and Σxy only receives
    * contributions from non-empty days. One (key, day) aggregation, one
    * bounded fold; every statistic integer-derived, so both engines emit
    * identical doubles.
    */
  def dailyTrend(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("long").as("d"))
    val withX = daily.crossJoin(broadcast(span))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
    val g = withX.groupBy(col(keyCol))
      .agg(max(col("d")).as("days"),
        sum(col("c")).as("n_events"),
        sum(col("x").cast("double") * col("c").cast("double")).as("_sxy"))
    val dd = col("days").cast("double")
    val sx = dd * (dd - 1.0) / 2.0
    val sxx = dd * (dd - 1.0) * (dd * 2.0 - 1.0) / 6.0
    g.select(col(keyCol), col("days"), col("n_events"),
        // single-day span: OLS denominator is 0 (0/0) and the slope is
        // undefined; emit NULL explicitly so both engines agree instead of
        // relying on each engine's division-by-zero convention
        when(col("days") > 1,
          round(
            (col("_sxy") - sx * col("n_events").cast("double") / dd) /
              (sxx - sx * sx / dd), 6)).otherwise(lit(null).cast("double"))
          .as("slope_per_day"),
        round(col("n_events").cast("double") / dd, 6).as("mean_per_day"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[dailyTrend]]. */
  def dailyTrendSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
         span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
             CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
               MAX(CAST($tsCol AS DATE))) + 1 AS BIGINT) AS d
           FROM $tbl),
         wx AS (SELECT $keyCol, c,
             CAST(date_diff('day', d0, day) AS BIGINT) AS x, d
           FROM daily CROSS JOIN span),
         a AS (SELECT $keyCol, MAX(d) AS days, SUM(c) AS n_events,
             SUM(CAST(x AS DOUBLE) * CAST(c AS DOUBLE)) AS sxy,
             CAST(MAX(d) AS DOUBLE) AS dd
           FROM wx GROUP BY $keyCol)
         SELECT $keyCol, CAST(days AS BIGINT) AS days,
           CAST(n_events AS BIGINT) AS n_events,
           CASE WHEN days > 1 THEN
             round((sxy - (dd * (dd - 1.0) / 2.0) * CAST(n_events AS DOUBLE) / dd)
               / ((dd * (dd - 1.0) * (2.0 * dd - 1.0) / 6.0)
                  - (dd * (dd - 1.0) / 2.0) * (dd * (dd - 1.0) / 2.0) / dd), 6)
             ELSE NULL END AS slope_per_day,
           round(CAST(n_events AS DOUBLE) / dd, 6) AS mean_per_day
         FROM a ORDER BY $keyCol"""

  /** CUSUM change-point detection over per-key DAILY counts: the day where
    * the cumulative deviation from the key's mean daily rate peaks — the
    * level-shift detector ("traffic doubled on the 14th") that a local
    * z-score gate ([[rateAnomaly]]) structurally cannot see, because after
    * a shift every bucket is normal RELATIVE TO ITS NEIGHBORS.
    *
    * Gap-aware WITHOUT densification: with mean μ = N/D over the full
    * span, CUSUM declines linearly by μ per empty day, so on any gap the
    * extremum sits at an endpoint — it suffices to evaluate CUSUM at each
    * ACTIVE day x (cum − μ·(x+1)) and at the day before the next active
    * day x'−1 (cum − μ·x'), one lead() over the per-key DAY relation
    * (calendar-span-bounded). All inputs integer-derived; argmax
    * tie-breaks on the earliest day, so the answer is total-ordered.
    */
  def changepoint(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("long").as("d"))
    val totals = daily.groupBy(col(keyCol)).agg(sum(col("c")).as("n"))
    val w = Window.partitionBy(keyCol).orderBy("day")
    val rel = daily.crossJoin(broadcast(span))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("x_next", lead(col("x"), 1).over(w))
      .withColumn("x_prev", lag(col("x"), 1).over(w))
      .join(totals, keyCol)
    val mu = col("n").cast("double") / col("d").cast("double")
    // candidate (day, cusum) pairs: at the active day, at the day before
    // the next active day (trailing-gap endpoint), and — for a key whose
    // first active day x1 > 0 — at day x1−1, where the LEADING gap's
    // linear decline bottoms out at CUSUM = −μ·x1 (cum before the first
    // active day is 0). Without that third candidate a key that starts
    // late reports 0 instead of its true negative excursion.
    val atDay = struct(col("day").as("day"),
      (col("cum").cast("double") - mu * (col("x").cast("double") + 1.0)).as("v"))
    val preNext = struct(date_add(col("d0"),
        (col("x_next") - 1).cast("int")).as("day"),
      (col("cum").cast("double") - mu * col("x_next").cast("double")).as("v"))
    val midCands = rel.select(col(keyCol),
        explode(when(col("x_next").isNotNull, array(atDay, preNext))
          .otherwise(array(atDay))).as("cp"))
      .select(col(keyCol), col("cp.day").as("day"),
        round(col("cp.v"), 4).as("v"))
    val leadGap = rel.where(col("x_prev").isNull && col("x") > 0)
      .select(col(keyCol),
        date_add(col("d0"), (col("x") - 1).cast("int")).as("day"),
        round(-mu * col("x").cast("double"), 4).as("v"))
    val cands = midCands.unionByName(leadGap)
    // argmax over the calendar-span-bounded candidate relation
    val wBest = Window.partitionBy(keyCol)
      .orderBy(abs(col("v")).desc, col("day").asc)
    cands.withColumn("rn", row_number().over(wBest))
      .where(col("rn") === 1)
      .select(col(keyCol),
        date_format(col("day"), "yyyy-MM-dd").as("cp_day"),
        col("v").as("cusum"),
        when(col("v") >= 0, lit("up")).otherwise(lit("down")).as("direction"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[changepoint]]. */
  def changepointSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
         span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
             CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
               MAX(CAST($tsCol AS DATE))) + 1 AS BIGINT) AS d
           FROM $tbl),
         tot AS (SELECT $keyCol, SUM(c) AS n FROM daily GROUP BY 1),
         rel AS (SELECT daily.$keyCol, day, c,
             CAST(date_diff('day', d0, day) AS BIGINT) AS x,
             CAST(SUM(c) OVER (PARTITION BY daily.$keyCol ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             lead(CAST(date_diff('day', d0, day) AS BIGINT))
               OVER (PARTITION BY daily.$keyCol ORDER BY day) AS x_next,
             lag(CAST(date_diff('day', d0, day) AS BIGINT))
               OVER (PARTITION BY daily.$keyCol ORDER BY day) AS x_prev,
             d0, d, n
           FROM daily CROSS JOIN span JOIN tot ON daily.$keyCol = tot.$keyCol),
         cands AS (
           SELECT $keyCol, day,
             round(CAST(cum AS DOUBLE)
               - (CAST(n AS DOUBLE) / CAST(d AS DOUBLE)) * (CAST(x AS DOUBLE) + 1.0), 4) AS v
           FROM rel
           UNION ALL
           SELECT $keyCol, d0 + CAST(x_next - 1 AS INT) AS day,
             round(CAST(cum AS DOUBLE)
               - (CAST(n AS DOUBLE) / CAST(d AS DOUBLE)) * CAST(x_next AS DOUBLE), 4) AS v
           FROM rel WHERE x_next IS NOT NULL
           UNION ALL
           SELECT $keyCol, d0 + CAST(x - 1 AS INT) AS day,
             round(- (CAST(n AS DOUBLE) / CAST(d AS DOUBLE)) * CAST(x AS DOUBLE), 4) AS v
           FROM rel WHERE x_prev IS NULL AND x > 0),
         best AS (SELECT $keyCol, day, v,
             row_number() OVER (PARTITION BY $keyCol ORDER BY abs(v) DESC, day ASC) AS rn
           FROM cands)
         SELECT $keyCol, strftime(day, '%Y-%m-%d') AS cp_day, v AS cusum,
           CASE WHEN v >= 0 THEN 'up' ELSE 'down' END AS direction
         FROM best WHERE rn = 1 ORDER BY $keyCol"""

  /** Inter-arrival latency profile: per event type, quantiles of the gap
    * (seconds) between a user's consecutive events — the "how long until
    * the next action" readout behind session-gap tuning (pick the
    * sessionize threshold FROM this distribution, not folklore) and
    * engagement monitoring.
    *
    * Shape: one lag() over per-USER windows ordered by (ts, id) — the
    * [[graft.streaming.Sessionize]]/transitions discipline (user activity
    * bounds the partition, never the corpus); gaps attribute to the LATER
    * event's type; quantiles are exact percentiles rounded to 4 (the
    * interpolation-ulp convention).
    */
  def gapQuantiles(df: DataFrame, typeCol: String, userCol: String,
      tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    df.select(col(typeCol).as("_gq_t"), col(userCol), col(tsCol), col(idCol))
      .withColumn("_gq_prev", lag(unix_millis(col(tsCol)), 1).over(w))
      .where(col("_gq_prev").isNotNull)
      .select(col("_gq_t"),
        ((unix_millis(col(tsCol)) - col("_gq_prev")).cast("double") / 1000.0)
          .as("gap_s"))
      .groupBy(col("_gq_t").as(typeCol))
      // one array-percentile buffer per group, not three (identical
      // interpolation per fraction off one sorted buffer)
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_s, array(0.5, 0.9, 0.99))").as("_q"))
      .select(col(typeCol), col("n_gaps"),
        round(col("_q").getItem(0), 4).as("p50_s"),
        round(col("_q").getItem(1), 4).as("p90_s"),
        round(col("_q").getItem(2), 4).as("p99_s"))
      .orderBy(typeCol)
  }

  /** DuckDB mirror of [[gapQuantiles]]. */
  def gapQuantilesSql(tbl: String, typeCol: String, userCol: String,
      tsCol: String, idCol: String): String =
    s"""WITH g AS (SELECT $typeCol,
           CAST(epoch_ms($tsCol) - lag(epoch_ms($tsCol), 1)
             OVER (PARTITION BY $userCol ORDER BY $tsCol, $idCol) AS DOUBLE)
             / 1000.0 AS gap_s
         FROM $tbl)
       SELECT $typeCol, COUNT(*) AS n_gaps,
         round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
         round(quantile_cont(gap_s, 0.9), 4) AS p90_s,
         round(quantile_cont(gap_s, 0.99), 4) AS p99_s
       FROM g WHERE gap_s IS NOT NULL
       GROUP BY $typeCol ORDER BY $typeCol"""

  /** Theil–Sen robust trend of daily counts: the MEDIAN of all pairwise
    * day-to-day slopes — the robust companion of [[dailyTrend]]'s OLS (one
    * anomalous day drags a least-squares slope arbitrarily; the median of
    * slopes has a 29% breakdown point, so a spike reads as a spike, not a
    * trend). Computed over the COMPLETE day grid (empty days as zeros,
    * materialized here — unlike OLS there is no closed form over gaps).
    *
    * Scale note: the pairwise self-join is CALENDAR²-bounded per key
    * (D(D−1)/2 pairs for a D-day span — ~400 rows for a month, never a
    * function of event volume); for decade-long logs, window the span.
    * Slopes are ratios of integer deltas (engine-identical doubles); the
    * median is the interpolated percentile rounded to 4 (the
    * percentiles-query convention).
    */
  def theilSenTrend(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      max(to_date(col(tsCol))).as("d1"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      .join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("x"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.select(col(keyCol), col("x").as("xa"), col("c").as("ca"))
    val b = grid.select(col(keyCol), col("x").as("xb"), col("c").as("cb"))
    a.join(b, Seq(keyCol)).where(col("xa") < col("xb"))
      .select(col(keyCol),
        ((col("cb") - col("ca")).cast("double") /
          (col("xb") - col("xa")).cast("double")).as("slope"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 4).as("ts_slope"))
      .orderBy(keyCol)
  }

  /** Mann–Kendall trend TEST over per-key daily counts on the complete
    * calendar grid — the significance companion of [[theilSenTrend]]
    * (Theil–Sen says how steep; Mann–Kendall says whether the monotone
    * trend is real): S = Σ_{i<j} sign(x_j − x_i), with the tie-corrected
    * variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 (counts tie
    * often — empty days especially — so the correction is not optional),
    * and the continuity-corrected z. Everything is INTEGER-derived (S,
    * n, tie sizes), so both engines compute identical doubles in the one
    * fixed z shape.
    *
    * Shape: the same bounded day grid as Theil–Sen (D rows per key), a
    * D²-bounded pair self-join, and a tie fold over the value histogram.
    */
  def mannKendall(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      max(to_date(col(tsCol))).as("d1"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      .join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("x"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.select(col(keyCol), col("x").as("xa"), col("c").as("ca"))
    val b = grid.select(col(keyCol), col("x").as("xb"), col("c").as("cb"))
    val s = a.join(b, Seq(keyCol)).where(col("xa") < col("xb"))
      .groupBy(col(keyCol))
      .agg(sum(signum((col("cb") - col("ca")).cast("double")).cast("long"))
        .as("s_stat"))
    val nRel = grid.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val ties = grid.groupBy(col(keyCol), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col(keyCol))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_corr"))
    def d(c: Column) = c.cast("double")
    val varS = (d(col("n")) * (d(col("n")) - 1.0) * (d(col("n")) * 2.0 + 5.0) -
      d(col("tie_corr"))) / 18.0
    val z = when(col("s_stat") > 0, (d(col("s_stat")) - 1.0) / sqrt(varS))
      .when(col("s_stat") < 0, (d(col("s_stat")) + 1.0) / sqrt(varS))
      .otherwise(lit(0.0))
    s.join(nRel, Seq(keyCol)).join(ties, Seq(keyCol))
      .select(col(keyCol), col("n").as("n_days"), col("s_stat"),
        round(varS, 4).as("var_s"),
        round(z, 4).as("z"),
        when(col("s_stat") > 0, lit("up"))
          .when(col("s_stat") < 0, lit("down"))
          .otherwise(lit("flat")).as("direction"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[mannKendall]]. */
  def mannKendallSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
         span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
             MAX(CAST($tsCol AS DATE)) AS d1 FROM $tbl),
         grid AS (SELECT k.$keyCol,
             CAST(date_diff('day', DATE '1970-01-01', CAST(gd AS DATE)) AS BIGINT) AS x,
             COALESCE(daily.c, 0) AS c
           FROM (SELECT DISTINCT $keyCol FROM daily) k
           CROSS JOIN (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
               CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS gd FROM span)
           LEFT JOIN daily ON k.$keyCol = daily.$keyCol
             AND CAST(gd AS DATE) = daily.day),
         s AS (SELECT a.$keyCol,
             CAST(SUM(CAST(sign(CAST(b.c - a.c AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_stat
           FROM grid a JOIN grid b ON a.$keyCol = b.$keyCol AND a.x < b.x
           GROUP BY 1),
         nrel AS (SELECT $keyCol, COUNT(*) AS n FROM grid GROUP BY 1),
         ties AS (SELECT $keyCol,
             CAST(SUM(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie_corr
           FROM (SELECT $keyCol, c, COUNT(*) AS t FROM grid GROUP BY 1, 2)
           GROUP BY 1),
         f AS (SELECT s.$keyCol, n, s_stat, tie_corr,
             (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) * 2.0 + 5.0)
               - CAST(tie_corr AS DOUBLE)) / 18.0 AS var_s
           FROM s JOIN nrel USING ($keyCol) JOIN ties USING ($keyCol))
         SELECT $keyCol, CAST(n AS BIGINT) AS n_days, s_stat,
           round(var_s, 4) AS var_s,
           round(CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
                      ELSE 0.0 END, 4) AS z,
           CASE WHEN s_stat > 0 THEN 'up' WHEN s_stat < 0 THEN 'down'
                ELSE 'flat' END AS direction
         FROM f ORDER BY $keyCol"""

  /** DuckDB mirror of [[theilSenTrend]]. */
  def theilSenTrendSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
         span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
             MAX(CAST($tsCol AS DATE)) AS d1 FROM $tbl),
         grid AS (SELECT k.$keyCol,
             CAST(date_diff('day', DATE '1970-01-01', CAST(gd AS DATE)) AS BIGINT) AS x,
             COALESCE(daily.c, 0) AS c
           FROM (SELECT DISTINCT $keyCol FROM daily) k
           CROSS JOIN (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
               CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS gd FROM span)
           LEFT JOIN daily ON k.$keyCol = daily.$keyCol
             AND CAST(gd AS DATE) = daily.day),
         pairs AS (SELECT a.$keyCol,
             CAST(b.c - a.c AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
           FROM grid a JOIN grid b
             ON a.$keyCol = b.$keyCol AND a.x < b.x)
         SELECT $keyCol, COUNT(*) AS n_pairs,
           round(quantile_cont(slope, 0.5), 4) AS ts_slope
         FROM pairs GROUP BY $keyCol ORDER BY $keyCol"""

  /** Seasonality-adjusted daily anomaly gate: each (key, day) on the
    * COMPLETE calendar grid is z-scored against the key's mean count for
    * that DAY OF WEEK — so a quiet-every-Sunday stream doesn't alarm every
    * Sunday (the trailing-window gate [[rateAnomaly]] would), and a silent
    * TUESDAY on a stream that is always busy on Tuesdays does alarm even
    * though zero events arrived (no data-driven bucket gate can see it).
    * Expected(day) = per-key mean count over the span's days of that dow;
    * residual z = (c − e)/√max(e, ε), the Poisson standardization. Flags
    * |z| ≥ `zThresh`.
    *
    * Shape: everything beyond the (key, day) count aggregation runs on
    * calendar-bounded relations — the grid is keys × span-days
    * (`sequence()` explode), dow means are a (key, 7) fold, span dow
    * counts a 7-row broadcast. All statistics integer-derived.
    */
  def seasonalResiduals(df: DataFrame, keyCol: String, tsCol: String,
      zThresh: Double = 2.5): DataFrame = {
    val dowOf = (d: Column) => pmod(datediff(d, lit("1970-01-01")) + 4, lit(7)).cast("long")
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      max(to_date(col(tsCol))).as("d1"))
    // span-days per dow: a 7-row relation derived from the span itself
    val spanDays = span
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      .groupBy(dowOf(col("day")).as("dow")).agg(count(lit(1)).as("n_days"))
    val dowMeans = daily
      .groupBy(col(keyCol), dowOf(col("day")).as("dow"))
      .agg(sum(col("c")).as("c_dow"))
      .join(broadcast(spanDays), "dow")
      .select(col(keyCol), col("dow"),
        (col("c_dow").cast("double") / col("n_days").cast("double")).as("e"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      .withColumn("dow", dowOf(col("day")))
    grid
      .join(daily, Seq(keyCol, "day"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .join(dowMeans, Seq(keyCol, "dow"), "left")
      .withColumn("e", coalesce(col("e"), lit(0.0)))
      .withColumn("z",
        round((col("c").cast("double") - col("e")) /
          sqrt(greatest(col("e"), lit(1e-9))), 4))
      .where(abs(col("z")) >= zThresh)
      .select(col(keyCol), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("c").as("n"), round(col("e"), 4).as("expected"), col("z"))
      .orderBy(keyCol, "day")
  }

  /** DuckDB mirror of [[seasonalResiduals]]. */
  def seasonalResidualsSql(tbl: String, keyCol: String, tsCol: String,
      zThresh: Double = 2.5): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
         span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
             MAX(CAST($tsCol AS DATE)) AS d1 FROM $tbl),
         sd AS (SELECT CAST((date_diff('day', DATE '1970-01-01',
               CAST(gd AS DATE)) + 4) % 7 AS BIGINT) AS dow, COUNT(*) AS n_days
           FROM (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
               CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS gd FROM span)
           GROUP BY 1),
         dm AS (SELECT $keyCol, dow, CAST(SUM(c) AS DOUBLE) / CAST(n_days AS DOUBLE) AS e
           FROM (SELECT $keyCol,
               CAST((date_diff('day', DATE '1970-01-01', day) + 4) % 7 AS BIGINT) AS dow, c
             FROM daily)
           JOIN sd USING (dow) GROUP BY $keyCol, dow, n_days),
         grid AS (SELECT k.$keyCol, CAST(gd AS DATE) AS day,
             CAST((date_diff('day', DATE '1970-01-01', CAST(gd AS DATE)) + 4) % 7 AS BIGINT) AS dow
           FROM (SELECT DISTINCT $keyCol FROM daily) k
           CROSS JOIN (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
               CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS gd FROM span)),
         r AS (SELECT grid.$keyCol, grid.day,
             COALESCE(daily.c, 0) AS c, COALESCE(dm.e, 0.0) AS e
           FROM grid
           LEFT JOIN daily ON grid.$keyCol = daily.$keyCol AND grid.day = daily.day
           LEFT JOIN dm ON grid.$keyCol = dm.$keyCol AND grid.dow = dm.dow),
         z AS (SELECT $keyCol, day, c,
             round((CAST(c AS DOUBLE) - e) / sqrt(greatest(e, 1e-9)), 4) AS z, e
           FROM r)
         SELECT $keyCol, strftime(day, '%Y-%m-%d') AS day, CAST(c AS BIGINT) AS n,
           round(e, 4) AS expected, z
         FROM z WHERE abs(z) >= $zThresh ORDER BY $keyCol, day"""

  /** Per-key day-of-week seasonality profile: counts and share per dow.
    * Day-of-week is computed PORTABLY as (epoch_days + 4) mod 7 (0=Sunday)
    * — Spark's `dayofweek` is 1-based-Sunday while DuckDB's is 0-based,
    * and locale-dependent date part functions are an oracle trap.
    */
  def dowProfile(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val dow = pmod(datediff(to_date(col(tsCol)), lit("1970-01-01")) + 4, lit(7))
      .cast("long")
    val counts = df.select(col(keyCol), dow.as("dow"))
      .groupBy(col(keyCol), col("dow")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col(keyCol)).agg(sum(col("n")).as("_t"))
    counts.join(totals, keyCol)
      .select(col(keyCol), col("dow"), col("n"),
        round(col("n").cast("double") / col("_t").cast("double"), 6).as("share"))
      .orderBy(keyCol, "dow")
  }

  /** DuckDB mirror of [[dowProfile]]. */
  def dowProfileSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH c AS (SELECT $keyCol,
           CAST((date_diff('day', DATE '1970-01-01', CAST($tsCol AS DATE)) + 4) % 7 AS BIGINT) AS dow,
           COUNT(*) AS n
         FROM $tbl GROUP BY 1, 2),
       t AS (SELECT $keyCol, SUM(n) AS tt FROM c GROUP BY 1)
       SELECT c.$keyCol, dow, CAST(n AS BIGINT) AS n,
         round(CAST(n AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share
       FROM c JOIN t ON c.$keyCol = t.$keyCol
       ORDER BY c.$keyCol, dow"""

  /** Expanding-window time-based cross-validation folds — the
    * leakage-safe split discipline for anything trained on a time series
    * (random splits leak the future into training; rolling-retrain
    * evaluation needs fold i to train strictly before it validates).
    * Fold i of k trains on days ≤ b_i and validates on (b_i, b_(i+1)],
    * where b_i is the first day whose cumulative event count reaches
    * ⌈i·N/k⌉ — so folds are event-mass-balanced, not calendar-balanced,
    * and every boundary statistic is integer-derived (engine-identical).
    *
    * Shape: one map-side-combinable (day, count) aggregation of the fact
    * stream; everything after runs on the DAY relation — calendar-span-
    * sized, so its global cumulative window is bounded no matter the event
    * volume. Output: k−1 fold rows.
    */
  def timeFolds(df: DataFrame, tsCol: String, k: Int): DataFrame = {
    require(k >= 2, s"timeFolds: need k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val days = df.groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("c"))
    // window over the day relation only (bounded by the calendar span)
    val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = days.withColumn("cum", sum("c").over(w))
    val tot = cum.agg(max(col("cum")).as("n"))
    val withT = cum.crossJoin(broadcast(tot))
    def thresh(i: Int) = expr(s"CAST((n * $i + ${k - 1}) DIV $k AS BIGINT)")
    val bounds = withT.agg(
      min(when(col("cum") >= thresh(1), col("day"))).as("b1"),
      ((2 to k - 1).flatMap { i =>
        Seq(min(when(col("cum") >= thresh(i), col("day"))).as(s"b$i"),
          min(when(col("cum") >= thresh(i), col("cum"))).as(s"cum$i"))
      } ++ Seq(
        min(when(col("cum") >= thresh(1), col("cum"))).as("cum1"),
        max(col("day")).as(s"b$k"), max(col("cum")).as(s"cum$k"))): _*)
    bounds.select(explode(array((1 until k).map { i =>
        struct(lit(i.toLong).as("fold"),
          date_format(col(s"b$i"), "yyyy-MM-dd").as("train_end"),
          date_format(col(s"b${i + 1}"), "yyyy-MM-dd").as("val_end"),
          col(s"cum$i").as("n_train"),
          (col(s"cum${i + 1}") - col(s"cum$i")).as("n_val"))
      }: _*)).as("f"))
      .select(col("f.fold").as("fold"), col("f.train_end").as("train_end"),
        col("f.val_end").as("val_end"), col("f.n_train").as("n_train"),
        col("f.n_val").as("n_val"))
      .orderBy("fold")
  }

  /** DuckDB mirror of [[timeFolds]]. */
  def timeFoldsSql(tbl: String, tsCol: String, k: Int): String = {
    val boundCols = (1 until k).flatMap { i =>
      Seq(
        s"MIN(CASE WHEN cum >= (n * $i + ${k - 1}) // $k THEN day END) AS b$i",
        s"MIN(CASE WHEN cum >= (n * $i + ${k - 1}) // $k THEN cum END) AS cum$i")
    }.mkString(",\n           ") +
      s",\n           MAX(day) AS b$k, MAX(cum) AS cum$k"
    val foldRows = (1 until k).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS fold,
          strftime(b$i, '%Y-%m-%d') AS train_end,
          strftime(b${i + 1}, '%Y-%m-%d') AS val_end,
          cum$i AS n_train, cum${i + 1} - cum$i AS n_val FROM b"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH days AS (SELECT CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1),
         cum AS (SELECT day, CAST(SUM(c) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           FROM days),
         tot AS (SELECT MAX(cum) AS n FROM cum),
         b AS (SELECT
           $boundCols
           FROM cum CROSS JOIN tot)
         $foldRows
         ORDER BY fold"""
  }

  /** DuckDB mirror of [[gapFill]]. */
  def gapFillSql(tbl: String, keyCol: String, tsCol: String,
      valCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day,
            CAST(SUM(CAST($valCol AS DECIMAL(18,6))) AS DOUBLE) AS v
          FROM $tbl GROUP BY 1, 2),
        span AS (SELECT $keyCol, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
        grid AS (SELECT $keyCol, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                   CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span),
        g AS (SELECT grid.$keyCol, grid.day, daily.v
              FROM grid LEFT JOIN daily USING ($keyCol, day))
        SELECT $keyCol, strftime(day, '%Y-%m-%d') AS day,
          round(last_value(v IGNORE NULLS) OVER (PARTITION BY $keyCol ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_fill,
          v IS NULL AS filled
        FROM g ORDER BY $keyCol, day"""

  /** Lead/lag CROSS-CORRELATION of two event types' daily series: Pearson
    * r between a[t] and b[t+k] for each lag k ∈ [−maxLag, maxLag] over
    * the complete calendar grid (empty days as zeros) — the "does A lead
    * B by k days?" readout behind funnel latency and campaign-echo
    * analysis, where a peak at k > 0 means A precedes B.
    *
    * Exactness: the series are integer counts, every moment sum is
    * integer (exact under any partitioning/order), and r derives from
    * them in one fixed double shape — both engines agree bit-for-bit.
    * Shape: one (day, type) aggregation of the corpus; everything after
    * lives on the D-row grid × (2·maxLag+1) lag relation, all broadcast-
    * sized. Zero-variance windows yield NULL r, identically.
    */
  def dailyXcorr(df: DataFrame, typeCol: String, tsCol: String,
      typeA: String, typeB: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "dailyXcorr: maxLag >= 1")
    val spark = df.sparkSession
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("long").as("d"))
    val daily = df.where(col(typeCol).isin(typeA, typeB))
      .crossJoin(broadcast(span))
      .groupBy(datediff(to_date(col(tsCol)), col("d0")).cast("long").as("t"))
      .agg(sum(when(col(typeCol) === typeA, 1L).otherwise(0L)).as("na"),
        sum(when(col(typeCol) === typeB, 1L).otherwise(0L)).as("nb"))
    val grid = span.select(explode(sequence(lit(0L), col("d") - 1)).as("t"))
      .join(daily, Seq("t"), "left")
      .select(col("t"), coalesce(col("na"), lit(0L)).as("a"),
        coalesce(col("nb"), lit(0L)).as("b"))
    import spark.implicits._
    val lags = (-maxLag to maxLag).map(_.toLong).toDF("lag")
    val pairs = broadcast(lags)
      .join(broadcast(grid.select(col("t"), col("a"))), expr("true"))
      .join(broadcast(grid.select(col("t").as("t2"), col("b"))),
        col("t2") === col("t") + col("lag"))
    val g = pairs.groupBy("lag").agg(
      count(lit(1)).as("n"),
      sum(col("a")).as("sx"), sum(col("b")).as("sy"),
      sum(col("a") * col("b")).as("sxy"),
      sum(col("a") * col("a")).as("sxx"),
      sum(col("b") * col("b")).as("syy"))
    def d(c: Column) = c.cast("double")
    val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val vx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val vy = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    g.select(col("lag"), col("n").as("n_days"),
        when(vx > 0 && vy > 0, round(num / sqrt(vx * vy), 6))
          .otherwise(lit(null).cast("double")).as("r"))
      .orderBy("lag")
  }

  /** DuckDB mirror of [[dailyXcorr]]. */
  def dailyXcorrSql(tbl: String, typeCol: String, tsCol: String,
      typeA: String, typeB: String, maxLag: Int = 7): String =
    s"""WITH span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS BIGINT) AS d FROM $tbl),
       daily AS (SELECT CAST(date_diff('day', d0, CAST($tsCol AS DATE)) AS BIGINT) AS t,
           CAST(SUM(CASE WHEN $typeCol = ${OracleSql.lit(typeA)} THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN $typeCol = ${OracleSql.lit(typeB)} THEN 1 ELSE 0 END) AS BIGINT) AS nb
         FROM $tbl CROSS JOIN span
         WHERE $typeCol IN (${OracleSql.lit(typeA)}, ${OracleSql.lit(typeB)})
         GROUP BY 1),
       grid AS (SELECT CAST(g.t AS BIGINT) AS t,
           COALESCE(na, 0) AS a, COALESCE(nb, 0) AS b
         FROM (SELECT unnest(range(0, d)) AS t FROM span) g
         LEFT JOIN daily ON daily.t = g.t),
       lags AS (SELECT CAST(x AS BIGINT) AS lag FROM range(${-maxLag}, ${maxLag + 1}) r(x)),
       p AS (SELECT lag, x.a, y.b FROM lags
         JOIN grid x ON true JOIN grid y ON y.t = x.t + lag),
       m AS (SELECT lag, COUNT(*) AS n,
           CAST(SUM(a) AS BIGINT) AS sx, CAST(SUM(b) AS BIGINT) AS sy,
           CAST(SUM(a * b) AS BIGINT) AS sxy,
           CAST(SUM(a * a) AS BIGINT) AS sxx,
           CAST(SUM(b * b) AS BIGINT) AS syy
         FROM p GROUP BY lag)
       SELECT lag, n AS n_days,
         CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
               AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
           THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
           END AS r
       FROM m ORDER BY lag"""

  /** STL-lite seasonal DECOMPOSITION of per-key daily counts: the
    * classical additive split c = trend + seasonal + residual with a
    * centered 7-day moving-average trend, day-of-week seasonal means of
    * the detrended series, and the leftover residual — the full
    * decomposition TABLE behind [[seasonalResiduals]]' anomaly gate (the
    * gate answers "is today odd?"; this shows the trend/seasonal split
    * an analyst plots). Edge days without a full centered window are
    * excluded (the classical convention).
    *
    * Exactness: the trend is an integer 7-day sum divided once; the
    * detrended value is one subtraction; seasonal means accumulate
    * round(6)-then-DECIMAL (partition-order-immune); the residual is one
    * more subtraction of already-identical doubles. All relations are
    * calendar-bounded after the one (key, day) aggregation.
    */
  def stlDecompose(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("long").as("d"))
    val daily = df.crossJoin(broadcast(span))
      .groupBy(col(keyCol),
        datediff(to_date(col(tsCol)), col("d0")).cast("long").as("t"))
      .agg(count(lit(1)).as("c"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), col("d0"), col("d"),
        explode(sequence(lit(0L), col("d") - 1)).as("t"))
      .join(daily, Seq(keyCol, "t"), "left")
      .select(col(keyCol), col("d0"), col("d"), col("t"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wMa = Window.partitionBy(keyCol).orderBy("t").rowsBetween(-3, 3)
    val trended = grid
      .withColumn("_st_sum", sum(col("c")).over(wMa))
      .withColumn("_st_n", count(lit(1)).over(wMa))
      .where(col("_st_n") === 7) // full centered window only
      .withColumn("trend", col("_st_sum").cast("double") / lit(7.0))
      .withColumn("detr", col("c").cast("double") - col("trend"))
      // portable dow: (epoch_days + 4) mod 7 — the dowProfile convention
      .withColumn("dow",
        pmod(datediff(date_add(col("d0"), col("t").cast("int")),
          lit("1970-01-01")) + 4, lit(7)))
    val seasonal = trended.groupBy(col(keyCol), col("dow"))
      .agg((sum(round(col("detr"), 6).cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("seasonal"))
    // NO final round: every value here derives from integer sums and
    // DECIMAL-exact folds through identical IEEE divisions/subtractions
    // in both engines, so the doubles are bit-identical — while a
    // round(6) lands on exact halves (e.g. a /4 seasonal mean) where the
    // engines' rounding algorithms split (the unigramLogprob lesson)
    trended.join(seasonal, Seq(keyCol, "dow"))
      .select(col(keyCol),
        date_format(date_add(col("d0"), col("t").cast("int")), "yyyy-MM-dd")
          .as("day"),
        col("c"),
        col("trend"),
        col("seasonal"),
        (col("detr") - col("seasonal")).as("resid"))
      .orderBy(keyCol, "day")
  }

  /** Seasonal / trend strength (Hyndman & Athanasopoulos, FPP):
    * F_s = max(0, 1 − Var(resid)/Var(seasonal+resid)) and
    * F_t = max(0, 1 − Var(resid)/Var(trend+resid)) over the
    * [[stlDecompose]] parts — the one-number-per-key answers to "is this
    * series actually weekly" and "is there a real level drift", i.e. the
    * dials that decide whether [[seasonalResiduals]]'s adjustment or
    * [[dailyTrend]]'s slope is even the right model. Composes the STL
    * output relation directly (bit-identical in both engines), so this
    * layer is just per-key DECIMAL moment folds.
    */
  def seasonalStrength(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val stl = stlDecompose(df, keyCol, tsCol)
    def dec(c: Column) = round(c, 6).cast("decimal(18,6)")
    val parts = stl.select(col(keyCol),
      dec(col("resid")).as("r"),
      dec(col("seasonal") + col("resid")).as("sr"),
      dec(col("trend") + col("resid")).as("tr"))
    val mom = parts.groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        sum(col("r")).as("s_r"), sum(col("r") * col("r")).as("ss_r"),
        sum(col("sr")).as("s_sr"), sum(col("sr") * col("sr")).as("ss_sr"),
        sum(col("tr")).as("s_tr"), sum(col("tr") * col("tr")).as("ss_tr"))
      .where(col("n") >= 14)
    def varOf(s: Column, ss: Column) =
      (d(ss) - d(s) * d(s) / d(col("n"))) / d(col("n"))
    val vr = varOf(col("s_r"), col("ss_r"))
    val vsr = varOf(col("s_sr"), col("ss_sr"))
    val vtr = varOf(col("s_tr"), col("ss_tr"))
    mom.select(col(keyCol), col("n").as("n_days"),
        when(vsr > 0, round(greatest(lit(0.0), lit(1.0) - vr / vsr), 6))
          .as("f_seasonal"),
        when(vtr > 0, round(greatest(lit(0.0), lit(1.0) - vr / vtr), 6))
          .as("f_trend"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[seasonalStrength]] — wraps the [[stlDecomposeSql]]
    * relation verbatim. */
  def seasonalStrengthSql(tbl: String, keyCol: String,
      tsCol: String): String =
    s"""WITH stl AS (${stlDecomposeSql(tbl, keyCol, tsCol)}),
       parts AS (SELECT $keyCol,
           CAST(round(resid, 6) AS DECIMAL(18,6)) AS r,
           CAST(round(seasonal + resid, 6) AS DECIMAL(18,6)) AS sr,
           CAST(round(trend + resid, 6) AS DECIMAL(18,6)) AS tr
         FROM stl),
       mom AS (SELECT $keyCol, COUNT(*) AS n,
           SUM(r) AS s_r, SUM(r * r) AS ss_r,
           SUM(sr) AS s_sr, SUM(sr * sr) AS ss_sr,
           SUM(tr) AS s_tr, SUM(tr * tr) AS ss_tr
         FROM parts GROUP BY 1 HAVING COUNT(*) >= 14),
       f AS (SELECT $keyCol, n,
           (CAST(ss_r AS DOUBLE) - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE) / n) / n AS vr,
           (CAST(ss_sr AS DOUBLE) - CAST(s_sr AS DOUBLE) * CAST(s_sr AS DOUBLE) / n) / n AS vsr,
           (CAST(ss_tr AS DOUBLE) - CAST(s_tr AS DOUBLE) * CAST(s_tr AS DOUBLE) / n) / n AS vtr
         FROM mom)
       SELECT $keyCol, n AS n_days,
         CASE WHEN vsr > 0 THEN round(greatest(0.0, 1.0 - vr / vsr), 6) END AS f_seasonal,
         CASE WHEN vtr > 0 THEN round(greatest(0.0, 1.0 - vr / vtr), 6) END AS f_trend
       FROM f ORDER BY $keyCol"""

  /** DuckDB mirror of [[stlDecompose]]. */
  def stlDecomposeSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS BIGINT) AS d FROM $tbl),
       daily AS (SELECT $keyCol,
           CAST(date_diff('day', d0, CAST($tsCol AS DATE)) AS BIGINT) AS t,
           COUNT(*) AS c
         FROM $tbl CROSS JOIN span GROUP BY 1, 2),
       grid AS (SELECT k.$keyCol, sp.d0, sp.d, CAST(g.t AS BIGINT) AS t,
           COALESCE(daily.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN span sp
         CROSS JOIN (SELECT unnest(range(0, (SELECT d FROM span))) AS t) g
         LEFT JOIN daily ON daily.$keyCol = k.$keyCol AND daily.t = g.t),
       tr AS (SELECT *,
           CAST(SUM(c) OVER w AS BIGINT) AS ssum,
           COUNT(*) OVER w AS sn
         FROM grid
         WINDOW w AS (PARTITION BY $keyCol ORDER BY t
           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       dtr AS (SELECT $keyCol, d0, t, c,
           CAST(ssum AS DOUBLE) / CAST(7.0 AS DOUBLE) AS trend,
           CAST(c AS DOUBLE) - CAST(ssum AS DOUBLE) / CAST(7.0 AS DOUBLE) AS detr,
           CAST((date_diff('day', DATE '1970-01-01', d0 + CAST(t AS INT)) + 4) % 7 AS INT) AS dow
         FROM tr WHERE sn = 7),
       seas AS (SELECT $keyCol, dow,
           CAST(SUM(CAST(round(detr, 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS seasonal
         FROM dtr GROUP BY 1, 2)
       SELECT d.$keyCol, strftime(d.d0 + CAST(d.t AS INT), '%Y-%m-%d') AS day,
         d.c, d.trend, s.seasonal,
         d.detr - s.seasonal AS resid
       FROM dtr d JOIN seas s ON d.$keyCol = s.$keyCol AND d.dow = s.dow
       ORDER BY d.$keyCol, day"""

  /** Per-key daily AUTOCORRELATION function: Pearson r of the key's daily
    * count series against itself at lags 1..maxLag over the complete
    * calendar grid — the periodicity detector ([[dowProfile]] ASSUMES the
    * week; the ACF finds whatever cycle is actually there, weekly or
    * otherwise, as the peak lag). Output one row per (key, lag) plus the
    * peak flag; the [[dailyXcorr]] exactness contract (integer moment
    * sums, one fixed double shape, zero-variance → NULL).
    *
    * Shape: one (day, key) aggregation; the lag pairing is a D-row grid
    * self-join per key — keys × lags × D rows, all bounded by the
    * calendar, never by event volume.
    */
  def autocorrDaily(df: DataFrame, keyCol: String, tsCol: String,
      maxLag: Int = 14): DataFrame = {
    require(maxLag >= 1, "autocorrDaily: maxLag >= 1")
    val spark = df.sparkSession
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("long").as("d"))
    val daily = df.crossJoin(broadcast(span))
      .groupBy(col(keyCol),
        datediff(to_date(col(tsCol)), col("d0")).cast("long").as("t"))
      .agg(count(lit(1)).as("c"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0L), col("d") - 1)).as("t"))
      .join(daily, Seq(keyCol, "t"), "left")
      .select(col(keyCol), col("t"), coalesce(col("c"), lit(0L)).as("c"))
    import spark.implicits._
    val lags = (1 to maxLag).map(_.toLong).toDF("lag")
    val pairs = grid
      .join(broadcast(lags), expr("true"))
      .join(grid.select(col(keyCol), col("t").as("t2"), col("c").as("c2")),
        Seq(keyCol))
      .where(col("t2") === col("t") + col("lag"))
    val g = pairs.groupBy(col(keyCol), col("lag")).agg(
      count(lit(1)).as("n"),
      sum(col("c")).as("sx"), sum(col("c2")).as("sy"),
      sum(col("c") * col("c2")).as("sxy"),
      sum(col("c") * col("c")).as("sxx"),
      sum(col("c2") * col("c2")).as("syy"))
    def d(c: Column) = c.cast("double")
    val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val vx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val vy = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val r = when(vx > 0 && vy > 0, round(num / sqrt(vx * vy), 6))
      .otherwise(lit(null).cast("double"))
    val withR = g.select(col(keyCol), col("lag"), col("n").as("n_days"),
      r.as("r"))
    val wBest = org.apache.spark.sql.expressions.Window.partitionBy(keyCol)
      .orderBy(col("r").desc_nulls_last, col("lag").asc)
    withR
      .withColumn("is_peak",
        row_number().over(wBest) === 1 && col("r").isNotNull)
      .orderBy(keyCol, "lag")
  }

  /** DuckDB mirror of [[autocorrDaily]]. */
  def autocorrDailySql(tbl: String, keyCol: String, tsCol: String,
      maxLag: Int = 14): String =
    s"""WITH span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS BIGINT) AS d FROM $tbl),
       daily AS (SELECT $keyCol,
           CAST(date_diff('day', d0, CAST($tsCol AS DATE)) AS BIGINT) AS t,
           COUNT(*) AS c
         FROM $tbl CROSS JOIN span GROUP BY 1, 2),
       grid AS (SELECT k.$keyCol, CAST(g.t AS BIGINT) AS t, COALESCE(daily.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS t FROM span) g
         LEFT JOIN daily ON daily.$keyCol = k.$keyCol AND daily.t = g.t),
       lags AS (SELECT CAST(x AS BIGINT) AS lag FROM range(1, ${maxLag + 1}) r(x)),
       p AS (SELECT a.$keyCol, lag, a.c AS ca, b.c AS cb
         FROM grid a CROSS JOIN lags
         JOIN grid b ON b.$keyCol = a.$keyCol AND b.t = a.t + lag),
       m AS (SELECT $keyCol, lag, COUNT(*) AS n,
           CAST(SUM(ca) AS BIGINT) AS sx, CAST(SUM(cb) AS BIGINT) AS sy,
           CAST(SUM(ca * cb) AS BIGINT) AS sxy,
           CAST(SUM(ca * ca) AS BIGINT) AS sxx,
           CAST(SUM(cb * cb) AS BIGINT) AS syy
         FROM p GROUP BY 1, 2),
       withr AS (SELECT $keyCol, lag, n AS n_days,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
                 AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
             THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             END AS r
         FROM m)
       SELECT $keyCol, lag, n_days, r,
         (row_number() OVER (PARTITION BY $keyCol
            ORDER BY r DESC NULLS LAST, lag ASC) = 1 AND r IS NOT NULL) AS is_peak
       FROM withr ORDER BY $keyCol, lag"""

  /** EWMA last-day anomaly gate: per key, exponentially-weighted moving
    * average of DAILY counts over the complete calendar grid (empty days
    * as zeros), the last day's residual against the level the PRIOR days
    * predicted, and a Poisson-ish 3√(level+1) gate — the smoothed
    * complement of [[rateAnomaly]]'s windowed z (EWMA discounts history
    * smoothly instead of cliff-dropping it at the lookback edge; it is
    * what monitoring systems actually run).
    *
    * Recursion without a recursive engine: s_t = α·c_t + (1−α)·s_{t−1} is
    * a LEFT FOLD, so the day-grid counts collapse to a bounded per-key
    * array (calendar-span-sized, like [[timeFolds]]) and the fold runs
    * inside one `aggregate` HOF — seeded with c_0, exactly DuckDB's
    * `list_reduce` convention, so both engines chain the identical
    * IEEE ops in the identical order and agree bit-for-bit (α and 1−α
    * interpolated from the same Scala doubles).
    */
  def ewmaDaily(df: DataFrame, keyCol: String, tsCol: String,
      alpha: Double = 0.3): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val keys = daily.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(span))
      .select(col(keyCol), col("d"),
        explode(sequence(lit(0), col("d") - 1)).as("x"))
    val dailyX = daily.crossJoin(broadcast(span))
      .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
        col("c"))
    val arrs = grid.join(dailyX, Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("d"), col("x"),
        coalesce(col("c"), lit(0L)).cast("double").as("c0"))
      .groupBy(col(keyCol), col("d"))
      .agg(transform(array_sort(collect_list(struct(col("x"), col("c0")))),
        e => e.getField("c0")).as("arr"))
    val a = lit(alpha)
    val b = lit(1 - alpha)
    val levelPrev = when(col("d") >= 2,
      aggregate(slice(col("arr"), lit(2), greatest(col("d") - 2, lit(0))),
        element_at(col("arr"), 1),
        (s, c) => a * c + b * s)).otherwise(lit(null).cast("double"))
    arrs
      .withColumn("_ew_lp", levelPrev)
      .select(col(keyCol), col("d").cast("long").as("days"),
        element_at(col("arr"), col("d")).cast("long").as("c_last"),
        round(col("_ew_lp"), 6).as("level_prev"),
        round(element_at(col("arr"), col("d")) - col("_ew_lp"), 6).as("resid"),
        (abs(element_at(col("arr"), col("d")) - col("_ew_lp")) >
          lit(3.0) * sqrt(col("_ew_lp") + lit(1.0))).as("anomaly"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[ewmaDaily]] (`list_reduce` seeds with the first
    * element — the same convention the Spark fold replicates).
    */
  def ewmaDailySql(tbl: String, keyCol: String, tsCol: String,
      alpha: Double = 0.3): String = {
    val a = alpha.toString
    val b = (1 - alpha).toString
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       keys AS (SELECT DISTINCT $keyCol FROM daily),
       grid AS (SELECT $keyCol, d, CAST(unnest(range(0, d)) AS INT) AS x
         FROM keys CROSS JOIN span),
       dx AS (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
         FROM daily CROSS JOIN span),
       arrs AS (SELECT $keyCol, MAX(d) AS d,
           list(CAST(COALESCE(c, 0) AS DOUBLE) ORDER BY x) AS arr
         FROM grid LEFT JOIN dx USING ($keyCol, x) GROUP BY $keyCol),
       f AS (SELECT $keyCol, d, arr,
           CASE WHEN d >= 2 THEN
             list_reduce(list_slice(arr, 1, d - 1),
               (s, c) -> CAST($a AS DOUBLE) * c + CAST($b AS DOUBLE) * s)
           END AS lp
         FROM arrs)
       SELECT $keyCol, CAST(d AS BIGINT) AS days,
         CAST(arr[d] AS BIGINT) AS c_last,
         round(lp, 6) AS level_prev,
         round(arr[d] - lp, 6) AS resid,
         abs(arr[d] - lp) > CAST(3.0 AS DOUBLE) * sqrt(lp + CAST(1.0 AS DOUBLE))
           AS anomaly
       FROM f ORDER BY $keyCol"""
  }

  /** Seasonal-naive forecast error with MASE scaling (Hyndman & Koehler,
    * IJF 2006, "Another look at measures of forecast accuracy"): per key,
    * score the forecast "tomorrow = same weekday last week" (ŷ_t = y_{t−7})
    * against the realized daily counts, scaled by the one-step naive
    * ŷ_t = y_{t−1} error — MASE < 1 means weekly seasonality genuinely
    * beats persistence, the go/no-go for shipping the q6-style seasonal
    * forecaster on a key. Absolute errors are INTEGER (daily counts), so
    * both means and their ratio are exact-until-one-division.
    *
    * Gap discipline: a "day" exists only if observed; lag terms require the
    * EXACT calendar offset to exist (d−7 / d−1 present), expressed as
    * equi-joins of the per-key day relation against itself — no
    * densification, no window over a gap-filled grid. The day relation is
    * calendar-span-bounded, so both self-joins are type-table-sized.
    */
  def maseEval(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val l7 = daily.select(col("k"), date_add(col("day"), 7).as("day"),
      col("c").as("c7"))
    val l1 = daily.select(col("k"), date_add(col("day"), 1).as("day"),
      col("c").as("c1"))
    daily
      .join(l7, Seq("k", "day"))
      .join(l1, Seq("k", "day"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("c") - col("c7"))).as("ae7"),
        sum(abs(col("c") - col("c1"))).as("ae1"))
      .where(col("ae1") > 0)
      .select(col("k").as(keyCol), col("n_eval"),
        round(col("ae7").cast("double") / col("n_eval").cast("double"), 6)
          .as("mae_seasonal"),
        round(col("ae1").cast("double") / col("n_eval").cast("double"), 6)
          .as("mae_naive"),
        round(col("ae7").cast("double") / col("ae1").cast("double"), 4)
          .as("mase"))
  }

  /** DuckDB mirror of [[maseEval]]. */
  def maseEvalSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol AS k, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       j AS (SELECT d.k, d.day, d.c, l7.c AS c7, l1.c AS c1
         FROM daily d
         JOIN daily l7 ON l7.k = d.k AND l7.day + 7 = d.day
         JOIN daily l1 ON l1.k = d.k AND l1.day + 1 = d.day),
       agg AS (SELECT k, COUNT(*) AS n_eval,
           SUM(abs(c - c7)) AS ae7, SUM(abs(c - c1)) AS ae1
         FROM j GROUP BY k)
       SELECT k AS $keyCol, CAST(n_eval AS BIGINT) AS n_eval,
         round(CAST(ae7 AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS mae_seasonal,
         round(CAST(ae1 AS DOUBLE) / CAST(n_eval AS DOUBLE), 6) AS mae_naive,
         round(CAST(ae7 AS DOUBLE) / CAST(ae1 AS DOUBLE), 4) AS mase
       FROM agg WHERE ae1 > 0"""

  /** Holt's linear-trend smoothing (double exponential smoothing) of the
    * per-key daily count series, gap days as explicit zeros — the
    * trend-aware sibling of [[ewmaDaily]]: EWMA tracks a LEVEL and reads a
    * trending series as perpetually anomalous; Holt carries (level, trend)
    * state so a steady climb forecasts forward instead of alarming.
    *
    * Recurrence (with the standard two-point init, which makes the t=2
    * one-step error identically zero — so SSE starts at t=3):
    * l₂ = y₂, b₂ = y₂ − y₁; for t ≥ 3:
    * ŷ = l + b;  l' = α·y + (1−α)·ŷ;  b' = β·(l' − l) + (1−β)·b.
    *
    * Exactness: counts are integers; the fold is one fixed-op-order double
    * recursion — Spark runs it as a single higher-order `aggregate` over
    * the densified per-key array (struct accumulator), DuckDB as a
    * recursive CTE with textually identical arithmetic, INCLUDING the
    * complement coefficients (1−α is written 0.7, never computed, so both
    * engines fold with bit-identical constants). Per-key state is 3
    * doubles; arrays are calendar-span-bounded, never corpus-sized.
    *
    * Output per key: days, final level/trend, h-step forecast, one-step
    * SSE — all at 6 dp.
    */
  def holtLinear(df: DataFrame, keyCol: String, tsCol: String,
      alpha: Double = 0.3, beta: Double = 0.2, horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1, "holtLinear: bad smoothing")
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val keys = daily.select(col(keyCol)).distinct()
    val grid = keys.crossJoin(broadcast(span))
      .select(col(keyCol), col("d"),
        explode(sequence(lit(0), col("d") - 1)).as("x"))
    val dailyX = daily.crossJoin(broadcast(span))
      .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
        col("c"))
    val arrs = grid.join(dailyX, Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("d"), col("x"),
        coalesce(col("c"), lit(0L)).cast("double").as("c0"))
      .groupBy(col(keyCol), col("d"))
      .agg(transform(array_sort(collect_list(struct(col("x"), col("c0")))),
        e => e.getField("c0")).as("arr"))
    val a = lit(alpha)
    val ca = lit(1 - alpha) // parses the same decimal literal as the SQL text
    val bt = lit(beta)
    val cb = lit(1 - beta)
    val seed = struct(
      element_at(col("arr"), 2).as("l"),
      (element_at(col("arr"), 2) - element_at(col("arr"), 1)).as("b"),
      lit(0.0).as("sse"))
    val folded = aggregate(
      slice(col("arr"), lit(3), greatest(col("d") - 2, lit(0))),
      seed,
      (s, y) => {
        val pred = s.getField("l") + s.getField("b")
        val lNew = a * y + ca * pred
        struct(
          lNew.as("l"),
          (bt * (lNew - s.getField("l")) + cb * s.getField("b")).as("b"),
          (s.getField("sse") + (y - pred) * (y - pred)).as("sse"))
      })
    arrs
      .where(col("d") >= 2)
      .withColumn("_h", folded)
      .select(col(keyCol), col("d").cast("long").as("days"),
        round(col("_h").getField("l"), 6).as("level"),
        round(col("_h").getField("b"), 6).as("trend"),
        round(col("_h").getField("l") + lit(horizon.toDouble) * col("_h").getField("b"), 6)
          .as(s"forecast_$horizon"),
        round(col("_h").getField("sse"), 6).as("sse"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[holtLinear]] — a recursive CTE carrying (l, b, sse)
    * with the same literal coefficients and op order as the Spark fold.
    */
  def holtLinearSql(tbl: String, keyCol: String, tsCol: String,
      alpha: Double = 0.3, beta: Double = 0.2, horizon: Int = 7): String = {
    val a = alpha.toString
    val ca = (1 - alpha).toString
    val bt = beta.toString
    val cb = (1 - beta).toString
    s"""WITH RECURSIVE daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       keys AS (SELECT DISTINCT $keyCol FROM daily),
       grid AS (SELECT $keyCol, d, CAST(unnest(range(0, d)) AS INT) AS x
         FROM keys CROSS JOIN span),
       dx AS (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
         FROM daily CROSS JOIN span),
       arrs AS (SELECT $keyCol, MAX(d) AS d,
           list(CAST(COALESCE(c, 0) AS DOUBLE) ORDER BY x) AS arr
         FROM grid LEFT JOIN dx USING ($keyCol, x)
         GROUP BY $keyCol),
       r AS (
         SELECT $keyCol, d, arr, 2 AS t,
             arr[2] AS l, arr[2] - arr[1] AS b, CAST(0.0 AS DOUBLE) AS sse
           FROM arrs WHERE d >= 2
         UNION ALL
         SELECT $keyCol, d, arr, t + 1,
             $a * arr[t+1] + $ca * (l + b),
             $bt * (($a * arr[t+1] + $ca * (l + b)) - l) + $cb * b,
             sse + (arr[t+1] - (l + b)) * (arr[t+1] - (l + b))
           FROM r WHERE t < d)
       SELECT $keyCol, CAST(d AS BIGINT) AS days,
         round(l, 6) AS level,
         round(b, 6) AS trend,
         round(l + ${horizon.toDouble} * b, 6) AS forecast_$horizon,
         round(sse, 6) AS sse
       FROM r WHERE t = d ORDER BY $keyCol"""
  }

  /** SEASONAL Mann-Kendall (Hirsch & Slack, WRR 1984): the [[mannKendall]]
    * monotone-trend test computed WITHIN each day-of-week season and
    * combined (S = ΣS_s, Var = ΣVar_s) — a clean weekly cycle contributes
    * zero cross-season noise, so a real drift under strong seasonality is
    * detected where plain MK's variance drowns it (and a pure cycle stays
    * "flat" instead of false-alarming).
    *
    * Same grid discipline as [[mannKendall]] (dense calendar, zeros for
    * silent days, dow = (epoch_days + 4) mod 7 — the portable
    * [[dowProfile]] convention); the pair join gains the season equi-key,
    * so per-key fan-out DROPS 7× versus plain MK. All counts integer;
    * variance/z are one fixed-shape double expression.
    */
  def seasonalMannKendall(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      max(to_date(col(tsCol))).as("d1"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      .join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol),
        datediff(col("day"), lit("1970-01-01")).cast("long").as("x"),
        coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("dow", pmod(col("x") + 4, lit(7)))
    val a = grid.select(col(keyCol), col("dow"), col("x").as("xa"), col("c").as("ca"))
    val b = grid.select(col(keyCol), col("dow"), col("x").as("xb"), col("c").as("cb"))
    val s = a.join(b, Seq(keyCol, "dow")).where(col("xa") < col("xb"))
      .groupBy(col(keyCol))
      .agg(sum(signum((col("cb") - col("ca")).cast("double")).cast("long"))
        .as("s_stat"))
    // per-season sizes and ties: Var = Σ_s [n_s(n_s−1)(2n_s+5) − Σ_t …]/18
    val nBySeason = grid.groupBy(col(keyCol), col("dow"))
      .agg(count(lit(1)).as("ns"))
      .groupBy(col(keyCol))
      .agg(sum(col("ns")).as("n"),
        sum(col("ns") * (col("ns") - 1) * (col("ns") * 2 + 5)).as("var_base"))
    val ties = grid.groupBy(col(keyCol), col("dow"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col(keyCol))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_corr"))
    def d(c: Column) = c.cast("double")
    val varS = (d(col("var_base")) - d(col("tie_corr"))) / 18.0
    val z = when(col("s_stat") > 0, (d(col("s_stat")) - 1.0) / sqrt(varS))
      .when(col("s_stat") < 0, (d(col("s_stat")) + 1.0) / sqrt(varS))
      .otherwise(lit(0.0))
    s.join(nBySeason, Seq(keyCol)).join(ties, Seq(keyCol))
      .select(col(keyCol), col("n").as("n_days"), col("s_stat"),
        round(varS, 4).as("var_s"),
        round(z, 4).as("z"),
        when(col("s_stat") > 0, lit("up"))
          .when(col("s_stat") < 0, lit("down"))
          .otherwise(lit("flat")).as("direction"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[seasonalMannKendall]]. */
  def seasonalMannKendallSql(tbl: String, keyCol: String,
      tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
         span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
             MAX(CAST($tsCol AS DATE)) AS d1 FROM $tbl),
         grid AS (SELECT $keyCol, x, c, (x + 4) % 7 AS dow FROM (
           SELECT k.$keyCol,
             CAST(date_diff('day', DATE '1970-01-01', CAST(gd AS DATE)) AS BIGINT) AS x,
             COALESCE(daily.c, 0) AS c
           FROM (SELECT DISTINCT $keyCol FROM daily) k
           CROSS JOIN (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
               CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS gd FROM span)
           LEFT JOIN daily ON k.$keyCol = daily.$keyCol
             AND CAST(gd AS DATE) = daily.day)),
         s AS (SELECT a.$keyCol,
             CAST(SUM(CAST(sign(CAST(b.c - a.c AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_stat
           FROM grid a JOIN grid b ON a.$keyCol = b.$keyCol AND a.dow = b.dow
             AND a.x < b.x
           GROUP BY 1),
         nrel AS (SELECT $keyCol, CAST(SUM(ns) AS BIGINT) AS n,
             CAST(SUM(ns * (ns - 1) * (ns * 2 + 5)) AS BIGINT) AS var_base
           FROM (SELECT $keyCol, dow, COUNT(*) AS ns FROM grid GROUP BY 1, 2)
           GROUP BY 1),
         ties AS (SELECT $keyCol,
             CAST(SUM(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie_corr
           FROM (SELECT $keyCol, dow, c, COUNT(*) AS t FROM grid GROUP BY 1, 2, 3)
           GROUP BY 1),
         f AS (SELECT s.$keyCol, n, s_stat,
             (CAST(var_base AS DOUBLE) - CAST(tie_corr AS DOUBLE)) / 18.0 AS var_s
           FROM s JOIN nrel USING ($keyCol) JOIN ties USING ($keyCol))
         SELECT $keyCol, n AS n_days, s_stat,
           round(var_s, 4) AS var_s,
           round(CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(var_s)
                      WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(var_s)
                      ELSE 0.0 END, 4) AS z,
           CASE WHEN s_stat > 0 THEN 'up' WHEN s_stat < 0 THEN 'down'
                ELSE 'flat' END AS direction
         FROM f ORDER BY $keyCol"""

  /** Ljung-Box portmanteau over the [[autocorrDaily]] per-lag panel:
    * Q = n(n+2) Σ_{k≤m} r_k²/(n−k) — "is there ANY autocorrelation left",
    * the one-number whiteness gate a residual series (e.g. after
    * [[stlDecompose]] or [[holtLinear]]) must pass. r_k is autocorr_daily's
    * per-lag Pearson estimator (documented variant: same panel, same
    * rounding, so the two operators can never disagree about a lag).
    *
    * r_k²/(n−k) terms round to 9 then fold as DECIMAL; the χ²₀.₉₅ gate is
    * emitted only when every requested lag had a defined r (else NULL —
    * a degenerate flat series has no whiteness to test). Composition adds
    * ONE bounded aggregation over the (key × maxLag) panel.
    */
  def ljungBox(df: DataFrame, keyCol: String, tsCol: String,
      maxLag: Int = 10): DataFrame = {
    // upper χ²(df=maxLag) 95% quantiles for the gate, df 1..14
    val chi = Map(1 -> 3.841, 2 -> 5.991, 3 -> 7.815, 4 -> 9.488, 5 -> 11.070,
      6 -> 12.592, 7 -> 14.067, 8 -> 15.507, 9 -> 16.919, 10 -> 18.307,
      11 -> 19.675, 12 -> 21.026, 13 -> 22.362, 14 -> 23.685)
    require(chi.contains(maxLag), s"ljungBox: unsupported maxLag $maxLag")
    val ac = autocorrDaily(df, keyCol, tsCol, maxLag)
    def d(c: Column) = c.cast("double")
    val term = round(col("r") * col("r") / d(col("n_days")), 9)
    ac.groupBy(col(keyCol))
      .agg(max(col("n_days") + col("lag")).as("n_series"),
        count(col("r")).as("lags_used"),
        sum(when(col("r").isNotNull, term).cast("decimal(18,9)")).as("_lb_s"))
      .select(col(keyCol), col("n_series"), col("lags_used"),
        round(d(col("n_series")) * (d(col("n_series")) + lit(2.0)) *
          d(col("_lb_s")), 4).as("q_stat"),
        when(col("lags_used") === maxLag,
          d(col("n_series")) * (d(col("n_series")) + lit(2.0)) * d(col("_lb_s"))
            > lit(chi(maxLag))).as("reject_95"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[ljungBox]] — composes [[autocorrDailySql]]. */
  def ljungBoxSql(tbl: String, keyCol: String, tsCol: String,
      maxLag: Int = 10): String = {
    val chi = Map(1 -> 3.841, 2 -> 5.991, 3 -> 7.815, 4 -> 9.488, 5 -> 11.070,
      6 -> 12.592, 7 -> 14.067, 8 -> 15.507, 9 -> 16.919, 10 -> 18.307,
      11 -> 19.675, 12 -> 21.026, 13 -> 22.362, 14 -> 23.685)
    s"""WITH ac AS (${autocorrDailySql(tbl, keyCol, tsCol, maxLag)}),
       agg AS (SELECT $keyCol,
           CAST(MAX(n_days + lag) AS BIGINT) AS n_series,
           COUNT(r) AS lags_used,
           SUM(CASE WHEN r IS NOT NULL
             THEN CAST(round(r * r / CAST(n_days AS DOUBLE), 9) AS DECIMAL(18,9))
             END) AS s
         FROM ac GROUP BY $keyCol)
       SELECT $keyCol, n_series, lags_used,
         round(CAST(n_series AS DOUBLE) * (CAST(n_series AS DOUBLE) + 2.0)
           * CAST(s AS DOUBLE), 4) AS q_stat,
         CASE WHEN lags_used = $maxLag
           THEN CAST(n_series AS DOUBLE) * (CAST(n_series AS DOUBLE) + 2.0)
             * CAST(s AS DOUBLE) > ${chi(maxLag)} END AS reject_95
       FROM agg ORDER BY $keyCol"""
  }

  /** Extreme-value (Gumbel) capacity estimate from weekly BLOCK MAXIMA of
    * the per-key daily counts — "what is the 1-in-T-weeks peak day": by
    * Fisher-Tippett the max of a block of light-tailed daily counts is
    * Gumbel-attracted, so fit by method of moments
    *   β̂ = s·√6/π,  μ̂ = m − γ·β̂   (γ Euler-Mascheroni)
    * and read the T-block return level μ̂ − β̂·ln(−ln(1 − 1/T)) — the
    * provisioning number a mean+3σ rule silently underestimates (the max
    * distribution is skew). Blocks are calendar weeks of the dense
    * zero-filled grid; moments fold as exact integers, the fit is one
    * fixed-shape double expression. Only FULL 7-day blocks count.
    */
  def extremeValue(df: DataFrame, keyCol: String, tsCol: String,
      returnBlocks: Int = 52): DataFrame = {
    require(returnBlocks >= 2, s"extremeValue: bad horizon $returnBlocks")
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0), col("d") - 1)).as("x"),
        col("d"))
      .join(daily.crossJoin(broadcast(span))
          .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
            col("c")),
        Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("x"), col("d"),
        coalesce(col("c"), lit(0L)).as("c"))
    val blocks = grid
      .where((col("x") / 7).cast("int") < (col("d") / 7).cast("int"))
      .groupBy(col(keyCol), (col("x") / 7).cast("int").as("wk"))
      .agg(max(col("c")).as("mx"))
    def d(c: Column) = c.cast("double")
    val mom = blocks.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_blocks"), sum(col("mx")).as("sx"),
        sum(col("mx") * col("mx")).as("sxx"))
    val m = d(col("sx")) / d(col("n_blocks"))
    val sd = sqrt((d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n_blocks"))) /
      (d(col("n_blocks")) - lit(1.0)))
    val gamma = 0.5772156649015329
    val beta = sd * lit(math.sqrt(6.0) / math.Pi)
    val mu = m - lit(gamma) * beta
    val rl = mu - beta * log(-log(lit(1.0) - lit(1.0 / returnBlocks)))
    mom.where(col("n_blocks") >= 2)
      .select(col(keyCol), col("n_blocks"),
        round(m, 4).as("block_mean"),
        round(sd, 4).as("block_std"),
        round(mu, 4).as("gumbel_mu"),
        round(beta, 4).as("gumbel_beta"),
        round(rl, 4).as(s"return_level_$returnBlocks"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[extremeValue]] — the √6/π and −ln(−ln(…))
    * constants are emitted as the SAME Scala doubles the Column form
    * folds, so both engines multiply identical IEEE values.
    */
  def extremeValueSql(tbl: String, keyCol: String, tsCol: String,
      returnBlocks: Int = 52): String = {
    val c1 = math.sqrt(6.0) / math.Pi
    val gamma = 0.5772156649015329
    val lnln = -math.log(-math.log(1.0 - 1.0 / returnBlocks))
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       grid AS (SELECT k.$keyCol, CAST(g.x AS INT) AS x, d, COALESCE(daily.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS x, d FROM span) g
         LEFT JOIN (SELECT $keyCol,
             CAST(date_diff('day', d0, day) AS INT) AS x, c
           FROM daily CROSS JOIN span) daily
           ON daily.$keyCol = k.$keyCol AND daily.x = g.x),
       blocks AS (SELECT $keyCol, x // 7 AS wk, MAX(c) AS mx FROM grid
         WHERE x // 7 < d // 7 GROUP BY 1, 2),
       mom AS (SELECT $keyCol, COUNT(*) AS n_blocks,
           CAST(SUM(mx) AS BIGINT) AS sx, CAST(SUM(mx * mx) AS BIGINT) AS sxx
         FROM blocks GROUP BY 1),
       f AS (SELECT $keyCol, n_blocks,
           CAST(sx AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS m,
           sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n_blocks AS DOUBLE))
             / (CAST(n_blocks AS DOUBLE) - 1.0)) AS sd
         FROM mom WHERE n_blocks >= 2)
       SELECT $keyCol, n_blocks,
         round(m, 4) AS block_mean,
         round(sd, 4) AS block_std,
         round(m - $gamma * (sd * $c1), 4) AS gumbel_mu,
         round(sd * $c1, 4) AS gumbel_beta,
         round((m - $gamma * (sd * $c1)) + (sd * $c1) * $lnln, 4)
           AS return_level_$returnBlocks
       FROM f ORDER BY $keyCol"""
  }

  /** Friedman test (Friedman 1937) across keys using calendar days as
    * BLOCKS: rank the k key counts within every day (average ranks for
    * ties), then ask whether any key consistently out-ranks the others —
    * the nonparametric repeated-measures ANOVA, immune to the day-level
    * volume swings that wreck a raw-count comparison. Reported with the
    * tie-corrected statistic χ²/C, C = 1 − ΣT/(n·k·(k²−1)).
    *
    * Rank arithmetic stays INTEGER by working in doubled ranks:
    * 2·avgrank = 2·|{cᵢ < c_j}| + |{cᵢ = c_j}| + 1, computed by a per-day
    * self-join of the (day × key) relation — k² rows per day, bounded by
    * the type table, never by events. One double expression at the end.
    */
  /** Shared doubled-rank fold behind [[friedmanTest]] and [[kendallW]]:
    * one row with (n, k, sr2, tie3) over the day×key grid.
    */
  private def friedmanCore(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0), col("d") - 1)).as("x"))
      .join(daily.crossJoin(broadcast(span))
          .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
            col("c")),
        Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("x"), coalesce(col("c"), lit(0L)).as("c"))
    val other = grid.select(col("x"), col("c").as("ci"))
    val rank2 = grid.join(other, Seq("x"))
      .groupBy(col(keyCol), col("x"), col("c"))
      .agg((sum(when(col("ci") < col("c"), 2L).otherwise(0L)) +
        sum(when(col("ci") === col("c"), 1L).otherwise(0L)) + 1L).as("r2"))
    val perKey = rank2.groupBy(col(keyCol)).agg(sum(col("r2")).as("rsum2"))
    val sumR2sq = perKey.agg(
      sum((col("rsum2").cast("decimal(19,0)") * col("rsum2").cast("decimal(19,0)"))
        .cast("decimal(38,0)")).as("sr2"),
      count(lit(1)).as("k"))
    val ties = grid.groupBy(col("x"), col("c")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tie3"),
        countDistinct(col("x")).as("n"))
    sumR2sq.crossJoin(broadcast(ties))
  }

  def friedmanTest(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val n = d(col("n"))
    val k = d(col("k"))
    // ΣR² = ΣR2²/4; χ² = 12/(nk(k+1))·ΣR² − 3n(k+1)
    val chi2 = lit(12.0) / (n * k * (k + lit(1.0))) * (d(col("sr2")) / lit(4.0)) -
      lit(3.0) * n * (k + lit(1.0))
    val corr = lit(1.0) - d(col("tie3")) / (n * k * (k * k - lit(1.0)))
    // χ²(k−1) upper 5% for k−1 = 1..14
    val chiCrit = Map(1 -> 3.841, 2 -> 5.991, 3 -> 7.815, 4 -> 9.488,
      5 -> 11.070, 6 -> 12.592, 7 -> 14.067, 8 -> 15.507, 9 -> 16.919,
      10 -> 18.307, 11 -> 19.675, 12 -> 21.026, 13 -> 22.362, 14 -> 23.685)
    val critArr = array((1 to 14).map(i => lit(chiCrit(i))): _*)
    friedmanCore(df, keyCol, tsCol)
      .select(col("n").cast("long").as("n_blocks"), col("k").as("k_keys"),
        round(chi2, 4).as("chi2"),
        when(corr > 0, round(chi2 / corr, 4)).as("chi2_tied"),
        when(corr > 0 && col("k") >= 2 && col("k") <= 15,
          chi2 / corr > element_at(critArr, (col("k") - 1).cast("int")))
          .as("reject_95"))
  }

  /** Kendall's coefficient of concordance W (Kendall & Babington Smith
    * 1939): HOW STRONGLY the calendar days agree on the key ordering, on
    * [0,1] — the effect size behind [[friedmanTest]]'s yes/no (they share
    * the doubled-rank fold; W = χ²_tied/(n(k−1))). W ≈ 1 means every day
    * ranks the keys identically (a stable traffic hierarchy); W ≈ 0 means
    * the daily orderings are noise even if χ² happens to reject at huge n.
    */
  def kendallW(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val n = d(col("n"))
    val k = d(col("k"))
    val chi2 = lit(12.0) / (n * k * (k + lit(1.0))) * (d(col("sr2")) / lit(4.0)) -
      lit(3.0) * n * (k + lit(1.0))
    val corr = lit(1.0) - d(col("tie3")) / (n * k * (k * k - lit(1.0)))
    friedmanCore(df, keyCol, tsCol)
      .select(col("n").cast("long").as("n_blocks"), col("k").as("k_keys"),
        when(corr > 0 && col("k") >= 2,
          round(chi2 / corr / (n * (k - lit(1.0))), 6)).as("w"))
  }

  /** DuckDB mirror of [[kendallW]]. */
  def kendallWSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH ${friedmanCoreSql(tbl, keyCol, tsCol)},
       f AS (SELECT n, k,
           12.0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
             * (CAST(sr2 AS DOUBLE) / 4.0)
             - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) AS chi2,
           1.0 - CAST(tie3 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)) AS corr
         FROM sq CROSS JOIN tie)
       SELECT CAST(n AS BIGINT) AS n_blocks, k AS k_keys,
         CASE WHEN corr > 0 AND k >= 2 THEN round(chi2 / corr
           / (CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)), 6) END AS w
       FROM f"""

  /** Shared CTE chain behind [[friedmanTestSql]] and [[kendallWSql]]:
    * ends with `sq(sr2, k)` and `tie(tie3, n)`.
    */
  private def friedmanCoreSql(tbl: String, keyCol: String,
      tsCol: String): String =
    s"""daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       grid AS (SELECT k.$keyCol, CAST(g.x AS INT) AS x, COALESCE(dd.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS x FROM span) g
         LEFT JOIN (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
             FROM daily CROSS JOIN span) dd
           ON dd.$keyCol = k.$keyCol AND dd.x = g.x),
       r2 AS (SELECT a.$keyCol, a.x, a.c,
           SUM(CASE WHEN b.c < a.c THEN 2 ELSE 0 END)
             + SUM(CASE WHEN b.c = a.c THEN 1 ELSE 0 END) + 1 AS r2
         FROM grid a JOIN grid b ON b.x = a.x
         GROUP BY 1, 2, 3),
       pk AS (SELECT $keyCol, CAST(SUM(r2) AS BIGINT) AS rsum2 FROM r2 GROUP BY 1),
       sq AS (SELECT SUM(CAST(CAST(rsum2 AS DECIMAL(19,0)) * CAST(rsum2 AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS sr2,
           COUNT(*) AS k FROM pk),
       tie AS (SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie3,
           COUNT(DISTINCT x) AS n
         FROM (SELECT x, c, COUNT(*) AS t FROM grid GROUP BY x, c))"""

  /** DuckDB mirror of [[friedmanTest]]. */
  def friedmanTestSql(tbl: String, keyCol: String, tsCol: String): String = {
    val chiCrit = Seq(3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067,
      15.507, 16.919, 18.307, 19.675, 21.026, 22.362, 23.685)
    val critList = chiCrit.mkString("[", ", ", "]")
    s"""WITH ${friedmanCoreSql(tbl, keyCol, tsCol)},
       f AS (SELECT n, k,
           12.0 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0))
             * (CAST(sr2 AS DOUBLE) / 4.0)
             - 3.0 * CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) AS chi2,
           1.0 - CAST(tie3 AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)) AS corr
         FROM sq CROSS JOIN tie)
       SELECT CAST(n AS BIGINT) AS n_blocks, k AS k_keys,
         round(chi2, 4) AS chi2,
         CASE WHEN corr > 0 THEN round(chi2 / corr, 4) END AS chi2_tied,
         CASE WHEN corr > 0 AND k >= 2 AND k <= 15
           THEN chi2 / corr > ($critList)[CAST(k AS INT) - 1] END AS reject_95
       FROM f"""
  }

  /** Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951;
    * Mandelbrot-Wallis 1969) of the per-key daily count series: H ≈ 0.5
    * for memoryless traffic, H → 1 for long-range-dependent load (slow
    * regime drift [[autocorrDaily]]'s fixed-lag panel underestimates),
    * H < 0.5 for mean-reverting. For each window size s, the series
    * splits into full blocks; each block contributes log(R/S) (range of
    * cumulative deviations over the block std); H is the OLS slope of the
    * per-size mean log(R/S) against log(s).
    *
    * Every relation is calendar×sizes-bounded; block folds are windowed
    * cumsums inside (key, size, block) partitions; log terms round to 9
    * and fold as DECIMAL; the 3-point OLS is closed-form.
    */
  def hurstExponent(df: DataFrame, keyCol: String, tsCol: String,
      sizes: Seq[Int] = Seq(5, 10, 15)): DataFrame = {
    require(sizes.size >= 2 && sizes.forall(_ >= 2), "hurstExponent: bad sizes")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0), col("d") - 1)).as("x"),
        col("d"))
      .join(daily.crossJoin(broadcast(span))
          .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
            col("c")),
        Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("x"), col("d"),
        coalesce(col("c"), lit(0L)).as("c"))
    val withSize = grid
      .crossJoin(broadcast(sizes.toDF("s")))
      .where(col("x") < (col("d") / col("s")).cast("int") * col("s"))
      .withColumn("blk", (col("x") / col("s")).cast("int"))
    def d(c: Column) = c.cast("double")
    val blockStats = withSize.groupBy(col(keyCol), col("s"), col("blk"))
      .agg(sum(col("c")).as("bs"), sum(col("c") * col("c")).as("bss"),
        count(lit(1)).as("bn"))
    val withMean = withSize.join(blockStats, Seq(keyCol, "s", "blk"))
      .withColumn("dev", d(col("c")) - d(col("bs")) / d(col("bn")))
    val w = Window.partitionBy(keyCol, "s", "blk").orderBy("x")
    val cum = withMean.withColumn("wt", sum(col("dev")).over(w))
    val rs = cum.groupBy(col(keyCol), col("s"), col("blk"),
        col("bs"), col("bss"), col("bn"))
      .agg(max(col("wt")).as("wmax"), min(col("wt")).as("wmin"))
      .withColumn("sd", sqrt(greatest(
        d(col("bss")) / d(col("bn")) -
          (d(col("bs")) / d(col("bn"))) * (d(col("bs")) / d(col("bn"))),
        lit(0.0))))
      .where(col("sd") > 0)
      .select(col(keyCol), col("s"),
        round(log((col("wmax") - col("wmin")) / col("sd")), 9)
          .cast("decimal(18,9)").as("lrs"))
    val bySize = rs.groupBy(col(keyCol), col("s"))
      .agg(sum(col("lrs")).as("slrs"), count(lit(1)).as("nb"))
      .select(col(keyCol), log(d(col("s"))).as("lx"),
        (d(col("slrs")) / d(col("nb"))).as("ly"))
    val ols = bySize.groupBy(col(keyCol))
      .agg(count(lit(1)).as("np"),
        sum(round(col("lx"), 9).cast("decimal(18,9)")).as("sx"),
        sum(round(col("ly"), 9).cast("decimal(18,9)")).as("sy"),
        sum(round(col("lx") * col("ly"), 9).cast("decimal(18,9)")).as("sxy"),
        sum(round(col("lx") * col("lx"), 9).cast("decimal(18,9)")).as("sxx"))
    ols.where(col("np") >= 2)
      .select(col(keyCol), col("np").as("n_sizes"),
        round((d(col("np")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (d(col("np")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))), 4)
          .as("hurst"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[hurstExponent]]. */
  def hurstExponentSql(tbl: String, keyCol: String, tsCol: String,
      sizes: Seq[Int] = Seq(5, 10, 15)): String = {
    val sizeList = sizes.mkString("[", ", ", "]")
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       grid AS (SELECT k.$keyCol, CAST(g.x AS INT) AS x, g.d, COALESCE(dd.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS x, d FROM span) g
         LEFT JOIN (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
             FROM daily CROSS JOIN span) dd
           ON dd.$keyCol = k.$keyCol AND dd.x = g.x),
       ws AS (SELECT $keyCol, x, c, s, x // s AS blk
         FROM grid CROSS JOIN (SELECT unnest($sizeList) AS s)
         WHERE x < (d // s) * s),
       bstat AS (SELECT $keyCol, s, blk, CAST(SUM(c) AS BIGINT) AS bs,
           CAST(SUM(c * c) AS BIGINT) AS bss, COUNT(*) AS bn
         FROM ws GROUP BY 1, 2, 3),
       cum AS (SELECT ws.$keyCol, ws.s, ws.blk, bs, bss, bn,
           SUM(CAST(c AS DOUBLE) - CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE))
             OVER (PARTITION BY ws.$keyCol, ws.s, ws.blk ORDER BY x) AS wt
         FROM ws JOIN bstat USING ($keyCol, s, blk)),
       rsin AS (SELECT $keyCol, s, blk, bs, bss, bn,
           MAX(wt) AS wmax, MIN(wt) AS wmin
         FROM cum GROUP BY 1, 2, 3, 4, 5, 6),
       rs AS (SELECT $keyCol, s,
           CAST(round(ln((wmax - wmin) / sd), 9) AS DECIMAL(18,9)) AS lrs
         FROM (SELECT $keyCol, s, wmax, wmin,
             sqrt(greatest(CAST(bss AS DOUBLE) / CAST(bn AS DOUBLE)
               - (CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE))
                 * (CAST(bs AS DOUBLE) / CAST(bn AS DOUBLE)), 0.0)) AS sd
           FROM rsin)
         WHERE sd > 0),
       bysize AS (SELECT $keyCol, ln(CAST(s AS DOUBLE)) AS lx,
           CAST(SUM(lrs) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ly
         FROM rs GROUP BY $keyCol, s),
       ols AS (SELECT $keyCol, COUNT(*) AS np,
           SUM(CAST(round(lx, 9) AS DECIMAL(18,9))) AS sx,
           SUM(CAST(round(ly, 9) AS DECIMAL(18,9))) AS sy,
           SUM(CAST(round(lx * ly, 9) AS DECIMAL(18,9))) AS sxy,
           SUM(CAST(round(lx * lx, 9) AS DECIMAL(18,9))) AS sxx
         FROM bysize GROUP BY $keyCol)
       SELECT $keyCol, np AS n_sizes,
         round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
           AS hurst
       FROM ols WHERE np >= 2 ORDER BY $keyCol"""
  }

  /** Index-of-dispersion test (Fisher 1950) per key: is daily traffic
    * Poisson, or overdispersed (bursty/clustered) / underdispersed
    * (rate-limited)? D = (n−1)·s²/x̄ ~ χ²(n−1) under Poisson; the
    * variance-to-mean ratio is the effect size every capacity model and
    * anomaly threshold silently assumes equals 1. Critical value at large
    * df via the Wilson–Hilferty cube approximation (closed form, both
    * engines bit-identical).
    *
    * Calendar grid with explicit zero days; DECIMAL moment folds; one
    * row per key.
    */
  def dispersionTest(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0), col("d") - 1)).as("x"))
      .join(daily.crossJoin(broadcast(span))
          .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
            col("c")),
        Seq(keyCol, "x"), "left")
      .select(col(keyCol), coalesce(col("c"), lit(0L)).as("c"))
    def d(c: Column) = c.cast("double")
    val mom = grid.groupBy(keyCol)
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
    val n = d(col("n"))
    val mean = d(col("s")) / n
    val variance = (d(col("ss")) - d(col("s")) * d(col("s")) / n) /
      (n - lit(1.0))
    val chi2 = (n - lit(1.0)) * variance / mean
    val dfree = n - lit(1.0)
    // Wilson-Hilferty: χ²_{.95}(df) ≈ df·(1 − 2/(9df) + 1.645·√(2/(9df)))³
    val wh = lit(1.0) - lit(2.0) / (lit(9.0) * dfree) +
      lit(1.645) * sqrt(lit(2.0) / (lit(9.0) * dfree))
    val crit = dfree * wh * wh * wh
    mom.where(col("n") >= 2 && col("s") > 0)
      .select(col(keyCol), col("n").as("n_days"),
        round(mean, 4).as("mean"), round(variance, 4).as("variance"),
        round(variance / mean, 4).as("dispersion"),
        round(chi2, 2).as("chi2"),
        (chi2 > crit).as("overdispersed_95"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[dispersionTest]]. */
  def dispersionTestSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       grid AS (SELECT k.$keyCol, COALESCE(dd.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS x FROM span) g
         LEFT JOIN (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
             FROM daily CROSS JOIN span) dd
           ON dd.$keyCol = k.$keyCol AND dd.x = g.x),
       mom AS (SELECT $keyCol, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s,
           CAST(SUM(c * c) AS BIGINT) AS ss
         FROM grid GROUP BY 1),
       f AS (SELECT $keyCol, n,
           CAST(s AS DOUBLE) / n AS mean,
           (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
             / (CAST(n AS DOUBLE) - 1.0) AS var,
           CAST(n AS DOUBLE) - 1.0 AS dfree
         FROM mom WHERE n >= 2 AND s > 0),
       g2 AS (SELECT $keyCol, n, mean, var,
           dfree * var / mean AS chi2,
           dfree * pow(1.0 - 2.0 / (9.0 * dfree)
             + 1.645 * sqrt(2.0 / (9.0 * dfree)), 3) AS crit
         FROM f)
       SELECT $keyCol, n AS n_days, round(mean, 4) AS mean,
         round(var, 4) AS variance, round(var / mean, 4) AS dispersion,
         round(chi2, 2) AS chi2, chi2 > crit AS overdispersed_95
       FROM g2 ORDER BY $keyCol"""

  /** XmR individuals control chart (Shewhart 1931; Wheeler's XmR form):
    * process limits x̄ ± 2.66·M̄R from the MOVING RANGE of consecutive
    * daily counts — the SPC readout ops teams actually chart. The
    * moving-range basis makes the limits immune to slow drift inflating
    * a global σ, which is exactly what wrecks naive ±3σ bands; 2.66 is
    * 3/d₂ for n=2 subgroups. Violations = days outside [LCL, UCL].
    *
    * Calendar grid with explicit zeros; MR via one lag window per key
    * partition; DECIMAL folds; one row per key.
    */
  def xmrChart(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0), col("d") - 1)).as("x"))
      .join(daily.crossJoin(broadcast(span))
          .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
            col("c")),
        Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("x"), coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy(keyCol).orderBy("x")
    val withMr = grid.withColumn("mr",
      abs(col("c") - lag(col("c"), 1).over(w)))
    def d(c: Column) = c.cast("double")
    val stats = withMr.groupBy(keyCol)
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("mr")).as("smr"), count(col("mr")).as("nmr"))
      .where(col("nmr") >= 1)
      .select(col(keyCol), col("n"),
        round(d(col("s")) / d(col("n")), 4).as("center"),
        round(d(col("smr")) / d(col("nmr")), 4).as("mr_bar"))
      .withColumn("ucl", round(col("center") + lit(2.66) * col("mr_bar"), 4))
      .withColumn("lcl",
        round(greatest(col("center") - lit(2.66) * col("mr_bar"), lit(0.0)), 4))
    grid.join(broadcast(stats), Seq(keyCol))
      .groupBy(col(keyCol), col("n"), col("center"), col("mr_bar"),
        col("ucl"), col("lcl"))
      .agg(
        sum(when(d(col("c")) > col("ucl") || d(col("c")) < col("lcl"), 1L)
          .otherwise(0L)).as("n_violations"),
        min(when(d(col("c")) > col("ucl") || d(col("c")) < col("lcl"),
          col("x"))).as("first_violation_day"))
      .select(col(keyCol), col("n").as("n_days"), col("center"),
        col("mr_bar"), col("ucl"), col("lcl"), col("n_violations"),
        col("first_violation_day"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[xmrChart]]. */
  def xmrChartSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       grid AS (SELECT k.$keyCol, CAST(g.x AS INT) AS x, COALESCE(dd.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS x FROM span) g
         LEFT JOIN (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
             FROM daily CROSS JOIN span) dd
           ON dd.$keyCol = k.$keyCol AND dd.x = g.x),
       mr AS (SELECT $keyCol, x, c,
           abs(c - lag(c) OVER (PARTITION BY $keyCol ORDER BY x)) AS mrv
         FROM grid),
       st AS (SELECT $keyCol, COUNT(*) AS n,
           round(CAST(SUM(c) AS DOUBLE) / COUNT(*), 4) AS center,
           round(CAST(SUM(mrv) AS DOUBLE) / COUNT(mrv), 4) AS mr_bar
         FROM mr GROUP BY 1 HAVING COUNT(mrv) >= 1),
       lim AS (SELECT $keyCol, n, center, mr_bar,
           round(center + 2.66 * mr_bar, 4) AS ucl,
           round(greatest(center - 2.66 * mr_bar, 0.0), 4) AS lcl
         FROM st)
       SELECT grid.$keyCol, n AS n_days, center, mr_bar, ucl, lcl,
         CAST(SUM(CASE WHEN CAST(c AS DOUBLE) > ucl OR CAST(c AS DOUBLE) < lcl
           THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
         MIN(CASE WHEN CAST(c AS DOUBLE) > ucl OR CAST(c AS DOUBLE) < lcl
           THEN x END) AS first_violation_day
       FROM grid JOIN lim USING ($keyCol)
       GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY grid.$keyCol"""

  /** Peaks-over-threshold tail fit (Pickands 1975; method-of-moments GPD,
    * Hosking & Wallis 1987): [[extremeValue]]'s Gumbel uses one maximum
    * per week and discards every other large day; POT keeps ALL
    * exceedances over the p90 daily-count threshold and fits the
    * generalized Pareto to the excesses — more data in the tail, and the
    * shape ξ says whether the tail is bounded (ξ<0), exponential (ξ≈0),
    * or heavy/power-law (ξ>0), which Gumbel assumes away. MoM closed
    * form: ξ = ½(1 − m²/s²), σ = ½m(1 + m²/s²); the 365-day return level
    * is u + σ/ξ·((365·ζᵤ)^ξ − 1).
    *
    * Calendar grid, per-key p90 threshold (rounded 4) broadcast back,
    * DECIMAL excess moments — the [[graft.operators.Robust]] two-pass
    * value_bands shape on the day relation.
    */
  def potTail(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0), col("d") - 1)).as("x"))
      .join(daily.crossJoin(broadcast(span))
          .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
            col("c")),
        Seq(keyCol, "x"), "left")
      .select(col(keyCol), coalesce(col("c"), lit(0L)).as("c"))
    def d(c: Column) = c.cast("double")
    val th = grid.groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        round(percentile(d(col("c")), lit(0.9)), 4).as("u"))
    val exc = grid.join(broadcast(th), Seq(keyCol))
      .where(d(col("c")) > col("u"))
      .select(col(keyCol), col("n"), col("u"),
        round(d(col("c")) - col("u"), 4).cast("decimal(18,4)").as("e"))
    val mom = exc.groupBy(col(keyCol), col("n"), col("u"))
      .agg(count(lit(1)).as("ne"), sum(col("e")).as("se"),
        sum(col("e") * col("e")).as("see"))
      .where(col("ne") >= 2)
    val m = d(col("se")) / d(col("ne"))
    val s2 = (d(col("see")) - d(col("se")) * d(col("se")) / d(col("ne"))) /
      (d(col("ne")) - lit(1.0))
    val xi = lit(0.5) * (lit(1.0) - m * m / s2)
    val sigma = lit(0.5) * m * (lit(1.0) + m * m / s2)
    val zeta = d(col("ne")) / d(col("n"))
    val rl = col("u") + sigma / xi *
      (pow(lit(365.0) * zeta, xi) - lit(1.0))
    mom.where(s2 > 0)
      .select(col(keyCol), col("u").as("threshold"),
        col("ne").as("n_exceed"),
        round(xi, 4).as("xi"), round(sigma, 4).as("sigma"),
        when(abs(xi) > 1e-9, round(rl, 4)).as("return_level_365"),
        (xi > 0.05).as("heavy_tail"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[potTail]]. */
  def potTailSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       grid AS (SELECT k.$keyCol, COALESCE(dd.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS x FROM span) g
         LEFT JOIN (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
             FROM daily CROSS JOIN span) dd
           ON dd.$keyCol = k.$keyCol AND dd.x = g.x),
       th AS (SELECT $keyCol, COUNT(*) AS n,
           round(quantile_cont(CAST(c AS DOUBLE), 0.9), 4) AS u
         FROM grid GROUP BY 1),
       exc AS (SELECT grid.$keyCol, n, u,
           CAST(round(CAST(c AS DOUBLE) - u, 4) AS DECIMAL(18,4)) AS e
         FROM grid JOIN th USING ($keyCol) WHERE CAST(c AS DOUBLE) > u),
       mom AS (SELECT $keyCol, n, u, COUNT(*) AS ne, SUM(e) AS se,
           SUM(e * e) AS see
         FROM exc GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2),
       f AS (SELECT $keyCol, n, u, ne,
           CAST(se AS DOUBLE) / ne AS m,
           (CAST(see AS DOUBLE) - CAST(se AS DOUBLE) * CAST(se AS DOUBLE) / ne)
             / (CAST(ne AS DOUBLE) - 1.0) AS s2
         FROM mom),
       g2 AS (SELECT $keyCol, u, ne, n, m, s2,
           0.5 * (1.0 - m * m / s2) AS xi,
           0.5 * m * (1.0 + m * m / s2) AS sigma,
           CAST(ne AS DOUBLE) / n AS zeta
         FROM f WHERE s2 > 0)
       SELECT $keyCol, u AS threshold, ne AS n_exceed,
         round(xi, 4) AS xi, round(sigma, 4) AS sigma,
         CASE WHEN abs(xi) > 1e-9 THEN round(
           u + sigma / xi * (pow(365.0 * zeta, xi) - 1.0), 4) END
           AS return_level_365,
         xi > 0.05 AS heavy_tail
       FROM g2 ORDER BY $keyCol"""

  /** Von Neumann ratio test (von Neumann 1941): η = Σ(xₜ₊₁−xₜ)²/Σ(xₜ−x̄)²
    * over the daily-count series — E[η] = 2n/(n−1) ≈ 2 under randomness;
    * η << 2 = positive serial correlation (smooth regimes), η >> 2 =
    * oscillation. Sharper than [[runsTest]] against MAGNITUDE-level
    * autocorrelation (runs only sees the median-crossing pattern) and
    * cheaper than [[ljungBox]]'s lag panel when one number suffices.
    * z via the exact variance 4(n−2)/((n+1)(n−1)²)·... — the standard
    * normal form Var(η) = 4n²(n−2)/((n+1)(n−1)³).
    *
    * Calendar grid with explicit zeros; successive differences via one
    * per-key lag window; DECIMAL moment folds.
    */
  def vonNeumann(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0), col("d") - 1)).as("x"))
      .join(daily.crossJoin(broadcast(span))
          .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
            col("c")),
        Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("x"), coalesce(col("c"), lit(0L)).as("c"))
    val w = Window.partitionBy(keyCol).orderBy("x")
    val withD = grid.withColumn("dd", col("c") - lag(col("c"), 1).over(w))
    def d(c: Column) = c.cast("double")
    val mom = withD.groupBy(keyCol)
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"),
        sum(col("dd") * col("dd")).as("sdd"))
      .where(col("n") >= 3)
    val n = d(col("n"))
    val ssq = d(col("ss")) - d(col("s")) * d(col("s")) / n
    val eta = d(col("sdd")) / ssq
    val mu = lit(2.0) * n / (n - lit(1.0))
    val v = lit(4.0) * n * n * (n - lit(2.0)) /
      ((n + lit(1.0)) * (n - lit(1.0)) * (n - lit(1.0)) * (n - lit(1.0)))
    val z = (eta - mu) / sqrt(v)
    mom.where(ssq > 0)
      .select(col(keyCol), col("n").as("n_days"),
        round(eta, 4).as("eta"),
        round(z, 4).as("z"),
        (abs(z) > 1.96).as("reject_95"),
        when(z < -1.96, lit("persistent"))
          .when(z > 1.96, lit("oscillating"))
          .otherwise(lit("random")).as("regime"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[vonNeumann]]. */
  def vonNeumannSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       grid AS (SELECT k.$keyCol, CAST(g.x AS INT) AS x, COALESCE(dd.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS x FROM span) g
         LEFT JOIN (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
             FROM daily CROSS JOIN span) dd
           ON dd.$keyCol = k.$keyCol AND dd.x = g.x),
       wd AS (SELECT $keyCol, c,
           c - lag(c) OVER (PARTITION BY $keyCol ORDER BY x) AS dd
         FROM grid),
       mom AS (SELECT $keyCol, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s,
           CAST(SUM(c * c) AS BIGINT) AS ss, CAST(SUM(dd * dd) AS BIGINT) AS sdd
         FROM wd GROUP BY 1 HAVING COUNT(*) >= 3),
       f AS (SELECT $keyCol, n,
           CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n AS ssq,
           CAST(sdd AS DOUBLE) AS sdd, CAST(n AS DOUBLE) AS nd
         FROM mom),
       g2 AS (SELECT $keyCol, n, sdd / ssq AS eta,
           (sdd / ssq - 2.0 * nd / (nd - 1.0))
             / sqrt(4.0 * nd * nd * (nd - 2.0)
               / ((nd + 1.0) * (nd - 1.0) * (nd - 1.0) * (nd - 1.0))) AS z
         FROM f WHERE ssq > 0)
       SELECT $keyCol, n AS n_days, round(eta, 4) AS eta, round(z, 4) AS z,
         abs(z) > 1.96 AS reject_95,
         CASE WHEN z < -1.96 THEN 'persistent'
              WHEN z > 1.96 THEN 'oscillating'
              ELSE 'random' END AS regime
       FROM g2 ORDER BY $keyCol"""

  /** Wald–Wolfowitz runs test per key on the daily-count series: code
    * each calendar day above/below the key's own median (ties-and-below
    * are one symbol), count the RUNS of identical symbols, and z-score
    * against the randomness expectation μ = 2·n₁·n₀/n + 1. Too FEW runs
    * = clustered regimes (the slow drift a fixed-lag autocorrelation
    * panel can miss); too MANY = oscillation. The cheapest "is this
    * series even exchangeable" gate before trend machinery runs.
    *
    * The per-key median is the exact interpolated percentile over the
    * zero-filled calendar grid; run boundaries are a lag window inside
    * each key partition — calendar-bounded relations throughout.
    */
  def runsTest(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val span = df.agg(min(to_date(col(tsCol))).as("d0"),
      (datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol)))) + 1)
        .cast("int").as("d"))
    val grid = daily.select(col(keyCol)).distinct()
      .crossJoin(broadcast(span))
      .select(col(keyCol), explode(sequence(lit(0), col("d") - 1)).as("x"))
      .join(daily.crossJoin(broadcast(span))
          .select(col(keyCol), datediff(col("day"), col("d0")).cast("int").as("x"),
            col("c")),
        Seq(keyCol, "x"), "left")
      .select(col(keyCol), col("x"), coalesce(col("c"), lit(0L)).as("c"))
    val med = grid.groupBy(keyCol)
      .agg(round(percentile(col("c").cast("double"), lit(0.5)), 4).as("m"))
    val signs = grid.join(broadcast(med), Seq(keyCol))
      .select(col(keyCol), col("x"),
        when(col("c").cast("double") > col("m"), 1).otherwise(0).as("s"))
    val w = Window.partitionBy(keyCol).orderBy("x")
    val runs = signs
      .withColumn("brk",
        when(lag(col("s"), 1).over(w).isNull ||
          lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"), sum(col("s")).cast("long").as("n1"),
        sum(col("brk")).as("r"))
    def d(c: Column) = c.cast("double")
    val n1 = d(col("n1"))
    val n0 = d(col("n")) - n1
    val n = d(col("n"))
    val mu = lit(2.0) * n1 * n0 / n + lit(1.0)
    val v = lit(2.0) * n1 * n0 * (lit(2.0) * n1 * n0 - n) /
      (n * n * (n - lit(1.0)))
    val z = (d(col("r")) - mu) / sqrt(v)
    runs.select(col(keyCol), col("n").as("n_days"),
        col("n1").as("n_above"), (col("n") - col("n1")).as("n_below"),
        col("r").as("runs"),
        when(col("n1") > 0 && col("n") - col("n1") > 0 && col("n") > 1,
          round(z, 4)).as("z"),
        when(col("n1") > 0 && col("n") - col("n1") > 0 && col("n") > 1,
          abs(z) > 1.96).as("reject_95"))
      .orderBy(keyCol)
  }

  /** DuckDB mirror of [[runsTest]] (`quantile_cont` = Spark
    * `percentile`, both interpolated, both rounded to 4).
    */
  def runsTestSql(tbl: String, keyCol: String, tsCol: String): String =
    s"""WITH daily AS (SELECT $keyCol, CAST($tsCol AS DATE) AS day, COUNT(*) AS c
           FROM $tbl GROUP BY 1, 2),
       span AS (SELECT MIN(CAST($tsCol AS DATE)) AS d0,
           CAST(date_diff('day', MIN(CAST($tsCol AS DATE)),
             MAX(CAST($tsCol AS DATE))) + 1 AS INT) AS d FROM $tbl),
       grid AS (SELECT k.$keyCol, CAST(g.x AS INT) AS x, COALESCE(dd.c, 0) AS c
         FROM (SELECT DISTINCT $keyCol FROM daily) k
         CROSS JOIN (SELECT unnest(range(0, d)) AS x FROM span) g
         LEFT JOIN (SELECT $keyCol, CAST(date_diff('day', d0, day) AS INT) AS x, c
             FROM daily CROSS JOIN span) dd
           ON dd.$keyCol = k.$keyCol AND dd.x = g.x),
       med AS (SELECT $keyCol, round(quantile_cont(CAST(c AS DOUBLE), 0.5), 4) AS m
         FROM grid GROUP BY 1),
       signs AS (SELECT grid.$keyCol, x,
           CASE WHEN CAST(c AS DOUBLE) > m THEN 1 ELSE 0 END AS s
         FROM grid JOIN med USING ($keyCol)),
       runs AS (SELECT $keyCol, COUNT(*) AS n, CAST(SUM(s) AS BIGINT) AS n1,
           CAST(SUM(brk) AS BIGINT) AS r
         FROM (SELECT $keyCol, s,
             CASE WHEN lag(s) OVER (PARTITION BY $keyCol ORDER BY x) IS NULL
                    OR lag(s) OVER (PARTITION BY $keyCol ORDER BY x) <> s
                  THEN 1 ELSE 0 END AS brk
           FROM signs)
         GROUP BY $keyCol),
       f AS (SELECT $keyCol, n, n1, CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE) AS n0d,
           CAST(n1 AS DOUBLE) AS n1d, CAST(n AS DOUBLE) AS nd,
           CAST(r AS DOUBLE) AS rd, r
         FROM runs),
       g2 AS (SELECT $keyCol, n, n1, r, n0d, n1d, nd, rd,
           2.0 * n1d * n0d / nd + 1.0 AS mu,
           2.0 * n1d * n0d * (2.0 * n1d * n0d - nd)
             / (nd * nd * (nd - 1.0)) AS v
         FROM f)
       SELECT $keyCol, n AS n_days, n1 AS n_above,
         CAST(n - n1 AS BIGINT) AS n_below, r AS runs,
         CASE WHEN n1 > 0 AND n - n1 > 0 AND n > 1
           THEN round((rd - mu) / sqrt(v), 4) END AS z,
         CASE WHEN n1 > 0 AND n - n1 > 0 AND n > 1
           THEN abs((rd - mu) / sqrt(v)) > 1.96 END AS reject_95
       FROM g2 ORDER BY $keyCol"""
}
