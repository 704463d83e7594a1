package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CUPED variance reduction for A/B experiments (Deng, Xu, Kohavi,
  * Walker, WSDM 2013 — "Improving the Sensitivity of Online Controlled
  * Experiments by Utilizing Pre-Experiment Data"): regress each user's
  * in-experiment metric Y on their PRE-experiment metric X (same metric,
  * earlier window) and test the residual Y' = Y − θ(X − E[X]) instead of
  * Y. Since randomization makes X independent of assignment, E[Y'] per
  * arm is unbiased for E[Y], while var(Y') = var(Y)(1 − ρ²) — the
  * experiment reads the same effect through less noise. The third rung of
  * the repo's A/B ladder after the conversion z-test and the Welch t.
  *
  * Determinism/exactness discipline (the [[EventSeq.abValueTtest]]
  * contract): the arm is the md5 split; every per-user and per-arm sum is
  * DECIMAL-exact (x, y per user as DECIMAL(18,6); their pairwise products
  * as exact DECIMAL(37,12) before summation — associative, partitioning-
  * independent); θ, adjusted means, variances, and z then derive from
  * those sums in ONE fixed double-arithmetic shape mirrored literally by
  * the oracle.
  *
  * Scale shape: one scan with conditional pre/post sums → a |users|-row
  * relation → a 2-row arm aggregate (map-side partials) → one output row.
  * No joins against the fact table beyond the single groupBy(user).
  */
object Cuped {

  /** One-row CUPED readout: per-arm user counts, adjusted post-period
    * means, pooled θ, the achieved variance-reduction factor
    * (var(Y')/var(Y), pooled), and the z statistic on the adjusted means.
    *
    * `splitMs`: epoch-millis boundary — events strictly before it form the
    * pre-period metric X, the rest form Y.
    */
  def adjust(df: DataFrame, userCol: String, tsCol: String, valCol: String,
      splitMs: Long, salt: String = "arm"): DataFrame = {
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val pre = unix_millis(col(tsCol)) < splitMs
    val dec = col(valCol).cast("decimal(18,6)")
    val perUser = df
      .select(col(userCol).as("u"), arm, pre.as("pre"), dec.as("v"))
      .groupBy("u", "arm")
      .agg(
        coalesce(sum(when(col("pre"), col("v"))), lit(0).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("x"),
        coalesce(sum(when(!col("pre"), col("v"))), lit(0).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("y"))
    val arms = perUser.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val a = arms.where(col("arm") === 0).select(
      col("n").as("n_a"), col("sx").as("sx_a"), col("sy").as("sy_a"),
      col("sxx").as("sxx_a"), col("syy").as("syy_a"), col("sxy").as("sxy_a"))
    val b = arms.where(col("arm") === 1).select(
      col("n").as("n_b"), col("sx").as("sx_b"), col("sy").as("sy_b"),
      col("sxx").as("sxx_b"), col("syy").as("syy_b"), col("sxy").as("sxy_b"))
    def d(c: Column) = c.cast("double")
    val j = a.crossJoin(broadcast(b))
    // pooled moments (both arms together — the standard pooled-θ CUPED)
    val n = d(col("n_a")) + d(col("n_b"))
    val mx = (d(col("sx_a")) + d(col("sx_b"))) / n
    val my = (d(col("sy_a")) + d(col("sy_b"))) / n
    val vx = (d(col("sxx_a")) + d(col("sxx_b"))) / n - mx * mx
    val vy = (d(col("syy_a")) + d(col("syy_b"))) / n - my * my
    val cxy = (d(col("sxy_a")) + d(col("sxy_b"))) / n - mx * my
    val theta = when(vx > 1e-12, cxy / vx).otherwise(lit(0.0))
    // per-arm adjusted means and variances
    def armStats(n: Column, sx: Column, sy: Column, sxx: Column, syy: Column,
        sxy: Column): (Column, Column) = {
      val mxa = d(sx) / d(n); val mya = d(sy) / d(n)
      val vxa = d(sxx) / d(n) - mxa * mxa
      val vya = d(syy) / d(n) - mya * mya
      val ca = d(sxy) / d(n) - mxa * mya
      val madj = mya - theta * (mxa - mx)
      val vadj = vya - theta * ca * 2.0 + theta * theta * vxa
      (madj, vadj)
    }
    val (maA, vaA) = armStats(col("n_a"), col("sx_a"), col("sy_a"),
      col("sxx_a"), col("syy_a"), col("sxy_a"))
    val (maB, vaB) = armStats(col("n_b"), col("sx_b"), col("sy_b"),
      col("sxx_b"), col("syy_b"), col("sxy_b"))
    val z = (maA - maB) /
      sqrt(greatest(vaA / d(col("n_a")) + vaB / d(col("n_b")), lit(1e-12)))
    val varRatio = when(vy > 1e-12,
      (vy - theta * cxy * 2.0 + theta * theta * vx) / vy).otherwise(lit(1.0))
    j.select(col("n_a"), col("n_b"),
      round(maA, 6).as("mean_a_adj"), round(maB, 6).as("mean_b_adj"),
      round(theta, 6).as("theta"),
      round(varRatio, 6).as("var_ratio"),
      round(z, 4).as("z"))
  }

  /** DuckDB mirror of [[adjust]] — identical decimal folds, identical
    * double shape.
    */
  def adjustSql(tbl: String, userCol: String, tsCol: String, valCol: String,
      splitMs: Long, salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol AS u,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CAST(COALESCE(SUM(CASE WHEN epoch_ms($tsCol) < $splitMs
             THEN CAST($valCol AS DECIMAL(18,6)) END), 0) AS DECIMAL(18,6)) AS x,
           CAST(COALESCE(SUM(CASE WHEN epoch_ms($tsCol) >= $splitMs
             THEN CAST($valCol AS DECIMAL(18,6)) END), 0) AS DECIMAL(18,6)) AS y
         FROM $tbl GROUP BY 1, 2),
       arms AS (SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           -- DECIMAL(19,6) operands force DuckDB's INT128 multiply path
           -- (18×18 would run in-width int64 and overflow); the value is
           -- exact either way and both engines' sums are cast to DOUBLE
           -- before any arithmetic that could differ
           SUM(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6))) AS sxx,
           SUM(CAST(y AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS syy,
           SUM(CAST(x AS DECIMAL(19,6)) * CAST(y AS DECIMAL(19,6))) AS sxy
         FROM pu GROUP BY arm),
       a AS (SELECT n AS n_a, sx AS sx_a, sy AS sy_a, sxx AS sxx_a,
               syy AS syy_a, sxy AS sxy_a FROM arms WHERE arm = 0),
       b AS (SELECT n AS n_b, sx AS sx_b, sy AS sy_b, sxx AS sxx_b,
               syy AS syy_b, sxy AS sxy_b FROM arms WHERE arm = 1),
       p AS (SELECT *,
           CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
           (CAST(sx_a AS DOUBLE) + CAST(sx_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS mx,
           (CAST(sy_a AS DOUBLE) + CAST(sy_b AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS my
         FROM a CROSS JOIN b),
       q AS (SELECT *,
           (CAST(sxx_a AS DOUBLE) + CAST(sxx_b AS DOUBLE)) / n - mx * mx AS vx,
           (CAST(syy_a AS DOUBLE) + CAST(syy_b AS DOUBLE)) / n - my * my AS vy,
           (CAST(sxy_a AS DOUBLE) + CAST(sxy_b AS DOUBLE)) / n - mx * my AS cxy
         FROM p),
       t AS (SELECT *,
           CASE WHEN vx > 1e-12 THEN cxy / vx ELSE 0.0 END AS theta FROM q),
       s AS (SELECT *,
           CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mxa,
           CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mya,
           CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mxb,
           CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS myb
         FROM t),
       v AS (SELECT *,
           CAST(sxx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - mxa * mxa AS vxa,
           CAST(syy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - mya * mya AS vya,
           CAST(sxy_a AS DOUBLE) / CAST(n_a AS DOUBLE) - mxa * mya AS ca,
           CAST(sxx_b AS DOUBLE) / CAST(n_b AS DOUBLE) - mxb * mxb AS vxb,
           CAST(syy_b AS DOUBLE) / CAST(n_b AS DOUBLE) - myb * myb AS vyb,
           CAST(sxy_b AS DOUBLE) / CAST(n_b AS DOUBLE) - mxb * myb AS cb
         FROM s),
       f AS (SELECT *,
           mya - theta * (mxa - mx) AS ma_adj,
           myb - theta * (mxb - mx) AS mb_adj,
           vya - theta * ca * 2.0 + theta * theta * vxa AS va_adj,
           vyb - theta * cb * 2.0 + theta * theta * vxb AS vb_adj
         FROM v)
       SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         round(ma_adj, 6) AS mean_a_adj, round(mb_adj, 6) AS mean_b_adj,
         round(theta, 6) AS theta,
         round(CASE WHEN vy > 1e-12
           THEN (vy - theta * cxy * 2.0 + theta * theta * vx) / vy
           ELSE 1.0 END, 6) AS var_ratio,
         round((ma_adj - mb_adj) / sqrt(greatest(
           va_adj / CAST(n_a AS DOUBLE) + vb_adj / CAST(n_b AS DOUBLE),
           1e-12)), 4) AS z
       FROM f"""

  /** Two-period difference-in-differences (Card & Krueger, AER 1994
    * canonical design): per-user Δ = post-period sum − pre-period sum, and
    * the effect estimate is mean(Δ_treatment) − mean(Δ_control) — the
    * parallel-trends estimator that differences out both user-level
    * baselines and the common temporal shock a raw post-period comparison
    * confounds. The rung between the raw Welch t ([[EventSeq.abValueTtest]])
    * and [[adjust]]'s variance-reduction regression: DiD needs NO
    * pre-period independence assumption — the pre-period difference
    * subtracts out by construction.
    *
    * Same exactness discipline as [[adjust]]: md5 arms, DECIMAL per-user
    * sums, DECIMAL Δ and Δ² folds (order-free), Welch SE on Δ in one fixed
    * double shape. One scan → per-user agg → 2-row rollup → one row.
    */
  def diffInDiff(df: DataFrame, userCol: String, tsCol: String, valCol: String,
      splitMs: Long, salt: String = "arm"): DataFrame = {
    val arm = (conv(substring(md5(concat(lit(salt + ":"),
      col(userCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("arm")
    val pre = unix_millis(col(tsCol)) < splitMs
    val dec = col(valCol).cast("decimal(18,6)")
    val perUser = df
      .select(col(userCol).as("u"), arm, pre.as("pre"), dec.as("v"))
      .groupBy("u", "arm")
      .agg(
        coalesce(sum(when(col("pre"), col("v"))), lit(0).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("x"),
        coalesce(sum(when(!col("pre"), col("v"))), lit(0).cast("decimal(18,6)"))
          .cast("decimal(18,6)").as("y"))
      .withColumn("delta", (col("y") - col("x")).cast("decimal(18,6)"))
    val arms = perUser.groupBy("arm").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("delta")).as("sd"),
      sum(col("delta") * col("delta")).as("sdd"))
    val a = arms.where(col("arm") === 0).select(col("n").as("n_a"),
      col("sx").as("sx_a"), col("sy").as("sy_a"),
      col("sd").as("sd_a"), col("sdd").as("sdd_a"))
    val b = arms.where(col("arm") === 1).select(col("n").as("n_b"),
      col("sx").as("sx_b"), col("sy").as("sy_b"),
      col("sd").as("sd_b"), col("sdd").as("sdd_b"))
    def d(c: Column) = c.cast("double")
    val na = d(col("n_a")); val nb = d(col("n_b"))
    val dMeanA = d(col("sd_a")) / na
    val dMeanB = d(col("sd_b")) / nb
    val did = dMeanB - dMeanA
    val varA = (d(col("sdd_a")) - d(col("sd_a")) * d(col("sd_a")) / na) / (na - 1.0)
    val varB = (d(col("sdd_b")) - d(col("sd_b")) * d(col("sd_b")) / nb) / (nb - 1.0)
    val se = sqrt(greatest(varA / na + varB / nb, lit(1e-12)))
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("n_b"),
        round(d(col("sx_a")) / na, 6).as("pre_a"),
        round(d(col("sy_a")) / na, 6).as("post_a"),
        round(d(col("sx_b")) / nb, 6).as("pre_b"),
        round(d(col("sy_b")) / nb, 6).as("post_b"),
        round(did, 6).as("did"),
        round(se, 6).as("se"),
        round(did / se, 4).as("t"))
  }

  /** DuckDB mirror of [[diffInDiff]]. */
  def diffInDiffSql(tbl: String, userCol: String, tsCol: String,
      valCol: String, splitMs: Long, salt: String = "arm"): String =
    s"""WITH pu AS (SELECT $userCol AS u,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($userCol AS VARCHAR)),1,2) AS INT) % 2 AS arm,
           CAST(COALESCE(SUM(CASE WHEN epoch_ms($tsCol) < $splitMs
             THEN CAST($valCol AS DECIMAL(18,6)) END), 0) AS DECIMAL(18,6)) AS x,
           CAST(COALESCE(SUM(CASE WHEN epoch_ms($tsCol) >= $splitMs
             THEN CAST($valCol AS DECIMAL(18,6)) END), 0) AS DECIMAL(18,6)) AS y
         FROM $tbl GROUP BY 1, 2),
       pd AS (SELECT *, CAST(y - x AS DECIMAL(18,6)) AS delta FROM pu),
       arms AS (SELECT arm, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(delta) AS sd,
           -- DECIMAL(19,6) operands force the INT128 multiply path (the
           -- adjustSql convention); exact either way
           SUM(CAST(delta AS DECIMAL(19,6)) * CAST(delta AS DECIMAL(19,6))) AS sdd
         FROM pd GROUP BY arm),
       a AS (SELECT n AS n_a, sx AS sx_a, sy AS sy_a, sd AS sd_a, sdd AS sdd_a
         FROM arms WHERE arm = 0),
       b AS (SELECT n AS n_b, sx AS sx_b, sy AS sy_b, sd AS sd_b, sdd AS sdd_b
         FROM arms WHERE arm = 1),
       s AS (SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pre_a,
           CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS post_a,
           CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pre_b,
           CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS post_b,
           CAST(sd_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             - CAST(sd_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS did,
           (CAST(sdd_a AS DOUBLE) - CAST(sd_a AS DOUBLE) * CAST(sd_a AS DOUBLE)
              / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0) AS var_a,
           (CAST(sdd_b AS DOUBLE) - CAST(sd_b AS DOUBLE) * CAST(sd_b AS DOUBLE)
              / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0) AS var_b
         FROM a CROSS JOIN b)
       SELECT n_a, n_b, round(pre_a, 6) AS pre_a, round(post_a, 6) AS post_a,
         round(pre_b, 6) AS pre_b, round(post_b, 6) AS post_b,
         round(did, 6) AS did,
         round(sqrt(greatest(var_a / CAST(n_a AS DOUBLE)
           + var_b / CAST(n_b AS DOUBLE), 1e-12)), 6) AS se,
         round(did / sqrt(greatest(var_a / CAST(n_a AS DOUBLE)
           + var_b / CAST(n_b AS DOUBLE), 1e-12)), 4) AS t
       FROM s"""
}
