package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring via the Population Stability Index — the
  * "did this source's data change shape between snapshots" gate a corpus
  * refresh pipeline runs before retraining: PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)
  * over a bucketed feature, per source. (<0.1 stable, 0.1–0.25 drifting,
  * >0.25 shifted — the standard scorecard bands.)
  *
  * The two populations compared here are the deterministic md5-halves of
  * the corpus ([[Sampling.splitByte]] parity of the id) — in production the
  * two sides are consecutive snapshots; the halving makes the operator
  * self-contained and its expected PSI ≈ 0 (sampling noise only), so any
  * non-trivial score in the fixture output is real structure.
  *
  * Shape: ONE corpus scan → (source, side, bucket) counts (map-side
  * combinable), per-(source, side) totals folded FROM that relation (no
  * second scan), one bucket-keyed join of two tiny relations, bounded agg.
  * Zero-count buckets on one side clamp to `eps` (the standard PSI floor)
  * — deterministic in both engines. Cross-engine exactness: proportions
  * are double divisions of exact integers, each bucket term rounds to 6
  * then sums as DECIMAL (partition-order-proof), final round 6.
  */
object Drift {

  /** Per-source PSI between the corpus's even/odd md5-halves over a
    * power-of-two length bucketing of `textCol` tokens.
    */
  def psiDrift(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, minCap: Int = 16, maxCap: Int = 512,
      eps: Double = 1e-6): DataFrame = {
    val n = TextAnalysis.tokenCount(col(textCol))
    val caps = Iterator.iterate(minCap)(_ * 2).takeWhile(_ < maxCap).toSeq
    val bucket = caps.foldRight(lit(maxCap.toLong)) { (c, rest) =>
      when(n <= c, lit(c.toLong)).otherwise(rest)
    }
    val side = (Sampling.splitByte(col(idCol), "psi") % 2).cast("int")
    val counts = Dedup.parallelize(df)
      .select(col(sourceCol).as("source"), side.as("side"), bucket.as("bucket"))
      .groupBy("source", "side", "bucket").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("source", "side").agg(sum("c").as("tot"))
    val sided = counts.join(totals, Seq("source", "side"))
      .select(col("source"), col("bucket"), col("side"),
        (col("c").cast("double") / col("tot").cast("double")).as("p"))
    val a = sided.where(col("side") === 0).select(col("source"), col("bucket"), col("p").as("pa"))
    val b = sided.where(col("side") === 1).select(col("source"), col("bucket"), col("p").as("pb"))
    a.join(b, Seq("source", "bucket"), "full_outer")
      .select(col("source"),
        greatest(coalesce(col("pa"), lit(0.0)), lit(eps)).as("pa"),
        greatest(coalesce(col("pb"), lit(0.0)), lit(eps)).as("pb"))
      .select(col("source"),
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6)
          .cast("decimal(18,6)").as("term"))
      .groupBy("source")
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
      .orderBy("source")
  }

  /** DuckDB mirror of [[psiDrift]]. */
  def psiDriftSql(table: String, idCol: String, sourceCol: String,
      textCol: String, minCap: Int = 16, maxCap: Int = 512,
      eps: Double = 1e-6): String = {
    val caps = Iterator.iterate(minCap)(_ * 2).takeWhile(_ < maxCap).toSeq
    val chain = caps.map(c => s"WHEN n <= $c THEN $c").mkString(" ")
    s"""WITH base AS (SELECT $sourceCol AS source,
           CAST('0x'||substr(md5('psi:'||CAST($idCol AS VARCHAR)),1,2) AS INT) % 2 AS side,
           CAST(CASE $chain ELSE $maxCap END AS BIGINT) AS bucket
         FROM (SELECT $idCol, $sourceCol,
                 len(string_split_regex(trim($textCol),'\\s+')) AS n FROM $table)),
       counts AS (SELECT source, side, bucket, COUNT(*) AS c
                  FROM base GROUP BY 1, 2, 3),
       tot AS (SELECT source, side, SUM(c) AS tot FROM counts GROUP BY 1, 2),
       sided AS (SELECT source, bucket, side,
                   CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS p
                 FROM counts JOIN tot USING (source, side)),
       ab AS (SELECT source, bucket,
                greatest(COALESCE(MAX(p) FILTER (side = 0), 0.0), $eps) AS pa,
                greatest(COALESCE(MAX(p) FILTER (side = 1), 0.0), $eps) AS pb
              FROM sided GROUP BY 1, 2)
       SELECT source,
         round(CAST(SUM(CAST(round((pa - pb) * ln(pa / pb), 6) AS DECIMAL(18,6)))
           AS DOUBLE), 6) AS psi
       FROM ab GROUP BY source ORDER BY source"""
  }

  /** 1-D Wasserstein-1 (earth-mover) distance between two md5-halves'
    * distributions of a value column, bucketized — the METRIC companion
    * of [[psiDrift]] (PSI is a binned divergence: it says *that* the
    * distributions differ, in unstable units near empty bins; W₁ says *by
    * how much, in the value's own units*, via the closed 1-D form
    * W₁ = Σ_b |CDF_a(b) − CDF_b(b)| · width). Same deterministic split
    * mechanism, so the two drift numbers are directly comparable.
    *
    * Exactness: bucket counts are integers; the CDF difference is one
    * fixed double shape per bucket, rounded to 9 and summed as DECIMAL —
    * partition-order-immune. One scan → B-bucket histogram; everything
    * after is bounded.
    */
  def wassersteinDrift(df: DataFrame, idCol: String, valCol: String,
      buckets: Int = 64, salt: String = "wd"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, "wassersteinDrift: buckets >= 2")
    val half = (conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("half")
    val base = df.select(half, col(valCol).cast("double").as("v"))
    val mm = base.agg(min(col("v")).as("lo"), max(col("v")).as("hi")).head()
    val (lo, hi) = (mm.getAs[Double]("lo"), mm.getAs[Double]("hi"))
    val width = (hi - lo) / buckets
    val b =
      if (hi == lo) lit(0L)
      else least(lit(buckets - 1L),
        floor(((col("v") - lit(lo)) / lit(hi - lo)) * buckets))
    val hist = base.select(col("half"), b.as("b"))
      .groupBy("b")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
    val w = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val terms = hist
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
      .withColumn("ta", sum(col("na")).over(tot))
      .withColumn("tb", sum(col("nb")).over(tot))
      .select(col("ta"), col("tb"),
        round(abs(d(col("ca")) / d(col("ta")) - d(col("cb")) / d(col("tb"))) *
          lit(width), 9).cast("decimal(18,9)").as("term"))
    terms.agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"))
      .crossJoin(broadcast(
        terms.agg(round(sum(col("term")).cast("double"), 6).as("w1"))))
      .select(col("n_a"), col("n_b"), lit(buckets).as("buckets"),
        round(lit(width), 6).as("bucket_width"), col("w1"))
  }

  /** DuckDB mirror of [[wassersteinDrift]]. The Spark side collects
    * lo/hi with one `.head()` and folds them as literals; here they come
    * from the same MIN/MAX in SQL — selections of existing doubles, so
    * the two engines hold bit-identical values, and every derived double
    * (hi−lo, width) is one identical subtraction/division away.
    */
  def wassersteinDriftSql(tbl: String, idCol: String, valCol: String,
      buckets: Int = 64, salt: String = "wd"): String = {
    s"""WITH mm AS (SELECT MIN(CAST($valCol AS DOUBLE)) AS lo,
           MAX(CAST($valCol AS DOUBLE)) AS hi FROM $tbl),
       base AS (SELECT
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($idCol AS VARCHAR)),1,2) AS INT) % 2 AS half,
           CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
             ELSE least(CAST(${buckets - 1} AS BIGINT),
               CAST(floor(((CAST($valCol AS DOUBLE) - lo) / (hi - lo)) * $buckets) AS BIGINT))
           END AS b
         FROM $tbl CROSS JOIN mm),
       hist AS (SELECT b,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         FROM base GROUP BY b),
       c AS (SELECT
           CAST(SUM(na) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
           CAST(SUM(nb) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
           CAST(SUM(na) OVER () AS BIGINT) AS ta,
           CAST(SUM(nb) OVER () AS BIGINT) AS tb
         FROM hist),
       t AS (SELECT ta, tb,
           CAST(round(abs(CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
             - CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
             * ((SELECT (hi - lo) / $buckets FROM mm)), 9)
             AS DECIMAL(18,9)) AS term
         FROM c)
       SELECT MAX(ta) AS n_a, MAX(tb) AS n_b,
         CAST($buckets AS INT) AS buckets,
         round((SELECT (hi - lo) / $buckets FROM mm), 6) AS bucket_width,
         round(CAST(SUM(term) AS DOUBLE), 6) AS w1
       FROM t"""
  }

  /** Per-label EMBEDDING drift between two deterministic md5-halves of the
    * corpus (the [[psiDrift]] split mechanism applied to vectors — in
    * production the halves are two model/snapshot versions): cosine
    * between the halves' per-label centroids and the relative centroid-
    * norm shift. Cosine near 1 with stable norms ⇒ the embedding space
    * didn't move for that label; a low cosine flags representation rot
    * BEFORE downstream retrieval quality decays.
    *
    * Shape: one posexplode → (label, half, dim) DECIMAL-exact mean fold
    * (the [[Similarity.labelCentroidMargin]] centroid discipline) → the
    * centroid relation is labels×2 rows; everything after is bounded.
    */
  def embedDrift(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, salt: String = "ed"): DataFrame = {
    import org.apache.spark.sql.functions._
    val half = (conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("half")
    val cents = emb
      .select(col(labelCol).as("label"), half,
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("label", "half", "dim")
      .agg((sum(col("v").cast("double").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).as("_ed_sm"), count(lit(1)).as("_ed_n"))
      .groupBy("label", "half")
      .agg(array_sort(collect_list(struct(col("dim"), col("_ed_sm")))).as("_s"),
        max(col("_ed_n")).as("n"))
      .select(col("label"), col("half"),
        transform(col("_s"), _.getField("_ed_sm")).as("cv"), col("n"))
    val a = cents.where(col("half") === 0)
      .select(col("label"), col("cv").as("cv_a"), col("n").as("n_a"))
    val b = cents.where(col("half") === 1)
      .select(col("label"), col("cv").as("cv_b"), col("n").as("n_b"))
    def norm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x * x))
    a.join(b, "label")
      .select(col("label"), col("n_a"), col("n_b"),
        round(Similarity.cosine(col("cv_a"), col("cv_b")), 6).as("centroid_cos"),
        round(norm(col("cv_b")) / norm(col("cv_a")), 6).as("norm_ratio"))
      .orderBy("label")
  }

  /** DuckDB mirror of [[embedDrift]]. */
  def embedDriftSql(tbl: String, idCol: String, vecCol: String,
      labelCol: String, dim: Int, salt: String = "ed"): String = {
    val cos =
      s"""(list_sum(list_transform(list_zip(cv_a, cv_b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(cv_a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(cv_b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))"""
    def nrm(c: String) =
      s"sqrt(list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH h AS (SELECT $labelCol AS label, $vecCol AS vec,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($idCol AS VARCHAR)),1,2) AS INT) % 2 AS half
         FROM $tbl),
       cdim AS (SELECT label, half, d.d AS dim,
           CAST(SUM(CAST(CAST(vec[d.d] AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) AS m,
           COUNT(*) AS nd
         FROM h CROSS JOIN range(1, ${dim + 1}) d(d) GROUP BY 1, 2, 3),
       cents AS (SELECT label, half, list(m ORDER BY dim) AS cv, MAX(nd) AS n
         FROM cdim GROUP BY label, half),
       a AS (SELECT label, cv AS cv_a, n AS n_a FROM cents WHERE half = 0),
       b AS (SELECT label, cv AS cv_b, n AS n_b FROM cents WHERE half = 1)
       SELECT label, n_a, n_b,
         round($cos, 6) AS centroid_cos,
         round(${nrm("cv_b")} / ${nrm("cv_a")}, 6) AS norm_ratio
       FROM a JOIN b USING (label) ORDER BY label"""
  }

  /** Two-sample Kolmogorov–Smirnov drift between the md5-halves of a
    * numeric column — the EXACT supremum-of-ECDF-gap companion to
    * [[psiDrift]] (bucketized) and [[wassersteinDrift]] (in-value-units):
    * D = max_v |F_a(v) − F_b(v)| evaluated at every distinct value.
    *
    * Engine-exact: cumulative counts are integers, the per-value gap is
    * carried CROSS-MULTIPLIED (|ca·nb − cb·na| as BIGINT — one shared
    * denominator na·nb), the max is an integer max, and the only float
    * ops are two final divisions. The α=0.05 rejection bound
    * c(α)·√((na+nb)/(na·nb)) with c = 1.358 uses the same exact integers.
    * Shape: distinct-value relation (bounded for any real measurement
    * column) + one ordered window over it; the fact table aggregates once.
    */
  def ksDrift(df: DataFrame, idCol: String, valCol: String,
      salt: String = "ks"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val half = (conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("half")
    val counts = df.select(half, col(valCol).cast("double").as("v"))
      .groupBy("v")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    counts
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
      .withColumn("ta", sum(col("na")).over(tot))
      .withColumn("tb", sum(col("nb")).over(tot))
      .withColumn("num", abs(col("ca") * col("tb") - col("cb") * col("ta")))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        max(col("num")).as("maxnum"))
      .select(col("n_a"), col("n_b"),
        round(col("maxnum").cast("double") / (col("n_a") * col("n_b")).cast("double"), 6)
          .as("d_stat"),
        round(lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double")
          / (col("n_a") * col("n_b")).cast("double")), 6).as("crit_05"))
      .withColumn("drifted", col("d_stat") > col("crit_05"))
  }

  /** DuckDB mirror of [[ksDrift]]. */
  def ksDriftSql(tbl: String, idCol: String, valCol: String,
      salt: String = "ks"): String =
    s"""WITH base AS (SELECT
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($idCol AS VARCHAR)),1,2) AS INT) % 2 AS half,
           CAST($valCol AS DOUBLE) AS v
         FROM $tbl),
       counts AS (SELECT v,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         FROM base GROUP BY v),
       c AS (SELECT
           CAST(SUM(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
           CAST(SUM(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
           CAST(SUM(na) OVER () AS BIGINT) AS ta,
           CAST(SUM(nb) OVER () AS BIGINT) AS tb
         FROM counts),
       agg AS (SELECT MAX(ta) AS n_a, MAX(tb) AS n_b,
           MAX(abs(ca * tb - cb * ta)) AS maxnum FROM c)
       SELECT n_a, n_b,
         round(CAST(maxnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6) AS d_stat,
         round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)), 6) AS crit_05,
         round(CAST(maxnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6)
           > round(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)), 6) AS drifted
       FROM agg"""

  /** Per-GROUP two-sample KS battery with Benjamini–Hochberg FDR control
    * (Benjamini & Hochberg, JRSS-B 1995): one [[ksDrift]] per group (same
    * md5 halves, same integer cross-multiplied supremum), an asymptotic
    * p-value per group (Stephens' effective-n λ and the 3-term
    * Kolmogorov series — one fixed double shape), then the BH step-up:
    * reject every group ranked ≤ the LARGEST i with p₍ᵢ₎ ≤ i·q/m. Running
    * m marginal tests at α each inflates family-wise false alarms; this is
    * the correction a per-source/per-type drift dashboard must apply
    * before paging anyone.
    *
    * Scale shape: the KS folds are the [[ksDrift]] windows partitioned by
    * group (per-group sorts over the distinct-value relation); everything
    * after is windows over the m-row group relation (type-table-bounded).
    * p rounds to 6 BEFORE ranking (ties break on group name), so the BH
    * ordering is engine-deterministic.
    */
  def ksDriftFdr(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, q: Double = 0.1, salt: String = "ks"): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val half = (conv(substring(md5(concat(lit(salt + ":"),
      col(idCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2).as("half")
    val counts = df.select(col(groupCol).as("g"), half,
        col(valCol).cast("double").as("v"))
      .groupBy("g", "v")
      .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("nb"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("g")
    val per = counts
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
      .withColumn("ta", sum(col("na")).over(tot))
      .withColumn("tb", sum(col("nb")).over(tot))
      .withColumn("num", abs(col("ca") * col("tb") - col("cb") * col("ta")))
      .groupBy("g")
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        max(col("num")).as("maxnum"))
    val d = col("maxnum").cast("double") / (col("n_a") * col("n_b")).cast("double")
    val ne = (col("n_a") * col("n_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val lam = (sqrt(ne) + lit(0.12) + lit(0.11) / sqrt(ne)) * d
    // 3-term Kolmogorov tail: 2Σ(-1)^{k-1} exp(-2k²λ²), clamped to [0,1]
    val pRaw = lit(2.0) * (exp(lit(-2.0) * lam * lam)
      - exp(lit(-8.0) * lam * lam) + exp(lit(-18.0) * lam * lam))
    val scored = per.select(col("g"), round(d, 6).as("d_stat"),
      round(least(greatest(pRaw, lit(0.0)), lit(1.0)), 6).as("p_value"))
    val m = Window.partitionBy()
    val byP = Window.orderBy(col("p_value"), col("g"))
    val ranked = scored
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("rank", row_number().over(byP))
      .withColumn("bh_thresh",
        round(col("rank").cast("double") * lit(q) / col("m").cast("double"), 6))
    val maxPass = max(when(col("p_value") <= col("bh_thresh"), col("rank"))
      .otherwise(lit(0L))).over(m)
    ranked
      .withColumn("rejected", col("rank") <= maxPass)
      .select(col("g").as(groupCol), col("d_stat"), col("p_value"),
        col("rank"), col("bh_thresh"), col("rejected"))
  }

  /** DuckDB mirror of [[ksDriftFdr]]. */
  def ksDriftFdrSql(tbl: String, groupCol: String, idCol: String,
      valCol: String, q: Double = 0.1, salt: String = "ks"): String =
    s"""WITH base AS (SELECT $groupCol AS g,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($idCol AS VARCHAR)),1,2) AS INT) % 2 AS half,
           CAST($valCol AS DOUBLE) AS v
         FROM $tbl),
       counts AS (SELECT g, v,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         FROM base GROUP BY g, v),
       c AS (SELECT g,
           CAST(SUM(na) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
           CAST(SUM(nb) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
           CAST(SUM(na) OVER (PARTITION BY g) AS BIGINT) AS ta,
           CAST(SUM(nb) OVER (PARTITION BY g) AS BIGINT) AS tb
         FROM counts),
       agg AS (SELECT g, MAX(ta) AS n_a, MAX(tb) AS n_b,
           MAX(abs(ca * tb - cb * ta)) AS maxnum FROM c GROUP BY g),
       sc AS (SELECT g,
           round(CAST(maxnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6) AS d_stat,
           round(least(greatest(
             2.0 * (exp(-2.0 * lam * lam) - exp(-8.0 * lam * lam) + exp(-18.0 * lam * lam)),
             0.0), 1.0), 6) AS p_value
         FROM (SELECT *,
             (sqrt(ne) + 0.12 + 0.11 / sqrt(ne))
               * (CAST(maxnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)) AS lam
           FROM (SELECT *,
               CAST(n_a * n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS ne
             FROM agg))),
       rk AS (SELECT *, COUNT(*) OVER () AS m,
           row_number() OVER (ORDER BY p_value, g) AS rank
         FROM sc),
       th AS (SELECT *,
           round(CAST(rank AS DOUBLE) * $q / CAST(m AS DOUBLE), 6) AS bh_thresh
         FROM rk)
       SELECT g AS $groupCol, d_stat, p_value, CAST(rank AS BIGINT) AS rank,
         bh_thresh,
         rank <= MAX(CASE WHEN p_value <= bh_thresh THEN rank ELSE 0 END) OVER () AS rejected
       FROM th"""
}
