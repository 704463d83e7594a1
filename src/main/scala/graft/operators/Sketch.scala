package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count sketching — the bounded-memory answer to "how many
  * distinct tokens/urls/ngrams per partition of a 100 TB corpus".
  *
  * KMV (k minimum values; Bar-Yossef et al. 2002, Beyer et al. 2007): hash
  * every distinct value uniformly into (0,1), keep only the k smallest
  * hashes per group; if the k-th smallest is v_k, the distinct count is
  * ≈ (k−1)/v_k. Unlike HyperLogLog the estimator is trivially engine-exact
  * (a deterministic function of the md5 order statistics — the reason this
  * sketch oracles bit-for-bit where approx_count_distinct never could),
  * still mergeable (union of sketches = sketch of union: keep the k
  * smallest of the union), and O(k) memory per group.
  */
object Sketch {

  /** 2^60 — the hash domain: 15 md5 hex chars parsed as an integer. */
  private val Domain = math.pow(2, 60)

  /** Per-group distinct-token estimate. The distinct (group, token)
    * relation is vocabulary-sized (orders of magnitude under the corpus),
    * so the per-group order-statistic window runs over sketch-sized input;
    * groups with fewer than k distinct values degrade to the EXACT count
    * (v_k undefined — the sketch holds the whole set).
    */
  def kmvDistinctTokens(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashed = Dedup.parallelize(df)
      .select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .distinct()
      .select(col("grp"), substring(md5(col("term")), 1, 15).as("h"))
    val w = Window.partitionBy("grp").orderBy("h")
    hashed
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .groupBy("grp")
      .agg(count(lit(1)).as("k_actual"),
        conv(max(col("h")), 16, 10).cast("long").as("hkl"))
      .select(col("grp").as(groupCol),
        when(col("k_actual") < k, col("k_actual").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("hkl").cast("double") / lit(Domain)))
          .as("est_distinct"))
  }

  /** The SQL-side hash-fraction mirror: interpolates the SAME Scala-computed
    * double constants the Column side uses, so both engines evaluate
    * identical literals (never fold constants independently in two
    * engines). */
  def kmvEstimateSql(k: Int): String =
    s"""CASE WHEN k_actual < $k THEN CAST(k_actual AS DOUBLE)
        ELSE ${(k - 1).toDouble} / (CAST(hkl AS DOUBLE) / ${Domain}) END"""

  /** Pairwise token-set Jaccard between groups, estimated from the SKETCHES
    * only (theta-sketch set algebra): for each group pair, the union sketch
    * is the k smallest hashes of the combined sketches; inside that sketch
    * the share of hashes present in BOTH groups estimates the Jaccard.
    * When the union holds fewer than k distinct hashes the "estimate" is
    * the exact Jaccard (θ covers both sets whole).
    *
    * This is the O(s²·k) cross-SOURCE overlap audit — the sketched
    * complement to [[Audit.sourceOverlap]]'s exact shared-gram matrix: at
    * 100 TB the sketches are the only thing two clusters ever need to
    * exchange to estimate corpus overlap.
    */
  def kmvOverlapTokens(df: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashed = Dedup.parallelize(df)
      .select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .distinct()
      .select(col("grp"), substring(md5(col("term")), 1, 15).as("h"))
      .distinct() // prefix collisions: the sketch lives in h-space
    val w = Window.partitionBy("grp").orderBy("h")
    val sk = hashed.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("grp", "h")
    val groups = sk.select("grp").distinct()
    val pairs = groups.select(col("grp").as("ga"))
      .crossJoin(groups.select(col("grp").as("gb")))
      .where(col("ga") < col("gb"))
    // per (pair, h): in how many of the two sketches does h appear?
    val u = pairs.join(sk, col("grp") === col("ga") || col("grp") === col("gb"))
      .groupBy("ga", "gb", "h").agg(count(lit(1)).as("nsrc"))
    val wu = Window.partitionBy("ga", "gb").orderBy("h")
    u.withColumn("rn", row_number().over(wu))
      .where(col("rn") <= k)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("union_k"),
        sum(when(col("nsrc") === 2, 1L).otherwise(0L)).as("common"))
      .select(col("ga").as(s"${groupCol}_a"), col("gb").as(s"${groupCol}_b"),
        col("common"),
        (col("common").cast("double") / col("union_k").cast("double"))
          .as("est_jaccard"))
  }

  /** DuckDB mirror of [[kmvOverlapTokens]] over `table.textCol` grouped by
    * `groupCol`. */
  def kmvOverlapSql(table: String, groupCol: String, textCol: String,
      k: Int): String =
    s"""WITH t AS (SELECT DISTINCT grp, term FROM (
           SELECT $groupCol AS grp, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
           FROM $table)),
       hh AS (SELECT DISTINCT grp, substr(md5(term), 1, 15) AS h FROM t),
       sk AS (SELECT grp, h FROM (
           SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM hh)
         WHERE rn <= $k),
       g AS (SELECT DISTINCT grp FROM sk),
       pr AS (SELECT a.grp AS ga, b.grp AS gb FROM g a CROSS JOIN g b WHERE a.grp < b.grp),
       u AS (SELECT ga, gb, h, COUNT(*) AS nsrc FROM pr
           JOIN sk ON sk.grp = pr.ga OR sk.grp = pr.gb GROUP BY ga, gb, h),
       r AS (SELECT ga, gb, nsrc, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn FROM u)
       SELECT ga AS ${groupCol}_a, gb AS ${groupCol}_b,
         CAST(SUM(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS common,
         CAST(SUM(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS est_jaccard
       FROM r WHERE rn <= $k GROUP BY ga, gb ORDER BY ga, gb"""

  /** Count-min-sketch φ-heavy-hitters (Cormode & Muthukrishnan 2005) over
    * token n-grams: a d×w counter matrix, `counter[r][h_r(g)] += cnt(g)`,
    * estimate `ĉ(g) = min_r counter[r][h_r(g)]` — an OVERESTIMATE by
    * construction (ĉ ≥ c always; one-sided error ≤ 2·total/w with prob
    * 1−2^−d), so thresholding on ĉ at `φ·total` has NO false negatives:
    * every true heavy hitter survives. The spec pins both laws. The
    * threshold is RELATIVE (`total/phiInv`), so the same query is
    * meaningful at any corpus scale.
    *
    * Plan shape at 100 TB: the corpus collapses to the n-gram vocabulary
    * relation first (map-side combined counts); the d×w counter matrix is
    * ≤ d·w rows — constant-size, mergeable by plain ADDITION (counters are
    * sums, so 1000 executors sketch independently and a final d·w-row
    * shuffle combines them — the property HLL shares but exactness does
    * not); the estimate join broadcasts the counter matrix back onto the
    * candidate grams. Output: grams with ĉ ≥ total/phiInv, exact count
    * alongside.
    *
    * Cross-engine exact: row hashes are the first 8 md5 hex chars of
    * `"r:gram"` mod w — integer arithmetic end to end; the threshold
    * compare is one IEEE division against an exact integer sum.
    */
  /** Exploded n-gram occurrence stream (lowercased whitespace tokens);
    * pair with [[gramFilter]] to drop the whole-string gram short docs
    * emit. Shared by the batch CMS and the streaming sketch. */
  private[graft] def gramStream(text: org.apache.spark.sql.Column, n: Int) =
    explode(graft.functions.MinHashExpr.shinglesArray(lower(text), n))

  /** Filter matching [[gramStream]]'s short-doc escape (exact for n ≤ 2:
    * a doc shorter than n tokens emits its whole token string — no space
    * for n = 2). */
  private[graft] def gramFilter(n: Int): org.apache.spark.sql.Column =
    if (n > 1) instr(col("gram"), " ") > 0 else lit(true)

  /** The d probed (row, bucket) cells of one gram as an exploded struct
    * column — row hashes are the first 8 md5 hex chars of `"r:gram"`
    * mod width. */
  private[graft] def cmsProbes(gram: org.apache.spark.sql.Column,
      depth: Int, width: Int) = {
    def bucket(r: Int) =
      conv(substring(md5(concat(lit(s"$r:"), gram)), 1, 8), 16, 10)
        .cast("long") % width
    explode(array((0 until depth).map(r =>
      struct(lit(r).as("r"), bucket(r).as("b"))): _*))
  }

  def cmsHeavyHitters(df: DataFrame, textCol: String, n: Int, phiInv: Int,
      depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 2, "cmsHeavyHitters: bad sketch shape")
    require(n == 1 || n == 2, "cmsHeavyHitters: short-doc filter is exact only for n <= 2")
    val vocab = Dedup.parallelize(df)
      .select(gramStream(col(textCol), n).as("gram"))
      .where(gramFilter(n))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
    val probes = vocab
      .select(col("gram"), col("cnt"), cmsProbes(col("gram"), depth, width).as("rb"))
      .select(col("gram"), col("cnt"), col("rb.r").as("r"), col("rb.b").as("b"))
    // (row, bucket) → counter: the d×w matrix as ≤ d·w rows
    val counters = probes
      .groupBy("r", "b").agg(sum(col("cnt")).as("counter"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    probes
      .join(broadcast(counters), Seq("r", "b"))
      .groupBy("gram")
      .agg(max(col("cnt")).as("cnt"), min(col("counter")).as("est"))
      .crossJoin(broadcast(total))
      .where(col("est").cast("double") >=
        col("total").cast("double") / lit(phiInv.toDouble))
      .select(col("gram"), col("cnt"), col("est"))
  }

  /** DuckDB mirror of [[cmsHeavyHitters]] — same hash spelling, same
    * interpolated constants (n=2 grams spelled as the bigram list
    * transform the LM oracles use). */
  def cmsHeavyHittersSql(table: String, textCol: String, phiInv: Int,
      depth: Int = 4, width: Int = 256): String = {
    val rows = (0 until depth).map(r =>
      s"SELECT gram, cnt, $r AS r, ('0x'||substr(md5('$r:'||gram),1,8))::BIGINT % $width AS b FROM v")
      .mkString("\n           UNION ALL\n           ")
    s"""WITH w AS (SELECT string_split_regex(trim(lower($textCol)),'\\s+') AS ws FROM $table),
       v AS (SELECT gram, COUNT(*) AS cnt FROM (
           SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1])) AS gram FROM w)
         GROUP BY gram),
       p AS ($rows),
       c AS (SELECT r, b, SUM(cnt) AS counter FROM p GROUP BY r, b),
       t AS (SELECT SUM(cnt) AS total FROM v)
       SELECT gram, CAST(MAX(cnt) AS BIGINT) AS cnt, CAST(MIN(counter) AS BIGINT) AS est
       FROM p JOIN c USING (r, b) CROSS JOIN t
       GROUP BY gram, total
       HAVING CAST(MIN(counter) AS DOUBLE) >= CAST(total AS DOUBLE) / ${phiInv.toDouble}
       ORDER BY gram"""
  }

  /** Mergeable log-histogram quantiles (the HDR-histogram discipline): each
    * positive value lands in a two-significant-decimal-digit bucket, so the
    * per-group state is a FIXED histogram (≤ 90 buckets per decade,
    * typically a few hundred rows total) no matter how many values flow
    * through — counts merge by ADDITION across executors, shards, or
    * streaming micro-batches, exactly like the CMS counter matrix. The
    * quantile estimate is the lower bound of the first bucket whose
    * cumulative count reaches ⌈q·n⌉, giving a guaranteed ≤10% relative
    * error (the bucket's own width). This is the bounded-state answer to
    * the exact `percentiles` sort-based aggregation: at 100 TB the exact
    * form shuffles every value; this form shuffles one row per occupied
    * bucket.
    *
    * Cross-engine exactness: bucketing is integer/string arithmetic end to
    * end — s = ⌊v·1000⌋ (the same IEEE product in both engines), bucket
    * lower bound = first two decimal digits of s zero-extended to its
    * length. No log(), no float boundaries.
    */
  def logHistQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"logHistQuantiles: quantiles must be in (0, 1], got $qs")
    val hist = df
      .where(col(valueCol) > 0)
      .select(col(groupCol).as("g"),
        floor(col(valueCol).cast("double") * lit(1000.0)).cast("long").as("_lh_s"))
      .select(col("g"),
        expr("CAST(CASE WHEN length(CAST(_lh_s AS STRING)) <= 2 THEN CAST(_lh_s AS STRING) " +
          "ELSE rpad(substr(CAST(_lh_s AS STRING), 1, 2), length(CAST(_lh_s AS STRING)), '0') " +
          "END AS BIGINT)").as("lb"))
      .groupBy("g", "lb").agg(count(lit(1)).as("cnt"))
    val byG = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("lb")
    val cum = hist
      .select(col("g"), col("lb"), col("cnt"),
        sum(col("cnt")).over(byG).as("cum"),
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy("g")).as("n"))
    val aggs = qs.map { q =>
      min(when(col("cum") >= ceil(lit(q) * col("n")), col("lb")))
        .cast("double").divide(lit(1000.0))
        .as(s"p${(q * 100).round}")
    }
    cum.groupBy(col("g").as(groupCol))
      .agg(max(col("n")).as("n"), aggs: _*)
  }

  /** DuckDB mirror of [[logHistQuantiles]] — same string-arithmetic
    * bucketing, same ⌈q·n⌉ rank rule. */
  def logHistQuantilesSql(table: String, groupCol: String, valueCol: String,
      qs: Seq[Double] = Seq(0.5, 0.95, 0.99)): String = {
    val cols = qs.map { q =>
      s"CAST(MIN(CASE WHEN cum >= ceil($q * n) THEN lb END) AS DOUBLE) / 1000.0 AS p${(q * 100).round}"
    }.mkString(",\n         ")
    s"""WITH s AS (SELECT $groupCol AS g,
             CAST(floor(CAST($valueCol AS DOUBLE) * 1000.0) AS BIGINT) AS sv
           FROM $table WHERE $valueCol > 0),
       b AS (SELECT g, CAST(CASE WHEN length(CAST(sv AS VARCHAR)) <= 2 THEN CAST(sv AS VARCHAR)
             ELSE rpad(substr(CAST(sv AS VARCHAR), 1, 2),
                       CAST(length(CAST(sv AS VARCHAR)) AS INTEGER), '0')
             END AS BIGINT) AS lb FROM s),
       h AS (SELECT g, lb, COUNT(*) AS cnt FROM b GROUP BY g, lb),
       c AS (SELECT g, lb, cnt,
             SUM(cnt) OVER (PARTITION BY g ORDER BY lb) AS cum,
             SUM(cnt) OVER (PARTITION BY g) AS n FROM h)
       SELECT g AS $groupCol, CAST(MAX(n) AS BIGINT) AS n,
         $cols
       FROM c GROUP BY g ORDER BY g"""
  }

  // --- HyperLogLog (integer-exact registers) -------------------------------

  /** m=32 buckets (b=5); payload width 55 bits; rank ∈ [1, 56]. */
  private[graft] val HllM = 32
  private[graft] val HllRankMax = 56 // = payload width 55 + 1 (the w == 0 case)
  private[graft] val HllAlphaM2TwoPow: Double =
    0.697 * HllM * HllM * math.pow(2, HllRankMax) // α₃₂·m²·2^56, ONE Scala literal

  /** Per-group HyperLogLog distinct-token estimate (Flajolet et al. 2007)
    * beside the exact count — the calibration row a release audit reads.
    *
    * The file-header Scaladoc says HLL "never could" oracle bit-for-bit;
    * this one does, by making every register fold EXACT-INTEGER:
    *
    *   - hash = first 15 md5 hex chars (60 bits); bucket = `h & 31`,
    *     payload `w = h >> 5` (55 bits) — bitwise, no float division;
    *   - rank = 56 − bitlength(w), with bitlength = length(ltrim(bin(w),
    *     '0')) — string ops, identical in Spark and DuckDB (w = 0 folds to
    *     rank 56, the correct W+1 sentinel);
    *   - the harmonic denominator Σ 2^(−M_j) is carried as the exact
    *     BIGINT S = Σ 2^(56−M_j) (≤ 32·2^56 = 2^61 — no overflow), so sum
    *     ORDER cannot perturb it; empty buckets contribute 2^56 exactly;
    *   - the only float ops are one division of two exact numbers and the
    *     small-range `m·ln(m/zeros)` branch — identical literals both
    *     sides, rounded at the edge.
    *
    * Scale: the distinct (group, token) relation is vocabulary-sized; the
    * register table is 32 rows per group; sketches merge by MAX per bucket
    * (the property that lets 1000 executors fold 100 TB into 32 longs).
    */
  def hllDistinctTokens(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = Dedup.parallelize(df)
      .select(col(groupCol).as("grp"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .distinct()
    val regs = toks
      .select(col("grp"),
        conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long").as("h"))
      .select(col("grp"), col("h").bitwiseAND(lit((HllM - 1).toLong)).as("bucket"),
        shiftright(col("h"), 5).as("w"))
      .withColumn("rank", lit(HllRankMax) - length(ltrim(bin(col("w")), "0")))
      .groupBy("grp", "bucket").agg(max("rank").as("reg"))
    val agg = regs.groupBy("grp").agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllRankMax - reg AS INT))")).as("s_present"),
      count(lit(1)).as("n_present"))
    val exact = toks.groupBy("grp").agg(count(lit(1)).as("exact_distinct"))
    val raw = lit(HllAlphaM2TwoPow) / col("s_total").cast("double")
    agg.join(exact, "grp")
      .withColumn("zeros", lit(HllM.toLong) - col("n_present"))
      .withColumn("s_total",
        col("s_present") + col("zeros") * lit(1L << HllRankMax))
      .withColumn("e",
        when(raw <= lit(2.5 * HllM) && col("zeros") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("zeros").cast("double")))
          .otherwise(raw))
      .select(col("grp").as(groupCol),
        round(col("e"), 3).as("est_hll"),
        col("exact_distinct"),
        round((col("e") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double"), 4).as("rel_err"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[hllDistinctTokens]] — same bit ops, same exact
    * integer register fold, same interpolated float literals.
    */
  def hllDistinctTokensSql(table: String, groupCol: String, textCol: String): String =
    s"""WITH t AS (SELECT DISTINCT grp, term FROM (
             SELECT $groupCol AS grp,
                    unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term
             FROM $table)),
       h AS (SELECT grp, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM t),
       b AS (SELECT grp, h & ${HllM - 1} AS bucket, h >> 5 AS w FROM h),
       r AS (SELECT grp, bucket, $HllRankMax - length(ltrim(bin(w), '0')) AS rank FROM b),
       regs AS (SELECT grp, bucket, MAX(rank) AS reg FROM r GROUP BY grp, bucket),
       agg AS (SELECT grp,
             CAST(SUM(1::BIGINT << ($HllRankMax - reg)) AS BIGINT) AS s_present,
             COUNT(*) AS n_present FROM regs GROUP BY grp),
       ex AS (SELECT grp, COUNT(*) AS exact_distinct FROM t GROUP BY grp),
       fin AS (SELECT agg.grp, exact_distinct, ($HllM - n_present) AS zeros,
             s_present + ($HllM - n_present) * (1::BIGINT << $HllRankMax) AS s_total
           FROM agg JOIN ex ON agg.grp = ex.grp),
       est AS (SELECT grp, exact_distinct,
             CASE WHEN $HllAlphaM2TwoPow / CAST(s_total AS DOUBLE) <= ${2.5 * HllM}
                       AND zeros > 0
                  THEN ${HllM.toDouble} * ln(${HllM.toDouble} / CAST(zeros AS DOUBLE))
                  ELSE $HllAlphaM2TwoPow / CAST(s_total AS DOUBLE) END AS e
           FROM fin)
       SELECT grp AS $groupCol, round(e, 3) AS est_hll, exact_distinct,
         round((e - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
       FROM est ORDER BY $groupCol"""
}
