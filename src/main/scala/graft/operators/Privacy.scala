package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing and release primitives for dataset publication — the
  * checks a corpus goes through before it leaves the building alongside
  * [[TextAnalysis.scrubPii]] (scrubbing removes direct identifiers;
  * these measure what the REMAINING quasi-identifiers still reveal, and
  * add calibrated noise to released aggregates).
  */
object Privacy {

  /** k-anonymity audit (Sweeney 2002): group rows by their
    * quasi-identifier combination, read the equivalence-class size
    * spectrum, and report the share of rows in classes smaller than each
    * candidate k — the number a release review asks for ("what fraction
    * of rows is re-identifiable at k=5?"). One hash aggregation over the
    * QI columns (map-side combinable), then two bounded rollups over the
    * class-size relation; the fact table never shuffles twice.
    */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String],
      ks: Seq[Int] = Seq(2, 5, 10)): DataFrame = {
    require(quasiIds.nonEmpty && ks.nonEmpty && ks.forall(_ >= 2),
      "kAnonymity: need quasi-identifier columns and ks >= 2")
    val classes = df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("_ka_sz"))
    val spectrum = classes.groupBy(col("_ka_sz")).agg(count(lit(1)).as("_ka_n"))
    val total = sum(col("_ka_sz") * col("_ka_n"))
    val aggs =
      Seq(count(lit(1)).cast("long").as("n_class_sizes"),
        sum(col("_ka_n")).as("n_classes"),
        total.as("n_rows"),
        min(col("_ka_sz")).as("min_class")) ++
      ks.map(k =>
        round(sum(when(col("_ka_sz") < k, col("_ka_sz") * col("_ka_n"))
            .otherwise(0L)).cast("double") / total.cast("double"), 6)
          .as(s"share_below_$k"))
    spectrum.agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB mirror of [[kAnonymity]]. */
  def kAnonymitySql(tbl: String, quasiIds: Seq[String],
      ks: Seq[Int] = Seq(2, 5, 10)): String = {
    val qi = quasiIds.mkString(", ")
    val shares = ks.map(k =>
      s"""round(CAST(SUM(CASE WHEN sz < $k THEN sz * n ELSE 0 END) AS DOUBLE)
          / CAST(SUM(sz * n) AS DOUBLE), 6) AS share_below_$k""")
      .mkString(",\n         ")
    s"""WITH cls AS (SELECT $qi, COUNT(*) AS sz FROM $tbl GROUP BY $qi),
       spec AS (SELECT sz, COUNT(*) AS n FROM cls GROUP BY sz)
       SELECT COUNT(*) AS n_class_sizes,
         CAST(SUM(n) AS BIGINT) AS n_classes,
         CAST(SUM(sz * n) AS BIGINT) AS n_rows,
         MIN(sz) AS min_class,
         $shares
       FROM spec"""
  }

  /** Laplace-noised count release: per-group counts plus
    * Laplace(1/ε) noise via the inverse-CDF transform
    * `−b·sign(u−½)·ln(1−2|u−½|)` of an md5-derived uniform — the
    * ε-DP release mechanism for counting queries (sensitivity 1), with
    * the caveat stated where it matters: the uniform is SEEDED (a pure
    * function of group and salt) so the release is reproducible and
    * cross-engine testable; a production ε-DP release must draw fresh
    * randomness per release instead (one substitution at this call
    * site). Zero extra shuffles — noise is a scalar expression over the
    * bounded group-count relation.
    */
  def laplaceCounts(df: DataFrame, groupCol: String, epsilon: Double,
      salt: String = "dp"): DataFrame = {
    require(epsilon > 0, "laplaceCounts: epsilon > 0")
    val u = conv(substring(md5(concat(lit(salt + ":"),
        col(groupCol).cast("string"))), 1, 15), 16, 10)
      .cast("double") / lit((1L << 60).toDouble)
    val centered = u - lit(0.5)
    val b = 1.0 / epsilon
    val noise = -lit(b) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        round(col("n").cast("double") + noise, 4).as("n_released"),
        lit(epsilon).as("epsilon"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[laplaceCounts]]. */
  def laplaceCountsSql(tbl: String, groupCol: String, epsilon: Double,
      salt: String = "dp"): String = {
    val b = (1.0 / epsilon).toString
    s"""WITH g AS (SELECT $groupCol, COUNT(*) AS n FROM $tbl GROUP BY $groupCol),
       u AS (SELECT $groupCol, n,
           CAST('0x'||substr(md5('${OracleSql.esc(salt)}:'||CAST($groupCol AS VARCHAR)),1,15) AS BIGINT)
             / 1152921504606846976.0 - 0.5 AS c
         FROM g)
       SELECT $groupCol, n,
         round(CAST(n AS DOUBLE) + (- CAST($b AS DOUBLE) * sign(c)
           * ln(CAST(1.0 AS DOUBLE) - CAST(2.0 AS DOUBLE) * abs(c))), 4) AS n_released,
         CAST($epsilon AS DOUBLE) AS epsilon
       FROM u ORDER BY $groupCol"""
  }
}
