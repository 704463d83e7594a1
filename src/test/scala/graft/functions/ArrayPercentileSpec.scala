package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 optimization guard: every multi-fraction exact-percentile site
  * (percentiles, value_bands, quantile_calib, ppl_buckets, gap_quantiles,
  * trimmed_mean_ab, pareto_share, tukey_fences, rfm_scores) now evaluates
  * ONE `percentile(col, array(f...))` aggregate and extracts elements,
  * instead of N scalar `percentile(col, f)` aggregates that each buffer
  * and sort the whole column. The rewrite is only sound while the array
  * form returns bit-identical values to the scalar form for every
  * fraction — Spark computes both from the same sorted counts buffer with
  * the same interpolation, and this spec pins that contract (including
  * the edge shapes: empty input → null, nulls skipped, single row,
  * duplicate-heavy columns, fractional interpolation between neighbors).
  */
class ArrayPercentileSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("array-percentile-spec")
    .getOrCreate()

  private val fracs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  private def check(values: Seq[java.lang.Double], clue: String): Unit = {
    import spark.implicits._
    val df = values.toDF("v")
    val arr = df
      .agg(expr(s"percentile(v, array(${fracs.mkString(",")}))").as("a"))
      .select(fracs.indices.map(i => col("a").getItem(i)): _*)
      .head()
    val scalars = df
      .agg(fracs.map(f => expr(s"percentile(v, $f)")).head,
        fracs.map(f => expr(s"percentile(v, $f)")).tail: _*)
      .head()
    fracs.indices.foreach { i =>
      assert(arr.isNullAt(i) == scalars.isNullAt(i), s"$clue null@$i")
      if (!arr.isNullAt(i))
        assert(java.lang.Double.doubleToRawLongBits(arr.getDouble(i)) ==
          java.lang.Double.doubleToRawLongBits(scalars.getDouble(i)),
          s"$clue frac=${fracs(i)}: ${arr.getDouble(i)} vs ${scalars.getDouble(i)}")
    }
  }

  test("array percentile is bit-equal to scalar percentiles") {
    check(Seq(1.0, 2.0, 3.0, 4.0, 5.0), "simple")
    check(Seq(42.0), "single row")
    check(Seq.empty, "empty input")
    check(Seq[java.lang.Double](null, 1.0, null, 2.0, 3.0), "nulls skipped")
    check(Seq(7.0, 7.0, 7.0, 7.0), "all duplicates")
    check(Seq(0.1, 0.2, 0.2, 0.2, 1e300, -1e300, 3.5), "extremes + dups")
    check((1 to 1000).map(i => java.lang.Double.valueOf((i % 37) * 0.251)),
      "duplicate-heavy")
  }
}
