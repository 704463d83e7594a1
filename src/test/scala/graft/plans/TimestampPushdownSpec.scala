package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The TimestampPushdown rewrite must be invisible except in the plan:
  * results identical to brute-force evaluation for every comparison op at
  * and around division boundaries — including the negative-operand rows
  * where truncate-toward-zero and floor division disagree (the rule must
  * REFUSE those rewrites rather than change results).
  */
class TimestampPushdownSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("ts-pushdown-spec")
    .getOrCreate()

  test("div-comparison rewrites agree with brute force at boundaries, incl. negatives") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    // nanos values straddling every interesting µs boundary, plus negatives
    val vals: Seq[Long] = Seq(
      -2001L, -2000L, -1999L, -1001L, -1000L, -999L, -1L, 0L, 1L,
      999L, 1000L, 1001L, 1999L, 2000L, 2001L, 2999L, 3000L,
      999999L, 1000000L, 1000001L)
    val df = vals.toDF("ns")
    val micros = col("ns") / lit(1000L) // plain double div for ground truth
    for (m <- Seq(1L, 2L, 1000L)) {
      def truth(f: Long => Boolean): Set[Long] =
        vals.filter(v => f(v / 1000L)).toSet // JVM / == Spark div (trunc)
      val cases = Seq[(String, org.apache.spark.sql.Column, Long => Boolean)](
        (">=", expr(s"ns div 1000") >= m, q => q >= m),
        (">", expr(s"ns div 1000") > m, q => q > m),
        ("<", expr(s"ns div 1000") < m, q => q < m),
        ("<=", expr(s"ns div 1000") <= m, q => q <= m),
        ("==", expr(s"ns div 1000") === m, q => q == m)
      )
      cases.foreach { case (op, pred, f) =>
        val got = df.where(pred).as[Long].collect().toSet
        assert(got == truth(f), s"op $op m=$m: got $got want ${truth(f)}")
      }
    }
    assert(micros != null) // keep the helper referenced
  }

  test("timestamp predicate over the events table reaches PushedFilters") {
    val df = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val plan = df
      .where(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
      .queryExecution.executedPlan.toString
    // nanos-backed fixtures push a Long bound; NTZ-backed fixtures push an
    // NTZ literal (cast unwrapped by the UTC rewrite) — accept either form
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts,[^)]+\\).*"),
      s"ts pushdown missing:\n$plan")
    // and the rewritten filter returns exactly what the unpushed form does
    val n1 = df.where(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp")).count()
    val n2 = df.collect().count(r =>
      !r.getAs[java.sql.Timestamp]("ts").before(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
    assert(n1 == n2, s"pushdown changed results: $n1 vs $n2")
  }
}
