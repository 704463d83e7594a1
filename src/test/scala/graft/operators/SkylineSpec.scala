package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-phase skyline ≡ brute-force NOT EXISTS domination — including the
  * tie cases the sweep must get exactly right (equal-x strict-y, equal-y
  * strict-x, exact duplicates surviving together).
  */
class SkylineSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("skyline-spec")
    .getOrCreate()

  private def brute(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, x2, y2) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._1).toSet

  test("synthetic ties: equal-x, equal-y, and exact duplicates") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // frontier candidates: (10,5) dominated by (10,7); (7,7) dominated by
    // (10,7); exact duplicates (10,7) twice BOTH survive; (4,9)/(12,3)
    // independent frontier points; (4,8) dominated by (4,9)
    val pts = Seq(
      (1L, 10.0, 5.0), (2L, 10.0, 7.0), (3L, 10.0, 7.0), (4L, 7.0, 7.0),
      (5L, 4.0, 9.0), (6L, 12.0, 3.0), (7L, 4.0, 8.0), (8L, 1.0, 1.0))
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.frontier(df, "x", "y", buckets = 3)
      .select("id").as[Long].collect().toSet
    assert(got == brute(pts))
    assert(got == Set(2L, 3L, 5L, 6L))
  }

  test("fixture orders frontier matches brute-force domination") {
    import spark.implicits._
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"),
        unix_millis(col("o_orderdate").cast("timestamp")).cast("double").as("d"))
    val pts = o.as[(Long, Double, Double)].collect().toSeq
    val got = Skyline.frontier(o, "o_totalprice", "d")
      .select("o_orderkey").as[Long].collect().toSet
    assert(got == brute(pts))
    assert(got.nonEmpty)
  }

  test("plan: two-phase sweep never plans a cartesian or nested-loop join") {
    val df = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    val plan = Skyline.frontier(df, "o_totalprice", "o_orderdate")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
