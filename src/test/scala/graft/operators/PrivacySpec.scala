package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("privacy-spec")
    .getOrCreate()

  test("k-anonymity: hand-computed class spectrum and below-k shares") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // QI classes: (a,x)×4, (a,y)×2, (b,x)×1 → sizes {4:1, 2:1, 1:1},
    // 7 rows; below-2 share = 1/7; below-5 = 7/7 (every class is < 5)
    val df = (Seq.fill(4)(("a", "x")) ++ Seq.fill(2)(("a", "y")) :+ (("b", "x")))
      .toDF("src", "lang")
    val r = Privacy.kAnonymity(df, Seq("src", "lang"), ks = Seq(2, 5))
      .collect().head
    assert(r.getAs[Long]("n_class_sizes") == 3L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("n_rows") == 7L)
    assert(r.getAs[Long]("min_class") == 1L)
    assert(r.getAs[Double]("share_below_2") == math.rint(1.0 / 7 * 1e6) / 1e6)
    assert(r.getAs[Double]("share_below_5") == 1.0)
  }

  test("laplace counts: noise is bounded by the inverse CDF and scales with 1/epsilon") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 100).map(i => s"g${i % 10}").toDF("g")
    val tight = Privacy.laplaceCounts(df, "g", epsilon = 10.0)
      .select($"g", $"n", $"n_released").as[(String, Long, Double)].collect()
    assert(tight.length == 10 && tight.forall(_._2 == 10L))
    // ε=10: |noise| rarely exceeds b·ln(1/u_min); with 10 groups the max
    // |noise| should be modest — and deterministic across runs
    val tight2 = Privacy.laplaceCounts(df, "g", epsilon = 10.0)
      .select($"n_released").as[Double].collect().toSeq
    assert(tight2 == tight.map(_._3).toSeq, "seeded noise must be deterministic")
    val loose = Privacy.laplaceCounts(df, "g", epsilon = 0.1)
      .select($"g", $"n_released").as[(String, Double)].collect()
      .map { case (g, r) => g -> r }.toMap
    val tightM = tight.map(t => t._1 -> t._3).toMap
    // same seeded uniform, larger b: every group's |noise| scales by
    // exactly eps_ratio = 100
    tight.foreach { case (g, n, _) =>
      val a = math.abs(tightM(g) - n)
      val b = math.abs(loose(g) - n)
      assert(math.abs(b - a * 100) < 0.02, s"$g: $a vs $b")
    }
  }
}
