package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LabelMarginSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("label-margin-spec")
    .getOrCreate()

  test("well-separated planted clusters read fully separated; mixed labels do not") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // axis-aligned clusters with small deterministic jitter on the OTHER axis
    val rows =
      (0 until 10).map(i => (i.toLong, Array(1.0f, 0.01f * i), 0)) ++
      (0 until 10).map(i => (100L + i, Array(0.01f * i, 1.0f), 1)) ++
      // label 2 = points scattered into BOTH clusters: mean margin must be worse
      (0 until 5).map(i => (200L + i, Array(1.0f, 0.02f * i), 2)) ++
      (0 until 5).map(i => (300L + i, Array(0.02f * i, 1.0f), 2))
    val out = Similarity.labelCentroidMargin(rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0)._4 == 1.0 && out(1)._4 == 1.0,
      s"separated clusters must have frac_separated 1.0: $out")
    assert(out(2)._3 < out(0)._3 && out(2)._3 < out(1)._3,
      s"mixed label must have the worst margin: $out")
    assert(out(2)._4 <= 0.5, s"mixed label can't be mostly separated: $out")
  }
}
