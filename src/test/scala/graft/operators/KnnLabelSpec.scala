package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KnnLabelSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("knn-label-spec")
    .getOrCreate()

  test("majority vote with smallest-label tie-break on a hand-built geometry") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // query vec 100 at the origin axis; references: two of label 1 and two
    // of label 0 equally close among top-4 → 2-2 tie → label 0 wins
    val refs = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.9f, -0.1f), 0),
      (3L, Array(1.0f, 0.01f), 0),
      (4L, Array(-1.0f, 0.0f), 7), // opposite direction, never in top-4
      (100L, Array(1.0f, 0.0f), 9)) // the query row (its own label ignored)
    val df = refs.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabel(df, "vec_id", "embedding", "label",
        isQuery = col("vec_id") === 100L, k = 4)
      .as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((100L, 0, 2L)))
  }

  test("clear majority wins regardless of label order") {
    import spark.implicits._
    val refs = Seq(
      (0L, Array(1.0f, 0.0f), 5),
      (1L, Array(0.99f, 0.01f), 5),
      (2L, Array(0.98f, 0.02f), 5),
      (3L, Array(0.0f, 1.0f), 1),
      (200L, Array(1.0f, 0.0f), 0))
    val out = Similarity.knnLabel(refs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", isQuery = col("vec_id") === 200L, k = 3)
      .as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((200L, 5, 3L)))
  }
}
