package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CooccurSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("cooccur-spec")
    .getOrCreate()

  test("window counts by hand: directional, bounded, never across documents") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b"),
      (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurCounts(df, "doc_id", "text", window = 2)
      .as[(String, String, Long)].collect().toSet
    // doc1 positions: a0 b1 a2 b3 — (a,b): a0→b1, a2→b3 = 2; (b,a): b1→a2;
    // (a,a): a0→a2; (b,b): b1→b3; doc2: (b,c) once, never (c,·) across docs
    assert(out == Set(
      ("a", "b", 2L), ("b", "a", 1L), ("a", "a", 1L), ("b", "b", 1L), ("b", "c", 1L)))
  }

  test("window=1 equals adjacent-bigram counts") {
    import spark.implicits._
    val df = Seq((1L, "x y x y x")).toDF("doc_id", "text")
    val out = TextAnalysis.cooccurCounts(df, "doc_id", "text", window = 1)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("x", "y", 2L), ("y", "x", 2L)))
  }

  test("the pair stream is join-free: one scan, one aggregation shuffle") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = TextAnalysis.cooccurCounts(df, "doc_id", "text", window = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"join leaked into the co-occurrence plan (pairs come from the scan projection):\n$plan")
    assert(plan.contains("HashAggregate"), s"pair agg missing:\n$plan")
  }

  test("pmi ranks a perfectly-bound pair above an independent one") {
    import spark.implicits._
    // 'p q' always together; 'x' pairs with many partners
    val docs = (0 until 30).map(i => (i.toLong, s"p q x t$i x u$i")).toDF("doc_id", "text")
    val top = TextAnalysis.pmiTop(docs, "doc_id", "text", window = 1, minCount = 5, topN = 3)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(top.head == ("p", "q"), s"expected (p,q) first, got $top")
  }
}
