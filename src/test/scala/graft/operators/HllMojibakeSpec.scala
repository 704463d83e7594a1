package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact HLL distinct sketch + encoding-quality audit. */
class HllMojibakeSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("hll-mojibake-spec")
    .getOrCreate()
  private def docs = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.documents(spark, "/root/testdata/sf0.001")
  }

  test("HLL estimate tracks the exact distinct count within sketch error") {
    // m=32 → standard error 1.04/√32 ≈ 18 %; 35 % is a 2σ-ish gate that a
    // broken bucket/rank computation (estimates off by 2-10×) blows through
    val rows = Sketch.hllDistinctTokens(docs, "source", "text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2))
      assert(exact > 0)
      assert(math.abs(est - exact) / exact <= 0.35,
        s"${r.getString(0)}: est=$est exact=$exact")
      assert(math.abs(r.getDouble(3) - (est - exact) / exact) < 1e-3)
    }
  }

  test("HLL registers are merge-consistent: union group == fold of the same tokens") {
    import spark.implicits._
    // the sketch of a USED+relabeled union must equal the sketch computed
    // over the union directly — register MAX-merge is what lets a 1000-
    // executor fold ship 32 longs per group instead of token sets
    val d = docs.limit(200).cache()
    val relabeled = d.withColumn("source", lit("all"))
    val est1 = Sketch.hllDistinctTokens(relabeled, "source", "text")
      .select("est_hll").head().getDouble(0)
    // same tokens, arbitrary split: distinct-union at the token level
    val half = d.withColumn("source",
      when(col("doc_id") % 2 === 0, "a").otherwise("b"))
    val perHalf = Sketch.hllDistinctTokens(half, "source", "text").collect()
    assert(perHalf.length == 2)
    // registers merged implicitly by recomputation on the full corpus:
    // est(all) must be insensitive to how rows were grouped before
    val est2 = Sketch.hllDistinctTokens(
      half.withColumn("source", lit("all")), "source", "text")
      .select("est_hll").head().getDouble(0)
    assert(est1 == est2, s"grouping order changed the sketch: $est1 vs $est2")
  }

  test("small groups route through linear counting (near-exact)") {
    import spark.implicits._
    val tiny = Seq((0L, "alpha beta gamma", "t"), (1L, "delta alpha", "t"))
      .toDF("doc_id", "text", "source")
    val r = Sketch.hllDistinctTokens(tiny, "source", "text").head()
    assert(r.getLong(2) == 4)
    // 4 distinct over 32 buckets: linear counting is exact-ish (< 1 off)
    assert(math.abs(r.getDouble(1) - 4.0) < 1.0, s"got ${r.getDouble(1)}")
  }

  test("mojibake scan counts each damage class exactly; clean text is clean") {
    import spark.implicits._
    val df = Seq(
      (0L, "perfectly clean ascii"),
      (1L, "ends with replacement �"),
      (2L, "Ã©Ã¨ two mojibake pairs"),
      (3L, "curly â€™quoteâ€œ twice"),
      (4L, "bell\u0007 and esc\u001b chars"),
      (5L, "tab\tand\nnewline are fine")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.mojibakeScan(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out(0) == ((0L, 0L, 0L, 0L, false)))
    assert(out(1) == ((1L, 1L, 0L, 0L, true)))
    assert(out(2) == ((2L, 0L, 2L, 0L, true)))
    assert(out(3) == ((3L, 0L, 2L, 0L, true)))
    assert(out(4) == ((4L, 0L, 0L, 2L, true)))
    assert(out(5) == ((5L, 0L, 0L, 0L, false)), "tab/newline must not count as control damage")
  }
}
