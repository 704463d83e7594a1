package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KeynessBurstinessSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("keyness-burstiness-spec")
    .getOrCreate()

  test("keyness surfaces the planted source-exclusive term, not shared stopwords") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = (
      (1 to 20).map(i => (i.toLong, "srcA", "the quick zebra runs over the zebra plain")) ++
      (1 to 20).map(i => (100L + i, "srcB", "the quick fox runs over the green plain"))
    ).toDF("doc_id", "source", "text")
    val top = TextAnalysis.sourceKeyness(docs, "source", "text", topN = 2)
      .select("source", "rank", "term")
      .as[(String, Long, String)].collect().toSeq.sorted
    assert(top.contains(("srcA", 1L, "zebra")), s"zebra not top for srcA: $top")
    assert(top.contains(("srcB", 1L, "fox")) || top.contains(("srcB", 1L, "green")),
      s"srcB's distinctive term missing: $top")
    // 'the' is everywhere: over-representation filter must keep it out
    assert(!top.exists(_._3 == "the"), s"stopword leaked into keyness: $top")
  }

  test("Fano factor: hand-computed burst vs flat stream, empty buckets in closed form") {
    import spark.implicits._
    // span fixed to 10 buckets by the corpus min/max; key 'burst' packs 9
    // events into bucket 0 and 1 into bucket 9; key 'flat' has one per bucket
    val rows =
      (0 until 9).map(_ => ("burst", 0L)) ++ Seq(("burst", 9L)) ++
        (0 until 10).map(b => ("flat", b.toLong))
    val df = rows.toDF("event_type", "b")
      .select(col("event_type"), timestamp_seconds(col("b") * 3600).as("ts"))
    // burst: counts {9,1} + 8 empty: mean 1, var = (81+1-10)/10 = 7.2
    val burst = Temporal.burstiness(df, "event_type", "ts", 3600L)
      .where(col("event_type") === "burst").select("fano").as[Double].head()
    val flat = Temporal.burstiness(df, "event_type", "ts", 3600L)
      .where(col("event_type") === "flat").select("fano").as[Double].head()
    assert(burst == 7.2, s"burst fano $burst")
    assert(flat == 0.0, s"flat fano $flat")
  }
}
