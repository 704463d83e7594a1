package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RateZipfSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("rate-zipf-spec")
    .getOrCreate()

  test("rate anomaly: planted spike flagged, steady stream silent, warm-up excluded") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 'steady': 1 event per bucket for 30 buckets. 'spiky': same but bucket
    // 28 carries 10 events.
    val rows =
      (0 until 30).map(b => ("steady", b.toLong)) ++
        (0 until 30).flatMap { b =>
          val n = if (b == 28) 10 else 1
          Seq.fill(n)(("spiky", b.toLong))
        }
    val df = rows.toDF("event_type", "b")
      .select(col("event_type"), timestamp_seconds(col("b") * 3600).as("ts"))
    val out = Temporal.rateAnomaly(df, "event_type", "ts",
        bucketSeconds = 3600L, lookback = 24, zThresh = 2.5)
      .select("event_type", "bucket_ms", "n", "z")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out.map(_._1).distinct == Seq("spiky"), s"only the spike flags: $out")
    assert(out.map(_._2) == Seq(28L * 3600000), s"bucket 28 is the spike: $out")
    assert(out.head._3 == 10L && out.head._4 > 2.5, s"spike magnitude: $out")
  }

  test("rate anomaly: a spike inside warm-up (first 24 observed buckets) is not judged") {
    import spark.implicits._
    val rows = (0 until 20).flatMap { b =>
      val n = if (b == 10) 10 else 1
      Seq.fill(n)(("t", b.toLong))
    }
    val df = rows.toDF("event_type", "b")
      .select(col("event_type"), timestamp_seconds(col("b") * 3600).as("ts"))
    val out = Temporal.rateAnomaly(df, "event_type", "ts", 3600L, 24, 2.5).count()
    assert(out == 0, "warm-up buckets must not be judged")
  }

  test("zipf fit: perfect power law recovers its slope; ranks tie-break on term") {
    import spark.implicits._
    // frequencies f(r) = 64 / r for ranks 1..8 → exact slope -1 on log-log
    val terms = (1 to 8).flatMap { r =>
      Seq.fill(64 / r)(s"w$r")
    }
    val docs = Seq(("src", terms.mkString(" "))).toDF("source", "text")
    val out = TextAnalysis.zipfFit(docs, "source", "text")
      .select("source", "n_types", "slope")
      .as[(String, Long, Double)].collect().head
    assert(out._2 == 8L, s"type count: $out")
    // f = 64/r is not exactly integer-log-linear for r where 64/r rounds
    // (here all divisions are exact except r=3,5,6,7 floors) — slope lands
    // near -1
    assert(out._3 < -0.8 && out._3 > -1.2, s"zipf slope ≈ -1: $out")
  }

  test("zipf fit: uniform frequencies give slope 0") {
    import spark.implicits._
    val docs = Seq(("u", (1 to 6).map(i => s"t$i t$i t$i").mkString(" ")))
      .toDF("source", "text")
    val out = TextAnalysis.zipfFit(docs, "source", "text")
      .select("slope").as[Double].collect().head
    assert(out == 0.0, s"flat spectrum slope: $out")
  }
}
