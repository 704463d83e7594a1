package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Page-CUSUM stream alerts == the batch twin's fold over the same rows,
  * across arbitrary micro-batch splits; plus planted level-shift semantics.
  */
class StreamCusumSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-cusum-spec")
    .getOrCreate()

  private val MsPerDay = 86400000L

  test("planted level shift alerts up once, drought alerts down") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 7 warm-up days at 10/day, then a sustained 20/day shift
    val up = (0 until 14).flatMap { d =>
      val n = if (d < 7) 10 else 20
      (0 until n).map(i => StreamCusum.Event("up", d * MsPerDay + i * 1000L))
    }
    // 7 warm-up days at 10/day, then near-silence (1/day keeps days closing)
    val down = (0 until 14).flatMap { d =>
      val n = if (d < 7) 10 else 1
      (0 until n).map(i => StreamCusum.Event("down", d * MsPerDay + i * 1000L))
    }
    val alerts = StreamCusum.batchAlerts(
      (up ++ down).toDF("key", "tsMs")
        .select(col("key"), timestamp_millis(col("tsMs")).as("ts")),
      "key", "ts", warmup = 7, slack = 0.5, h = 2.0)
      .collect().toSeq
    val byKey = alerts.groupBy(_.key)
    assert(byKey("up").forall(_.direction == "up"))
    assert(byKey("down").forall(_.direction == "down"))
    // detection delay: 20 vs mu0=10, slack .5 → S+ grows 9.5/day, h·μ0=20
    // crosses on the third shifted day (day 9)
    assert(byKey("up").head.dayMs == 9 * MsPerDay, byKey("up").head)
  }

  test("stream alerts equal the batch twin across micro-batch splits") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("key"), unix_millis(col("ts")).as("tsMs"))
      .as[StreamCusum.Event].collect().toSeq
      .sortBy(e => (e.key, e.tsMs))
    // flush sentinel ONE day past each key's own last event: closes the
    // open day without folding gap zeros the batch twin never sees
    val flush = ev.groupBy(_.key).map { case (k, es) =>
      StreamCusum.Event(k, es.map(_.tsMs).max + MsPerDay)
    }.toSeq

    val source = MemoryStream[StreamCusum.Event]
    val q = StreamCusum.alerts(source.toDS(), warmup = 3, slack = 0.25, h = 1.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_alerts").start()
    try {
      val (a, rest) = ev.splitAt(ev.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c, flush).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.sql("SELECT key, dayMs, direction, stat FROM cusum_alerts")
        .as[StreamCusum.Alert].collect().toSeq
        .sortBy(a => (a.key, a.dayMs))
      val batch = StreamCusum.batchAlerts(
          graft.Tables.events(spark, "/root/testdata/sf0.001"),
          "event_type", "ts", warmup = 3, slack = 0.25, h = 1.0)
        .collect().toSeq.sortBy(a => (a.key, a.dayMs))
      assert(got.nonEmpty, "fixture should produce at least one alert at h=1")
      // the stream's flush day opens a fresh unjudged day; the batch twin
      // closes exactly the same set of days — alert streams must be equal
      assert(got == batch)
    } finally q.stop()
  }

  test("one batch equals three batches bit-for-bit (split invariance)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ev = (0 until 20).flatMap { d =>
      val n = if (d < 7) 6 else if (d < 12) 15 else 2
      (0 until n).map(i => StreamCusum.Event("k", d * MsPerDay + i * 7000L))
    }
    def run(chunks: Seq[Seq[StreamCusum.Event]], name: String) = {
      val source = MemoryStream[StreamCusum.Event]
      val q = StreamCusum.alerts(source.toDS(), warmup = 7, slack = 0.5, h = 2.0)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        chunks.foreach { ch => source.addData(ch: _*); q.processAllAvailable() }
        spark.sql(s"SELECT key, dayMs, direction, stat FROM $name")
          .as[StreamCusum.Alert].collect().toSeq.sortBy(a => (a.key, a.dayMs))
      } finally q.stop()
    }
    val one = run(Seq(ev), "cusum_one")
    val three = run(Seq(ev.take(40), ev.slice(40, 123), ev.drop(123)), "cusum_three")
    assert(one == three)
    assert(one.nonEmpty)
  }
}
