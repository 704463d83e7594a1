package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ADWIN adaptive-window stream alerts == the batch twin's fold over the
  * same rows across arbitrary micro-batch splits; planted-shift semantics
  * (cut at the change, window mean tracks the new level); stable streams
  * stay silent with no tuning.
  */
class StreamAdwinSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-adwin-spec")
    .getOrCreate()

  private val MsPerDay = 86400000L

  test("planted level shift cuts the window; stable stream stays silent") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 30 days at 10/day then 30 days at 40/day; plus a noisy-but-stable key
    val rows = (0 until 60).flatMap { d =>
      val shift = if (d < 30) 10 else 40
      val stable = 10 + (d % 3) // 10/11/12 cycle — bounded jitter
      (0 until shift).map(i =>
        StreamAdwin.Event("shift", d * MsPerDay + i * 1000L)) ++
        (0 until stable).map(i =>
          StreamAdwin.Event("stable", d * MsPerDay + i * 1000L))
    }
    val alerts = StreamAdwin.batchAlerts(
      rows.toDF("key", "tsMs")
        .select(col("key"), timestamp_millis(col("tsMs")).as("ts")),
      "key", "ts")
      .collect().toSeq
    val byKey = alerts.groupBy(_.key)
    assert(!byKey.contains("stable"), s"stable key must not alert: $byKey")
    val shifts = byKey("shift").sortBy(_.dayMs)
    assert(shifts.nonEmpty)
    // first cut lands within a few days of the change point (day 30)
    val firstDay = shifts.head.dayMs / MsPerDay
    assert(firstDay >= 30 && firstDay <= 36, s"cut at day $firstDay")
    // after the final cut the kept-window mean tracks the new level
    val last = shifts.last
    assert(last.meanAfter > 30.0, s"meanAfter=${last.meanAfter}")
    assert(last.meanBefore < last.meanAfter)
  }

  test("stream alerts equal the batch twin across micro-batch splits") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("key"), unix_millis(col("ts")).as("tsMs"))
      .as[StreamAdwin.Event].collect().toSeq
      .sortBy(e => (e.key, e.tsMs))
    val flush = ev.groupBy(_.key).map { case (k, es) =>
      StreamAdwin.Event(k, es.map(_.tsMs).max + MsPerDay)
    }.toSeq

    val source = MemoryStream[StreamAdwin.Event]
    // δ loose enough that the fixture's own variation can cut — the point
    // is fold parity, not detection
    val q = StreamAdwin.alerts(source.toDS(), delta = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("adwin_alerts").start()
    try {
      val (a, rest) = ev.splitAt(ev.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c, flush).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.sql(
        "SELECT key, dayMs, nDropped, nKept, meanBefore, meanAfter FROM adwin_alerts")
        .as[StreamAdwin.Alert].collect().toSeq
        .sortBy(a => (a.key, a.dayMs))
      val batch = StreamAdwin.batchAlerts(
          graft.Tables.events(spark, "/root/testdata/sf0.001"),
          "event_type", "ts", delta = 0.5)
        .collect().toSeq.sortBy(a => (a.key, a.dayMs))
      assert(got == batch)
    } finally q.stop()
  }

  test("one batch equals three batches bit-for-bit (split invariance)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ev = (0 until 50).flatMap { d =>
      val n = if (d < 25) 8 else 30
      (0 until n).map(i => StreamAdwin.Event("k", d * MsPerDay + i * 7000L))
    }
    def run(chunks: Seq[Seq[StreamAdwin.Event]], name: String) = {
      val source = MemoryStream[StreamAdwin.Event]
      val q = StreamAdwin.alerts(source.toDS())
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        chunks.foreach { ch => source.addData(ch: _*); q.processAllAvailable() }
        spark.sql(
          s"SELECT key, dayMs, nDropped, nKept, meanBefore, meanAfter FROM $name")
          .as[StreamAdwin.Alert].collect().toSeq.sortBy(a => (a.key, a.dayMs))
      } finally q.stop()
    }
    val one = run(Seq(ev), "adwin_one")
    val three = run(Seq(ev.take(70), ev.slice(70, 300), ev.drop(300)), "adwin_three")
    assert(one == three)
    assert(one.nonEmpty, "the planted shift must cut at default delta")
  }

  test("bucket list stays logarithmic in window length") {
    import spark.implicits._
    // 400 stable days: window grows to 400, buckets must stay ~ M·log2(400)
    val rows = (0 until 400).flatMap { d =>
      (0 until 5).map(i => StreamAdwin.Event("k", d * MsPerDay + i * 1000L))
    }
    // run the pure fold via batchAlerts on a tiny partition — no alert
    // expected; instead assert via the stream state ceiling indirectly:
    // an (internal) overflow would blow compress into deep recursion; the
    // observable contract here is "no alert and no failure at 400 days"
    val alerts = StreamAdwin.batchAlerts(
      rows.toDF("key", "tsMs")
        .select(col("key"), timestamp_millis(col("tsMs")).as("ts")),
      "key", "ts").collect()
    assert(alerts.isEmpty)
  }
}
