package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online Holt snapshots == the batch twin across micro-batch splits, and
  * the final snapshot == the batch `holt_linear` board operator under the
  * every-key-spans-the-corpus precondition.
  */
class StreamHoltSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-holt-spec")
    .getOrCreate()

  private val MsPerDay = 86400000L

  test("exact-linear stream: zero SSE, true slope at every snapshot") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ev = (0 until 10).flatMap { d =>
      (0 until (10 + 2 * d)).map(i => StreamHolt.Event("a", d * MsPerDay + i))
    }
    val snaps = StreamHolt.batchSnapshots(
      ev.toDF("key", "tsMs").select(col("key"),
        timestamp_millis(col("tsMs")).as("ts")), "key", "ts")
      .collect().sortBy(_.dayMs)
    assert(snaps.length == 9) // days 1..9 (day 0 only seeds y1)
    snaps.foreach { s =>
      assert(s.sse == 0.0, s)
      assert(math.abs(s.trend - 2.0) < 1e-9, s)
      assert(s.forecast1 == s.level + s.trend)
    }
    assert(snaps.last.level == 28.0)
  }

  test("stream snapshots equal the batch twin across micro-batch splits") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("key"), unix_millis(col("ts")).as("tsMs"))
      .as[StreamHolt.Event].collect().toSeq
      .sortBy(e => (e.key, e.tsMs))
    val flush = ev.groupBy(_.key).map { case (k, es) =>
      StreamHolt.Event(k, es.map(_.tsMs).max + MsPerDay)
    }.toSeq

    val source = MemoryStream[StreamHolt.Event]
    val q = StreamHolt.snapshots(source.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("holt_snaps").start()
    try {
      val (a, rest) = ev.splitAt(ev.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c, flush).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.sql(
        "SELECT key, dayMs, count, level, trend, forecast1, sse FROM holt_snaps")
        .as[StreamHolt.Snapshot].collect().toSeq
        .sortBy(s => (s.key, s.dayMs))
      val want = StreamHolt.batchSnapshots(
        ev.toDF("key", "tsMs").select(col("key"),
          timestamp_millis(col("tsMs")).as("ts")), "key", "ts")
        .collect().toSeq.sortBy(s => (s.key, s.dayMs))
      assert(got == want, s"stream ${got.size} vs batch ${want.size}")
    } finally q.stop()
  }

  test("final snapshot matches the holt_linear board operator") {
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    // precondition: every key active on the corpus's first AND last day —
    // enforce by flushing every key at the global max + 1 and checking the
    // global min is each key's own first day
    val spanRows = events
      .select(col("event_type").as("key"),
        (unix_millis(col("ts")) / MsPerDay).cast("long").as("d"))
      .groupBy("key").agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .collect()
    val gMin = spanRows.map(_.getLong(1)).min
    val gMax = spanRows.map(_.getLong(2)).max
    val eligible = spanRows.filter(r => r.getLong(1) == gMin && r.getLong(2) == gMax)
      .map(_.getString(0)).toSet
    assert(eligible.nonEmpty, "fixture lost its always-active keys")

    // no flush needed: batchSnapshots closes the final open day at
    // end-of-data, and eligible keys have no trailing gap to densify
    val finals = StreamHolt.batchSnapshots(
      events.select(col("event_type").as("key"), col("ts")), "key", "ts")
      .collect().groupBy(_.key).map { case (k, ss) => k -> ss.maxBy(_.dayMs) }
    val board = graft.operators.Temporal.holtLinear(events, "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(5))).toMap
    eligible.foreach { k =>
      val s = finals(k)
      val (lvl, tr, sse) = board(k)
      assert(s.level == lvl && s.trend == tr && s.sse == sse,
        s"$k stream=(${s.level},${s.trend},${s.sse}) batch=($lvl,$tr,$sse)")
    }
  }
}
