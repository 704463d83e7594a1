package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream parity over the REAL driver fixtures (round-4 lesson: every
  * operator spec synthesized its own timestamps, so a fixture `ts` encoding
  * change broke the board without a single spec going red — see
  * [[graft.QueryBoardSmokeSpec]] for the analysis-time tripwire; this spec
  * is the streaming-semantics counterpart).
  *
  * Each test drives the sf0.001 `events` table — loaded through
  * [[graft.Tables]] exactly as the board queries load it — through the
  * streaming operator in several time-ordered micro-batches and asserts the
  * result equals the batch expression on the same rows. So both the ts
  * normalization AND cross-batch state carry are exercised with the real
  * event-time distribution (15 users, 1000 events, ~30 days).
  */
class FixtureStreamParitySpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("fixture-stream-parity")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"
  private val gapMs = 7200000L // the board query's 2h inactivity gap

  test("streaming sessionization over fixture events equals the batch sessionize query") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .orderBy("ts_ms")
      .as[(Long, Long)].collect()
      .map { case (u, t) => Sessionize.Event(u, t) }

    // a sentinel per user, 2×gap past the corpus end, closes every
    // still-open session so Append mode emits the full session list
    val flushMs = events.map(_.tsMs).max + 2 * gapMs + 1
    val sentinels = events.map(_.userId).distinct.map(Sessionize.Event(_, flushMs))

    val source = MemoryStream[Sessionize.Event]
    val q = Sessionize.sessionize(source.toDS(), gapMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("fixture_sessions").start()
    try {
      // four time-ordered micro-batches: sessions span batch boundaries,
      // so state carry (not just per-batch sorting) is what's under test
      events.grouped((events.length + 3) / 4).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      source.addData(sentinels.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark.sql("SELECT userId, startMs, endMs, nEvents FROM fixture_sessions")
        .as[(Long, Long, Long, Long)].collect()
        .filterNot(_._2 == flushMs) // the sentinels' own one-event sessions
        .map { case (u, s, e, n) => (u, n, e - s) }
        .sorted.toSeq

      val batch = graft.SparkEntry.queries("sessionize")(spark, dir)
        .select(col("user_id"), col("n_events"), col("duration_ms"))
        .as[(Long, Long, Long)].collect().sorted.toSeq

      assert(streamed == batch,
        s"stream/batch session mismatch: ${streamed.size} vs ${batch.size} sessions")
    } finally q.stop()
  }

  test("streaming tumbling-window counts over fixture events equal the batch query") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val rows = graft.Tables.events(spark, dir)
      .select(unix_millis(col("ts")).as("ts_ms"), col("value"))
      .orderBy("ts_ms")
      .as[(Long, Double)].collect()

    val source = MemoryStream[(Long, Double)]
    val windowed = source.toDS().toDF("ts_ms", "value")
      .select(timestamp_millis(col("ts_ms")).as("ts"), col("value"))
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("w"), col("n"), col("sum_value"))
    val q = windowed.writeStream.outputMode("complete")
      .format("memory").queryName("fixture_tumbling").start()
    try {
      rows.grouped((rows.length + 3) / 4).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT w, n, sum_value FROM fixture_tumbling")
        .as[(Long, Long, Double)].collect().sorted.toSeq
      val batch = graft.SparkEntry.queries("tumbling_window")(spark, dir)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming rate anomalies over fixture events equal the batch gate") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val (bucketSec, lookback, zThresh) = (3600L, 24, 2.5) // the board params
    val events = graft.Tables.events(spark, dir)
      .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      .orderBy("ts_ms")
      .as[(String, Long)].collect()
      .map { case (k, t) => StreamRateAnomaly.Event(k, t) }

    // one sentinel per key past the corpus end closes the final real
    // bucket (the batch gate judges every observed bucket; a live stream's
    // open bucket is legitimately unjudged until it closes)
    val flushMs = events.map(_.tsMs).max + 2 * bucketSec * 1000L
    val sentinels = events.map(_.key).distinct
      .map(StreamRateAnomaly.Event(_, flushMs))

    val source = MemoryStream[StreamRateAnomaly.Event]
    val q = StreamRateAnomaly.anomalies(source.toDS(), bucketSec, lookback, zThresh)
      .writeStream.outputMode("append")
      .format("memory").queryName("fixture_rate_anomaly").start()
    try {
      events.grouped((events.length + 3) / 4).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      source.addData(sentinels.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamed = spark.sql(
          "SELECT key, bucketMs, n, z FROM fixture_rate_anomaly")
        .as[(String, Long, Long, Double)].collect().sorted.toSeq
      val batch = graft.SparkEntry.queries("rate_anomaly")(spark, dir)
        .select(col("event_type"), col("bucket_ms"), col("n"), col("z"))
        .as[(String, Long, Long, Double)].collect().sorted.toSeq
      assert(batch.nonEmpty, "fixture should contain rate anomalies")
      assert(streamed == batch,
        s"stream/batch anomaly mismatch: ${streamed.size} vs ${batch.size}")
    } finally q.stop()
  }

  test("streaming EWMA final-day readout equals the batch ewma_daily gate") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val events = graft.Tables.events(spark, dir)
      .select(col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      .orderBy("ts_ms")
      .as[(String, Long)].collect()
      .map { case (k, t) => StreamEwma.Event(k, t) }

    // seeding parity precondition: the stream seeds each key at ITS first
    // observed day (no corpus span exists on an unbounded stream), the
    // batch fold at the CORPUS first day — identical only when every key
    // is active on day 0. Assert that precondition so the equality claim
    // below is honest rather than accidental.
    val day0 = events.map(e => Math.floorDiv(e.tsMs, 86400000L)).min
    val firstDayByKey = events.groupBy(_.key)
      .map { case (k, es) => k -> es.map(e => Math.floorDiv(e.tsMs, 86400000L)).min }
    assert(firstDayByKey.values.forall(_ == day0),
      s"fixture precondition: every key active on corpus day 0: $firstDayByKey")

    val lastDay = events.map(e => Math.floorDiv(e.tsMs, 86400000L)).max
    val sentinels = events.map(_.key).distinct
      .map(StreamEwma.Event(_, (lastDay + 1) * 86400000L + 1))

    val source = MemoryStream[StreamEwma.Event]
    // gateMult 0: every closed day emits its readout, so the final-day
    // comparison below is a FULL-readout parity, not empty-vs-empty on a
    // smooth fixture
    val q = StreamEwma.anomalies(source.toDS(), gateMult = 0.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("fixture_ewma").start()
    try {
      events.grouped((events.length + 3) / 4).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      source.addData(sentinels.toIndexedSeq: _*)
      q.processAllAvailable()

      val streamedFinal = spark.sql(
          s"SELECT key, n, levelPrev, resid FROM fixture_ewma WHERE dayMs = ${lastDay * 86400000L}")
        .as[(String, Long, Double, Double)].collect().sorted.toSeq
      val batch = graft.SparkEntry.queries("ewma_daily")(spark, dir)
        .select(col("event_type"), col("c_last"), col("level_prev"), col("resid"))
        .as[(String, Long, Double, Double)].collect().sorted.toSeq
      assert(batch.nonEmpty && streamedFinal == batch,
        s"stream final-day vs batch gate: $streamedFinal vs $batch")
    } finally q.stop()
  }

  test("streaming funnel advances over fixture events equal the batch funnel counts") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val stages = Seq("signup", "view", "click", "purchase")
    val windowMs = 7 * 86400000L
    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .orderBy("ts_ms")
      .as[(Long, Long, String)].collect()
      .map { case (u, t, e) => StreamFunnel.Event(u, t, e) }

    val source = MemoryStream[StreamFunnel.Event]
    val q = StreamFunnel.funnel(source.toDS(), stages, windowMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("fixture_funnel").start()
    try {
      // four time-ordered micro-batches: stage advances cross batch
      // boundaries, so state carry is under test, not per-batch sorting
      events.grouped((events.length + 3) / 4).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // each user emits at most one advance per stage; per-stage user
      // counts are the batch funnel's n_users column
      val advances = spark.sql("SELECT userId, stageIdx FROM fixture_funnel")
        .as[(Long, Int)].collect().toSeq
      assert(advances.distinct.size == advances.size,
        "a user advanced the same stage twice")
      val streamed = advances.groupBy(_._2).view.mapValues(_.size.toLong)
        .toMap
      val batch = graft.SparkEntry.queries("funnel")(spark, dir)
        .select(col("stage_idx"), col("n_users"))
        .as[(Int, Long)].collect().toMap
      assert(stages.indices.forall(i =>
          streamed.getOrElse(i, 0L) == batch.getOrElse(i, 0L)),
        s"stream/batch funnel mismatch: $streamed vs $batch")
    } finally q.stop()
  }
}
