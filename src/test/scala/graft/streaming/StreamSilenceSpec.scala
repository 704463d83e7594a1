package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Event-time-timeout semantics of the dead-stream detector: alerts fire
  * when the WATERMARK passes a key's armed deadline, new data re-arms, a
  * revived key alerts again on its next silence episode.
  */
class StreamSilenceSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-silence-spec")
    .getOrCreate()

  test("silent key alerts once the watermark passes its deadline; live key does not") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    // well above epoch 0: the initial watermark is 0, and rows at or
    // below the watermark are dropped as late before reaching the operator
    val T0 = 1_000_000_000_000L
    val source = MemoryStream[(String, Long)]
    val q = StreamSilence.detect(source.toDS(), silenceMs = 5000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("silence_alerts").start()
    try {
      // both keys alive at t=T0
      source.addData(("a", T0), ("b", T0)); q.processAllAvailable()
      // b keeps beating; watermark -> 10000 > a's deadline 5000, but the
      // timeout fires on the NEXT trigger after the watermark advances
      source.addData(("b", T0 + 10000L)); q.processAllAvailable()
      source.addData(("b", T0 + 11000L)); q.processAllAvailable()
      val alerts1 = spark.sql("SELECT key, last_seen_ms, deadline_ms FROM silence_alerts")
        .as[(String, Long, Long)].collect().toSet
      assert(alerts1 == Set(("a", T0, T0 + 5000L)), s"got $alerts1")

      // a revives, then goes silent again -> a SECOND alert for the new
      // episode (state was removed after the first)
      source.addData(("a", T0 + 12000L)); q.processAllAvailable()
      source.addData(("b", T0 + 20000L)); q.processAllAvailable()
      source.addData(("b", T0 + 21000L)); q.processAllAvailable()
      val alerts2 = spark.sql("SELECT key, last_seen_ms, deadline_ms FROM silence_alerts")
        .as[(String, Long, Long)].collect().toSet
      assert(alerts2 == Set(("a", T0, T0 + 5000L), ("a", T0 + 12000L, T0 + 17000L)), s"got $alerts2")

      // b has never been silent past its deadline at the final watermark
      assert(!alerts2.exists(_._1 == "b"))
    } finally q.stop()
  }

  test("re-arming: steady heartbeats under the threshold never alert") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val source = MemoryStream[(String, Long)]
    val q = StreamSilence.detect(source.toDS(), silenceMs = 5000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("silence_none").start()
    try {
      val T0 = 1_000_000_000_000L
      (0L to 20000L by 4000L).foreach { t =>
        source.addData(("k", T0 + t)); q.processAllAvailable()
      }
      assert(spark.sql("SELECT * FROM silence_none").count() == 0)
    } finally q.stop()
  }
}
