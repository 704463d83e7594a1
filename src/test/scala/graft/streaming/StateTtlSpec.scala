package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** State-TTL eviction for the per-user/per-query streaming monitors
  * (round-9 verdict #4): with a TTL configured, a key that receives no
  * input for the duration has its state ACTUALLY evicted — the next record
  * folds from None, observably (counts restart / a re-submitted query
  * re-emits instead of merging silently). Without TTL the same sequence
  * accumulates (the control).
  *
  * Harness discipline: a TTL'd query runs in processing-time mode, where
  * the engine keeps running (empty) micro-batches to advance the TTL clock
  * — `processAllAvailable` never settles there, so the TTL runs use a
  * throttled trigger and POLL the memory sink; the no-TTL controls keep
  * the ordinary processAllAvailable path.
  */
class StateTtlSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("state-ttl-spec")
    .getOrCreate()

  private val ttl = java.time.Duration.ofMillis(500)

  private def awaitOrFail(what: String,
      q: org.apache.spark.sql.streaming.StreamingQuery = null)(
      pred: => Boolean): Unit = {
    val t0 = System.currentTimeMillis()
    while (!pred) {
      Option(q).flatMap(x => Option(x.exception.orNull)).foreach { e =>
        fail(s"query died waiting for $what: ${e.getMessage}", e)
      }
      assert(System.currentTimeMillis() - t0 < 60000, s"timeout waiting: $what")
      Thread.sleep(200)
    }
  }

  test("StreamExperiment: an experiment idle past its TTL restarts from zero; without TTL it accumulates") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    def rows2(r1: StreamExperiment.UserRecord*): Seq[StreamExperiment.UserRecord] = r1

    val batch1 = rows2(
      StreamExperiment.UserRecord("exp", 0, converted = true),
      StreamExperiment.UserRecord("exp", 1, converted = false),
      StreamExperiment.UserRecord("exp", 0, converted = false))
    val batch2 = rows2(StreamExperiment.UserRecord("exp", 1, converted = true))

    // control: no TTL — state survives the idle gap, counts accumulate
    locally {
      val source = MemoryStream[StreamExperiment.UserRecord]
      val q = StreamExperiment.snapshots(source.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("ttl_exp_ctl").start()
      try {
        source.addData(batch1: _*); q.processAllAvailable()
        Thread.sleep(2000)
        source.addData(batch2: _*); q.processAllAvailable()
        val last = spark.sql(
          "SELECT nA, nB FROM ttl_exp_ctl ORDER BY nA + nB").collect().last
        assert((last.getLong(0), last.getLong(1)) == ((2L, 2L)),
          "control accumulated wrong — test plumbing broken")
      } finally q.stop()
    }

    // TTL: the idle gap evicts the key — the second batch folds from None
    locally {
      val source = MemoryStream[StreamExperiment.UserRecord]
      val q = StreamExperiment.snapshots(source.toDS(), ttl = Some(ttl))
        .writeStream.outputMode("append").format("memory")
        .trigger(Trigger.ProcessingTime("250 milliseconds"))
        .queryName("ttl_exp").start()
      try {
        source.addData(batch1: _*)
        awaitOrFail("first snapshot", q) {
          spark.sql("SELECT * FROM ttl_exp WHERE nA = 2 AND nB = 1").count() == 1
        }
        Thread.sleep(2000) // idle well past the 500 ms TTL
        source.addData(batch2: _*)
        awaitOrFail("post-TTL restart snapshot (nA=0, nB=1)", q) {
          spark.sql("SELECT * FROM ttl_exp WHERE nA = 0 AND nB = 1").count() == 1
        }
        assert(spark.sql("SELECT * FROM ttl_exp WHERE nA = 2 AND nB = 2").count() == 0,
          "TTL'd state survived the idle gap")
      } finally q.stop()
    }
  }

  test("Sessionize: an idle user's open-session extent is evicted; a revived user starts a fresh session") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val gapMs = 10000L
    def ev(ts: Long*) = ts.map(Sessionize.Event(5L, _))

    // control (no TTL): the open extent survives the wall-clock idle gap —
    // the past-gap event CLOSES it (session 0–100, n=2), then the next
    // past-gap event closes the one it opened
    locally {
      val source = MemoryStream[Sessionize.Event]
      val q = Sessionize.sessionize(source.toDS(), gapMs)
        .writeStream.outputMode("append").format("memory")
        .queryName("ttl_sess_ctl").start()
      try {
        source.addData(ev(0L, 100L): _*); q.processAllAvailable()
        Thread.sleep(2000)
        source.addData(ev(1000000L): _*); q.processAllAvailable()
        source.addData(ev(2000000L): _*); q.processAllAvailable()
        val got = spark.sql(
          "SELECT startMs, endMs, nEvents FROM ttl_sess_ctl ORDER BY startMs")
          .as[(Long, Long, Long)].collect().toSeq
        assert(got == Seq((0L, 100L, 2L), (1000000L, 1000000L, 1L)),
          s"control emissions wrong: $got")
      } finally q.stop()
    }

    // TTL: the idle gap evicts the extent — the 0–100 session's close is
    // forfeited (the revived user folds from None, a cold key), so only
    // the post-revival session ever closes
    locally {
      val source = MemoryStream[Sessionize.Event]
      val q = Sessionize.sessionize(source.toDS(), gapMs, ttl = Some(ttl))
        .writeStream.outputMode("append").format("memory")
        .trigger(Trigger.ProcessingTime("250 milliseconds"))
        .queryName("ttl_sess").start()
      try {
        source.addData(ev(0L, 100L): _*)
        // the open extent emits nothing observable, so barrier on the
        // QUERY PROGRESS (processAllAvailable never settles in
        // processing-time mode): the first batch must have folded its two
        // events into live state BEFORE the idle clock starts, or a slow
        // start would merge everything into one batch and the eviction
        // assertion would be vacuous
        awaitOrFail("first sessionize batch ingested", q) {
          q.recentProgress.exists(_.numInputRows >= 2)
        }
        Thread.sleep(2000) // idle well past the 500 ms TTL
        source.addData(ev(1000000L): _*)
        source.addData(ev(2000000L): _*)
        awaitOrFail("post-revival session close", q) {
          spark.sql("SELECT * FROM ttl_sess WHERE startMs = 1000000").count() == 1
        }
        assert(spark.sql("SELECT * FROM ttl_sess WHERE startMs = 0").count() == 0,
          "evicted extent still closed — TTL had no effect")
      } finally q.stop()
    }
  }

  test("StreamAnn: a query's top-k state past its TTL is gone — a re-submission re-emits instead of merging silently") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (cents, index) = graft.operators.Similarity.ivfTrained(
      emb, "vec_id", "embedding", nCentroids = 8, kmeansIters = 1)
    val qv = emb.where(col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].head()
    val batchTop = graft.operators.Similarity
      .ivfTopKIndexed(cents, index, "vec_id", "embedding", 0L, 3, nProbe = 2)
      .as[(Long, Double)].collect().map(_._1).toSeq

    // control (no TTL): the re-submission merges into surviving state and
    // changes nothing — emit-on-change suppresses it; one emission total
    locally {
      val source = MemoryStream[(Long, Seq[Float])]
      val q = StreamAnn.probeTopK(source.toDF().toDF("qid", "qvec"),
          "qid", "qvec", cents, index, "vec_id", "embedding", k = 3, nProbe = 2)
        .writeStream.outputMode("append").format("memory")
        .queryName("ttl_ann_ctl").start()
      try {
        source.addData((7L, qv)); q.processAllAvailable()
        Thread.sleep(2000)
        source.addData((7L, qv)); q.processAllAvailable()
        val ids = spark.sql("SELECT vecId FROM ttl_ann_ctl")
          .collect().map(_.getLong(0)).toSeq
        assert(ids == batchTop,
          s"control: expected exactly one emission, got $ids")
      } finally q.stop()
    }

    // TTL: state evicted in the idle gap — the re-submission folds from
    // None, producing the same top-k again: a SECOND full emission
    locally {
      val source = MemoryStream[(Long, Seq[Float])]
      val q = StreamAnn.probeTopK(source.toDF().toDF("qid", "qvec"),
          "qid", "qvec", cents, index, "vec_id", "embedding", k = 3,
          nProbe = 2, ttl = Some(ttl))
        .writeStream.outputMode("append").format("memory")
        .trigger(Trigger.ProcessingTime("250 milliseconds"))
        .queryName("ttl_ann").start()
      try {
        source.addData((7L, qv))
        awaitOrFail("first emission", q) {
          spark.sql("SELECT * FROM ttl_ann").count() == 3
        }
        Thread.sleep(2000)
        source.addData((7L, qv))
        awaitOrFail("post-TTL re-emission", q) {
          spark.sql("SELECT * FROM ttl_ann").count() == 6
        }
        val ids = spark.sql("SELECT vecId FROM ttl_ann")
          .collect().map(_.getLong(0)).toSeq
        assert(ids == (batchTop ++ batchTop),
          s"re-emission should repeat the batch top-k, got $ids")
      } finally q.stop()
    }
  }
}
