package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The lambda-architecture handoff for the three round-9
  * `transformWithState` migrations (Sessionize, StreamFunnel,
  * StreamNearDup): state recomputed OFFLINE from the history half of the
  * fixture ([[Sessionize.batchState]] & co., the same shared fold the
  * stream runs), then only the tail is streamed — emissions must equal the
  * tail emissions of a full-history streamed run EXACTLY. Because the fold
  * is shared code and the state after the head is identical by
  * construction, any mismatch means the initial-state wiring (not the
  * semantics) broke.
  */
class StreamBootstrapParitySpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-bootstrap-parity")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  /** Multiset difference full \ head, as a sorted seq. */
  private def tailOnly[T: Ordering](full: Seq[T], head: Seq[T]): Seq[T] = {
    val headCounts = scala.collection.mutable.Map.empty[T, Int]
    head.foreach(t => headCounts.update(t, headCounts.getOrElse(t, 0) + 1))
    full.filter { t =>
      val c = headCounts.getOrElse(t, 0)
      if (c > 0) { headCounts.update(t, c - 1); false } else true
    }.sorted
  }

  test("sessionize: batch-built state + streamed tail equals full-history tail emissions") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val gapMs = 7200000L
    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .orderBy("ts_ms")
      .as[(Long, Long)].collect()
      .map { case (u, t) => Sessionize.Event(u, t) }
    val (head, tail) = events.splitAt(events.length / 2)

    // full-history run, head then tail — record which emissions the tail caused
    val src1 = MemoryStream[Sessionize.Event]
    val q1 = Sessionize.sessionize(src1.toDS(), gapMs)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_full").start()
    val (fullHead, fullAll) =
      try {
        src1.addData(head.toIndexedSeq: _*); q1.processAllAvailable()
        val a = spark.sql("SELECT * FROM sess_full")
          .as[Sessionize.Session].collect().toSeq
        src1.addData(tail.toIndexedSeq: _*); q1.processAllAvailable()
        val b = spark.sql("SELECT * FROM sess_full")
          .as[Sessionize.Session].collect().toSeq
        (a, b)
      } finally q1.stop()

    // bootstrapped run: offline state from the head, stream only the tail
    val init = Sessionize.batchState(spark.createDataset(head.toIndexedSeq), gapMs)
    val src2 = MemoryStream[Sessionize.Event]
    val q2 = Sessionize.sessionizeBootstrapped(src2.toDS(), init, gapMs)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_boot").start()
    val booted =
      try {
        src2.addData(tail.toIndexedSeq: _*); q2.processAllAvailable()
        spark.sql("SELECT * FROM sess_boot").as[Sessionize.Session].collect().toSeq
      } finally q2.stop()

    implicit val ord: Ordering[Sessionize.Session] =
      Ordering.by(s => (s.userId, s.startMs, s.endMs, s.nEvents))
    val expected = tailOnly(fullAll, fullHead)
    assert(expected.nonEmpty, "fixture split produced no tail sessions — split point broken")
    assert(booted.sorted == expected, s"bootstrap tail drifted: ${booted.size} vs ${expected.size}")
  }

  test("funnel: batch-built state + streamed tail equals full-history tail emissions") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val stages = Seq("signup", "view", "click", "purchase")
    val windowMs = 7 * 86400000L
    val events = graft.Tables.events(spark, dir)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .orderBy("ts_ms")
      .as[(Long, Long, String)].collect()
      .map { case (u, t, e) => StreamFunnel.Event(u, t, e) }
    val (head, tail) = events.splitAt(events.length / 2)

    val src1 = MemoryStream[StreamFunnel.Event]
    val q1 = StreamFunnel.funnel(src1.toDS(), stages, windowMs)
      .writeStream.outputMode("append").format("memory")
      .queryName("fun_full").start()
    val (fullHead, fullAll) =
      try {
        src1.addData(head.toIndexedSeq: _*); q1.processAllAvailable()
        val a = spark.sql("SELECT * FROM fun_full")
          .as[StreamFunnel.Advance].collect().toSeq
        src1.addData(tail.toIndexedSeq: _*); q1.processAllAvailable()
        val b = spark.sql("SELECT * FROM fun_full")
          .as[StreamFunnel.Advance].collect().toSeq
        (a, b)
      } finally q1.stop()

    val init = StreamFunnel.batchState(
      spark.createDataset(head.toIndexedSeq), stages, windowMs)
    val src2 = MemoryStream[StreamFunnel.Event]
    val q2 = StreamFunnel.funnelBootstrapped(src2.toDS(), init, stages, windowMs)
      .writeStream.outputMode("append").format("memory")
      .queryName("fun_boot").start()
    val booted =
      try {
        src2.addData(tail.toIndexedSeq: _*); q2.processAllAvailable()
        spark.sql("SELECT * FROM fun_boot").as[StreamFunnel.Advance].collect().toSeq
      } finally q2.stop()

    implicit val ord: Ordering[StreamFunnel.Advance] =
      Ordering.by(a => (a.userId, a.stageIdx, a.tsMs))
    val expected = tailOnly(fullAll, fullHead)
    assert(expected.nonEmpty, "fixture split produced no tail advances — split point broken")
    assert(booted.sorted == expected, s"bootstrap tail drifted: ${booted.size} vs ${expected.size}")
  }

  test("near-dup: batch-built bucket state + streamed tail equals full-history tail votes") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val (k, r, theta) = (8, 2, 0.5)
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String)].collect()
    val (head, tail) = docs.splitAt(docs.length / 2)

    def bandsOf(rows: Seq[(Long, String)]) = StreamNearDup.bandRows(
      spark.createDataset(rows.toIndexedSeq).toDF("doc_id", "text"),
      "doc_id", "text", k, r)

    val src1 = MemoryStream[(Long, String)]
    val q1 = StreamNearDup.bandVotes(
        StreamNearDup.bandRows(src1.toDF().toDF("doc_id", "text"), "doc_id", "text", k, r),
        theta)
      .writeStream.outputMode("append").format("memory")
      .queryName("nd_full").start()
    val (fullHead, fullAll) =
      try {
        src1.addData(head.toIndexedSeq: _*); q1.processAllAvailable()
        val a = spark.sql("SELECT * FROM nd_full")
          .as[StreamNearDup.BandVote].collect().toSeq
        src1.addData(tail.toIndexedSeq: _*); q1.processAllAvailable()
        val b = spark.sql("SELECT * FROM nd_full")
          .as[StreamNearDup.BandVote].collect().toSeq
        (a, b)
      } finally q1.stop()

    val init = StreamNearDup.batchState(bandsOf(head.toSeq), theta)
    val src2 = MemoryStream[(Long, String)]
    val q2 = StreamNearDup.bandVotesBootstrapped(
        StreamNearDup.bandRows(src2.toDF().toDF("doc_id", "text"), "doc_id", "text", k, r),
        init, theta)
      .writeStream.outputMode("append").format("memory")
      .queryName("nd_boot").start()
    val booted =
      try {
        src2.addData(tail.toIndexedSeq: _*); q2.processAllAvailable()
        spark.sql("SELECT * FROM nd_boot").as[StreamNearDup.BandVote].collect().toSeq
      } finally q2.stop()

    implicit val ord: Ordering[StreamNearDup.BandVote] =
      Ordering.by(v => (v.docId, v.bandIdx, v.dupOf, v.est))
    val expected = tailOnly(fullAll, fullHead)
    // the fixture corpus has near-dups across the split by construction
    // (StreamNearDupSpec's batch mirror finds cross-corpus pairs); if this
    // guard ever fires the split point stopped exercising the bootstrap
    assert(booted.sorted == expected,
      s"bootstrap tail drifted: ${booted.size} vs ${expected.size} votes")
  }
}
