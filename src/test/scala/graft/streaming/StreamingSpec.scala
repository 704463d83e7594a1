package graft.streaming

import java.nio.file.Files
import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine

/** Live-tail semantics: history is replayed, then NEW inserts keep arriving
  * through the same query (reference behavior of `/query`,
  * native.go:369-523 + watchPartitions).
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("streaming-spec")
    .getOrCreate()

  test("tail replays history then picks up new inserts, with redact applied") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-tail").toString
    val engine = new Engine(spark, dir)
    engine.insert((0 until 10).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""))

    val seen = mutable.ArrayBuffer[(Long, String)]()
    var lastLeftOff = -1L
    val q = Streaming.startTail(spark, dir, """keep == true and redact("n")""",
      (rows, leftOff) => { seen.synchronized { seen ++= rows }; lastLeftOff = leftOff })
    try {
      q.processAllAvailable()
      assert(seen.map(_._1).toSet == Set(0L, 2L, 4L, 6L, 8L))
      assert(seen.forall(_._2.contains("\"n\":\"[REDACTED]\"")))

      engine.insert((10 until 16).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""))
      q.processAllAvailable()
      assert(seen.map(_._1).toSet == Set(0L, 2L, 4L, 6L, 8L, 10L, 12L, 14L))
      assert(lastLeftOff == 14L)
    } finally q.stop()
  }

  test("tail drains a large backlog in bounded ordered chunks, never whole") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-tail-chunk").toString
    val engine = new Engine(spark, dir)
    // one big backlog micro-batch: 5000 records, all matching
    engine.insert((0 until 5000).map(i => s"""{"n":$i,"keep":true}"""))

    val chunks = mutable.ArrayBuffer[Seq[(Long, Option[String])]]()
    val q = Streaming.startTailScan(spark, dir, """keep == true""",
      (rows, _) => chunks.synchronized { chunks += rows },
      maxRowsPerChunk = 256)
    try {
      q.processAllAvailable()
      val snap = chunks.synchronized(chunks.toList)
      // the backlog arrived split into many bounded chunks…
      assert(snap.size >= 5000 / 256, s"expected many chunks, got ${snap.size}")
      assert(snap.forall(_.size <= 256), "a chunk exceeded maxRowsPerChunk")
      // …covering every record exactly once, in GLOBAL id order across
      // chunk boundaries (the per-chunk high-water is only a valid resume
      // point if ordering holds end-to-end)
      val ids = snap.flatten.map(_._1)
      assert(ids == ids.sorted && ids.distinct.size == ids.size, "ids out of order or duplicated")
      assert(ids.size == 5000 && ids.head == 0L && ids.last == 4999L)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and carries state across batches") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Sessionize.Event]
    val sessions = Sessionize.sessionize(source.toDS(), gapMs = 1000L)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // batch 1: user 1 has two events 500ms apart (one session, still open)
      source.addData(Sessionize.Event(1L, 1000L), Sessionize.Event(1L, 1500L))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sessions_out").count() == 0) // still open
      // batch 2: a 5s-later event closes the first session and opens another
      source.addData(Sessionize.Event(1L, 6500L))
      q.processAllAvailable()
      val closed = spark.sql("SELECT userId, startMs, endMs, nEvents FROM sessions_out")
        .as[(Long, Long, Long, Long)].collect()
      assert(closed.toSeq == Seq((1L, 1000L, 1500L, 2L)))
    } finally q.stop()
  }

  test("streaming ingest drains a memory stream through the insertion filter") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ingest").toString
    val engine = new Engine(spark, dir)
    engine.setInsertionFilter("""keep == true""")

    implicit val sctx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Streaming.startIngest(source.toDS(), engine)
    try {
      source.addData((0 until 10).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""): _*)
      q.processAllAvailable()
      assert(engine.totalRecords == 5)
      source.addData("""{"n":100,"keep":true}""", """{"n":101,"keep":false}""")
      q.processAllAvailable()
      assert(engine.totalRecords == 6)
    } finally q.stop()
  }

  test("driver-path ingest (ingestShards = 1) keeps identical semantics") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ingest-driver").toString
    val engine = new Engine(spark, dir)
    engine.setInsertionFilter("""keep == true""")

    implicit val sctx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Streaming.startIngest(source.toDS(), engine, ingestShards = 1)
    try {
      source.addData((0 until 10).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""): _*)
      q.processAllAvailable()
      assert(engine.totalRecords == 5)
      val rows = engine.records().orderBy("id").collect()
      assert(rows.map(_.getLong(0)).toSeq == (0L until 5L))
    } finally q.stop()
  }

  test("streaming EWMA folds gap days as zeros and seeds at the first closed day") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val day = 86400000L
    // key "a": day0×2, day1 empty (gap), day2×2, day3×20 (spike), sentinel.
    // fold: seed 2, gap → .7·2=1.4, day2 → .3·2+.7·1.4=1.58; day3 resid
    // 20−1.58=18.42 — same numbers as the batch hand spec
    val evs =
      Seq.fill(2)(StreamEwma.Event("a", 0L)) ++
      Seq.fill(2)(StreamEwma.Event("a", 2 * day)) ++
      Seq.fill(20)(StreamEwma.Event("a", 3 * day)) :+
      StreamEwma.Event("a", 5 * day)
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamEwma.Event]
    val q = StreamEwma.anomalies(source.toDS(), gateMult = 0.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_gap").start()
    try {
      source.addData(evs.toIndexedSeq: _*)
      q.processAllAvailable()
      val out = spark.sql("SELECT dayMs, n, levelPrev, resid FROM ewma_gap")
        .as[(Long, Long, Double, Double)].collect().sorted.toSeq
      // day0 seeds (unjudged), day2 judged against .7·2, day3 the spike
      assert(out == Seq((2 * day, 2L, 1.4, 0.6), (3 * day, 20L, 1.58, 18.42)),
        s"$out")
    } finally q.stop()
  }

  test("streaming dedup keeps first arrivals only, normalized across formatting") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamDedup.firstArrivals(
      source.toDS().toDF("ts", "text"), "text", "ts", "10 minutes")
    val q = deduped
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      source.addData(
        (t(0), "alpha beta gamma"),
        (t(1), "alpha beta gamma"),     // exact dup
        (t(2), "  ALPHA  beta GAMMA "), // formatting-only dup (normalized key)
        (t(3), "something else"))
      q.processAllAvailable()
      // a second micro-batch with one more dup and one new doc
      source.addData((t(4), "alpha beta gamma"), (t(5), "third doc"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").select("text").as[String].collect().toSeq
      assert(out.sorted == Seq("alpha beta gamma", "something else", "third doc"),
        s"got $out")
    } finally q.stop()
  }

  test("stream-stream interval join matches batch, plans symmetric hash join") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // purchases at :10 and :40; clicks land in/out of each trailing 15 min
    val purchases = Seq((100L, 1L, t(10)), (101L, 1L, t(40)), (102L, 2L, t(20)))
    val clicks = Seq(
      (1L, t(0)),  // 10 min before p100: in
      (1L, t(9)),  // in
      (1L, t(11)), // after p100, 29 min before p101: out of both
      (1L, t(30)), // 10 min before p101: in
      (2L, t(1)))  // 19 min before p102: out
    val pSrc = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cSrc = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.intervalJoin(
      pSrc.toDS().toDF("p_id", "p_user", "p_ts"), "p_user", "p_ts",
      cSrc.toDS().toDF("c_user", "c_ts"), "c_user", "c_ts",
      horizonSeconds = 900L)
    val q = joined
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      pSrc.addData(purchases: _*)
      cSrc.addData(clicks: _*)
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .select("p_id", "c_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSeq.sorted
      // the SAME operator call on batch frames is the parity reference
      val want = StreamJoin.intervalJoin(
        purchases.toDF("p_id", "p_user", "p_ts"), "p_user", "p_ts",
        clicks.toDF("c_user", "c_ts"), "c_user", "c_ts", 900L)
        .select("p_id", "c_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSeq.sorted
      assert(got == want, s"stream $got != batch $want")
      assert(got.map(_._1) == Seq(100L, 100L, 101L), got.toString)
      // state-bounded join: the planner must have accepted the watermark +
      // time-range predicate as a symmetric hash join with state eviction
      val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(plan.contains("StreamingSymmetricHashJoin"),
        s"interval join not planned as bounded-state stream join:\n$plan")
    } finally q.stop()
  }

  test("sharded streaming ingest: executor-side pipeline, same records and ids") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ingest-sharded").toString
    val engine = new Engine(spark, dir)
    engine.setInsertionFilter("""keep == true""")

    implicit val sctx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Streaming.startIngest(source.toDS(), engine, ingestShards = 4)
    try {
      source.addData((0 until 200).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""): _*)
      q.processAllAvailable()
      assert(engine.totalRecords == 100)
      // contiguous global ids, injected 24-digit form, filter applied
      val rows = engine.records().orderBy("id").collect()
      assert(rows.map(_.getLong(0)).toSeq == (0L until 100L))
      assert(rows.forall(r => r.getString(2).contains(
        "\"id\":\"" + Engine.indexToId(r.getLong(0)) + "\"")))
      assert(rows.forall(_.getString(2).contains("\"keep\":true")))
      source.addData("""{"n":900,"keep":true}""")
      q.processAllAvailable()
      assert(engine.totalRecords == 101)
    } finally q.stop()
  }

  test("streaming CMS: constant d·w state, final counters equal the batch sketch") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val (depth, width) = (4, 64)
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val counters = StreamSketch.cmsCounters(
      source.toDS().toDF("text"), "text", n = 2, depth = depth, width = width)
    val q = counters
      .writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    val b1 = Seq("hot pair hot pair hot pair", "cold one here", "another doc text")
    val b2 = Seq("hot pair again", "late arrival doc", "cold one here")
    try {
      source.addData(b1: _*)
      q.processAllAvailable()
      source.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("cms_out").as[(Int, Long, Long)].collect().toSeq.sorted
      // parity: the SAME definition over the full history as a batch frame
      val want = StreamSketch.cmsCounters(
        (b1 ++ b2).toDF("text"), "text", n = 2, depth = depth, width = width)
        .as[(Int, Long, Long)].collect().toSeq.sorted
      assert(got == want, s"stream counters != batch sketch of history")
      assert(got.nonEmpty && got.map(_._3).sum ==
        (b1 ++ b2).map(_.split("\\s+").length - 1).sum * depth)
      // the selling point: state is the matrix itself, bounded by d·w
      // regardless of stream length or vocabulary growth
      val rows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(rows <= depth.toLong * width,
        s"state $rows exceeds the d*w=${depth * width} bound")
    } finally q.stop()
  }
}
