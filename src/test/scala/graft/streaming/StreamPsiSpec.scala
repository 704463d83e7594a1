package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online PSI windows == the batch twin across micro-batch splits; a
  * planted shape change (not a mean change) alarms.
  */
class StreamPsiSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-psi-spec")
    .getOrCreate()

  test("stream windows equal the batch twin across micro-batch splits") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("key"), unix_millis(col("ts")).as("tsMs"),
        col("event_id").as("id"), col("value"))
      .as[StreamPsi.Obs].collect().toSeq.sortBy(o => (o.key, o.tsMs, o.id))
    val source = MemoryStream[StreamPsi.Obs]
    val q = StreamPsi.windows(source.toDS(), refCount = 40, windowCount = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("psi_windows").start()
    try {
      val (a, rest) = ev.splitAt(ev.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { ch => source.addData(ch: _*); q.processAllAvailable() }
      val got = spark.sql("SELECT key, windowIdx, n, psi, drifted FROM psi_windows")
        .as[StreamPsi.WindowPsi].collect().toSeq.sortBy(w => (w.key, w.windowIdx))
      val batch = StreamPsi.batchWindows(
          graft.Tables.events(spark, "/root/testdata/sf0.001"),
          "event_type", "ts", "event_id", "value", refCount = 40, windowCount = 30)
        .collect().toSeq.sortBy(w => (w.key, w.windowIdx))
      assert(got.nonEmpty && got == batch)
    } finally q.stop()
  }

  test("variance collapse (same mean) alarms; stationary stream stays quiet") {
    import spark.implicits._
    // reference + early windows: values spread over decades around ~1000;
    // later: everything pinned at exactly 1000 — the mean barely moves but
    // the histogram collapses to one bucket
    val obs = (0 until 400).map { i =>
      val v = if (i < 200) math.pow(2.0, (i % 9) + 6) // 64..16384, mean ~2000
              else 1000.0
      StreamPsi.Obs("k", i.toLong, i.toLong, v)
    }
    val out = StreamPsi.batchWindows(
      obs.toDF("key", "tsMs", "id", "value")
        .select(col("key"), timestamp_millis(col("tsMs")).as("ts"),
          col("id"), col("value")),
      "key", "ts", "id", "value", refCount = 100, windowCount = 50)
      .collect().sortBy(_.windowIdx)
    assert(out.length == 6)
    assert(!out.head.drifted, s"stationary window must stay quiet: ${out.head}")
    assert(out.last.drifted && out.last.psi > 1.0,
      s"collapsed-shape window must alarm hard: ${out.last}")
  }
}
