package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ACI stream decisions == the batch twin's fold across micro-batch
  * splits; adaptive coverage tracks the target under a planted shift.
  */
class StreamAciSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-aci-spec")
    .getOrCreate()

  test("stream decisions equal the batch twin across micro-batch splits") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("key"), unix_millis(col("ts")).as("tsMs"),
        col("event_id").as("id"), col("value"))
      .as[StreamAci.Obs].collect().toSeq.sortBy(o => (o.key, o.tsMs, o.id))

    val source = MemoryStream[StreamAci.Obs]
    val q = StreamAci.decisions(source.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("aci_decisions").start()
    try {
      val (a, rest) = ev.splitAt(ev.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { ch => source.addData(ch: _*); q.processAllAvailable() }
      val got = spark.sql("SELECT key, id, value, qhat, covered, alphaT FROM aci_decisions")
        .as[StreamAci.Decision].collect().toSeq.sortBy(d => (d.key, d.id))
      val batch = StreamAci.batchDecisions(
          graft.Tables.events(spark, "/root/testdata/sf0.001"),
          "event_type", "ts", "event_id", "value")
        .collect().toSeq.sortBy(d => (d.key, d.id))
      assert(got.nonEmpty && got == batch)
    } finally q.stop()
  }

  test("adaptive alpha recovers coverage after a planted distribution shift") {
    import spark.implicits._
    // stationary phase then a 10x scale shift: plain split-conformal
    // would miscover the whole second phase; ACI's alpha adapts
    val obs = (0 until 400).map { i =>
      val v = if (i < 200) (i % 10).toDouble else 100.0 + (i % 10) * 10.0
      StreamAci.Obs("k", i.toLong, i.toLong, v)
    }
    val out = StreamAci.batchDecisions(
      obs.toDF("key", "tsMs", "id", "value")
        .select(col("key"), timestamp_millis(col("tsMs")).as("ts"),
          col("id"), col("value")),
      "key", "ts", "id", "value", targetAlpha = 0.1, gamma = 0.05,
      warmup = 20).collect().sortBy(_.id)
    // shift hits at id 200: the first post-shift decisions miss...
    val atShift = out.filter(d => d.id >= 200 && d.id < 205)
    assert(atShift.exists(!_.covered), "shift must initially miscover")
    // ...but the tail of the run is covered again (alpha adapted and the
    // residual histogram absorbed the new scale)
    val tail = out.filter(_.id >= 350)
    val cov = tail.count(_.covered).toDouble / tail.length
    assert(cov >= 0.8, s"late coverage $cov after adaptation")
    // alpha moved in response to the errors
    assert(out.map(_.alphaT).distinct.length > 3)
  }

  test("one batch equals three batches bit-for-bit (split invariance)") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val obs = (0 until 150).map(i =>
      StreamAci.Obs("k", i.toLong, i.toLong, (i % 13).toDouble))
    def run(chunks: Seq[Seq[StreamAci.Obs]], name: String) = {
      val source = MemoryStream[StreamAci.Obs]
      val q = StreamAci.decisions(source.toDS())
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        chunks.foreach { ch => source.addData(ch: _*); q.processAllAvailable() }
        spark.sql(s"SELECT key, id, value, qhat, covered, alphaT FROM $name")
          .as[StreamAci.Decision].collect().toSeq.sortBy(_.id)
      } finally q.stop()
    }
    val one = run(Seq(obs), "aci_one")
    val three = run(Seq(obs.take(50), obs.slice(50, 100), obs.drop(100)), "aci_three")
    assert(one == three && one.nonEmpty)
  }
}
