package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Online experiment dashboard: final snapshot bit-equal to the batch
  * operators (srm_check / bayes_ab / msprt_ab arithmetic) over the same
  * per-user records, split- and order-invariant; interim snapshots are
  * monotone in n.
  */
class StreamExperimentSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-experiment-spec")
    .getOrCreate()

  private def md5Arm(u: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"arm:$u".getBytes("UTF-8"))
    Integer.parseInt(f"${d(0)}%02x", 16) % 2
  }

  test("final snapshot equals batch formulas; split/order invariant") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    // planted winner on the REAL md5 arms, one record per user
    val recs = (1L to 600L).map { u =>
      val arm = md5Arm(u)
      StreamExperiment.UserRecord("exp1", arm,
        if (arm == 0) u % 5 < 3 else u % 5 < 1)
    }
    def run(chunks: Seq[Seq[StreamExperiment.UserRecord]], name: String) = {
      val source = MemoryStream[StreamExperiment.UserRecord]
      val q = StreamExperiment.snapshots(source.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        chunks.foreach { ch => source.addData(ch: _*); q.processAllAvailable() }
        spark.sql(s"SELECT * FROM $name").as[StreamExperiment.Snapshot]
          .collect().toSeq
      } finally q.stop()
    }
    val one = run(Seq(recs), "exp_one")
    val three = run(Seq(recs.take(100), recs.slice(100, 400),
      recs.drop(400)), "exp_three")
    val shuffled = run(Seq(recs.reverse), "exp_rev")
    // final snapshots identical across splits and arrival orders
    assert(one.last == three.last && one.last == shuffled.last)
    // interim snapshots monotone in total n
    val ns = three.map(s => s.nA + s.nB)
    assert(ns == ns.sorted && ns.size == 3)
    // and equal to the pure batch formulas on the full record set
    val counts = StreamExperiment.Counts(
      recs.count(r => r.arm == 0),
      recs.count(r => r.arm == 0 && r.converted),
      recs.count(r => r.arm == 1),
      recs.count(r => r.arm == 1 && r.converted))
    assert(one.last == StreamExperiment.snapshotOf("exp1", counts, 0.01))
    // the planted effect reads as it should on every readout
    assert(one.last.pABeatsB > 0.999)
    assert(one.last.significant)
    assert(!one.last.srmDetected)
  }

  test("dashboard arithmetic matches the batch board operators bit-for-bit") {
    import spark.implicits._
    // same per-user relation the board's srm_check / bayes_ab / msprt_ab
    // read (events at sf0.001), reduced to one record per user
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val pu = ev.groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 1L)
        .as("conv"))
      .collect().map { r =>
        StreamExperiment.UserRecord("e", md5Arm(r.getLong(0)),
          r.getBoolean(1))
      }.toSeq
    val counts = StreamExperiment.Counts(
      pu.count(_.arm == 0), pu.count(r => r.arm == 0 && r.converted),
      pu.count(_.arm == 1), pu.count(r => r.arm == 1 && r.converted))
    val snap = StreamExperiment.snapshotOf("e", counts, 0.01)
    val bayes = graft.operators.EventSeq.bayesAb(ev, "user_id",
      "event_type", "purchase").collect()(0)
    assert(snap.pABeatsB == bayes.getAs[Double]("p_a_beats_b"))
    assert(snap.nA == bayes.getAs[Long]("n_a") &&
      snap.cA == bayes.getAs[Long]("c_a"))
    val srm = graft.operators.EventSeq.srmCheck(ev, "user_id").collect()(0)
    assert(snap.srmChi2 == srm.getAs[Double]("chi2"))
    val ms = graft.operators.EventSeq.msprtAb(ev, "user_id", "event_type",
      "purchase").collect()(0)
    assert(snap.lambda == ms.getAs[Double]("lambda"))
    assert(snap.pAlwaysValid == ms.getAs[Double]("p_always_valid"))
  }
}
