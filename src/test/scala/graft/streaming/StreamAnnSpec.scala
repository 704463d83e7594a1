package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN serving ([[StreamAnn.probeTopK]]) against the prebuilt IVF
  * index must return, per streamed query, EXACTLY the batch probe's top-k
  * ([[graft.operators.Similarity.ivfTopKIndexed]] at the same k/nProbe):
  * same candidates (probed clusters), same round-4 cosine, same
  * (sim DESC, id ASC) tie-break.
  */
class StreamAnnSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-ann-spec")
    .getOrCreate()

  test("streamed probe top-k equals the batch probe for every panel query, across micro-batches") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val (k, nProbe) = (10, 4)

    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (cents, index) = graft.operators.Similarity.ivfTrained(
      emb, "vec_id", "embedding", nCentroids = 8, kmeansIters = 1)

    // a 6-query panel streamed as three micro-batches of two
    val panel = Seq(0L, 17L, 101L, 250L, 333L, 499L)
    val queryVecs = emb.where(col("vec_id").isin(panel: _*))
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap

    val source = MemoryStream[(Long, Seq[Float])]
    val hits = StreamAnn.probeTopK(
      source.toDF().toDF("qid", "qvec"), "qid", "qvec",
      cents, index, "vec_id", "embedding", k, nProbe)
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("ann_hits").start()
    try {
      panel.grouped(2).foreach { chunk =>
        source.addData(chunk.map(qid => (qid, queryVecs(qid))): _*)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT qid, rank, vecId, sim FROM ann_hits")
        .as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(h => (h._3, h._4)).toSeq).toMap

      panel.foreach { qid =>
        val batch = graft.operators.Similarity
          .ivfTopKIndexed(cents, index, "vec_id", "embedding", qid, k, nProbe)
          .as[(Long, Double)].collect().toSeq
        assert(streamed(qid) == batch,
          s"qid=$qid stream=${streamed(qid).take(3)}... batch=${batch.take(3)}...")
      }
    } finally q.stop()
  }

  test("streamed probe against the AUTO-scaled index equals its batch probe at the share-law probe count") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (cents, index) = graft.operators.Similarity.ivfTrainedAuto(
      emb, "vec_id", "embedding", kmeansIters = 1, sampleBudget = 200)
    val nProbe = graft.operators.Similarity.autoProbeCount(cents.length)
    val (k, qid) = (10, 42L)
    val qv = emb.where(col("vec_id") === qid)
      .select("embedding").as[Seq[Float]].head()

    val source = MemoryStream[(Long, Seq[Float])]
    val q = StreamAnn.probeTopK(
        source.toDF().toDF("qid", "qvec"), "qid", "qvec",
        cents, index, "vec_id", "embedding", k, nProbe)
      .writeStream.outputMode("append")
      .format("memory").queryName("ann_auto_hits").start()
    try {
      source.addData((qid, qv)); q.processAllAvailable()
      val streamed = spark.sql("SELECT vecId, sim FROM ann_auto_hits ORDER BY rank")
        .as[(Long, Double)].collect().toSeq
      val batch = graft.operators.Similarity
        .ivfTopKIndexed(cents, index, "vec_id", "embedding", qid, k, nProbe)
        .as[(Long, Double)].collect().toSeq
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }
}
