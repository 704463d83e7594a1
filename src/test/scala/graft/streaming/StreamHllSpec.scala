package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState HLL monitor: streamed registers/estimates must equal
  * the batch sketch bit-for-bit, and must be duplicate-insensitive.
  */
class StreamHllSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-hll-spec")
    .getOrCreate()

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("streamed HLL estimates reconcile exactly with the batch sketch; replay leaves them unchanged") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = docs
      .select(col("doc_id"), col("source"),
        explode(graft.operators.TextAnalysis.tokens(lower(col("text")))).as("term"))
      .orderBy("doc_id")
      .select(col("source"), col("term"))
      .as[(String, String)].collect()

    val source = MemoryStream[(String, String)]
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, RocksDb)
    val q =
      try StreamHll.estimates(source.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName("hll_estimates").start()
      finally prev.fold(spark.conf.unset(confKey))(spark.conf.set(confKey, _))
    try {
      pairs.grouped((pairs.length + 2) / 3).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      def latest(): Map[String, (Long, Double, Seq[Int])] = spark
        .sql("""SELECT key, n_seen, est_hll, regs FROM (
               SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_seen DESC) AS rn
               FROM hll_estimates) WHERE rn = 1""")
        .as[(String, Long, Double, Seq[Int])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val afterHistory = latest()

      val batch = graft.operators.Sketch
        .hllDistinctTokens(docs, "source", "text")
        .select(col("source"), col("est_hll"))
        .as[(String, Double)].collect().toMap

      assert(afterHistory.keySet == batch.keySet)
      batch.foreach { case (key, est) =>
        // the stream emits the raw double; the batch query rounds to 3
        val streamed = afterHistory(key)._2
        assert(math.abs(streamed - est) <= 0.0005,
          s"key=$key stream=$streamed batch=$est")
      }

      // replay the whole history: registers and estimate must not move
      source.addData(pairs.toIndexedSeq: _*)
      q.processAllAvailable()
      val afterReplay = latest()
      afterHistory.foreach { case (key, (n, est, regs)) =>
        val (n2, est2, regs2) = afterReplay(key)
        assert(n2 == n + pairs.count(_._1 == key)) // rows folded, but...
        assert(est2 == est && regs2 == regs,       // ...state is dup-blind
          s"key=$key replay moved the sketch")
      }
    } finally q.stop()
  }
}
