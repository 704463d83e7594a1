package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState KMV monitor: the final streamed estimate per key must
  * equal the batch sketch exactly (same hash, same order statistics, same
  * estimator arithmetic) after any number of micro-batches.
  */
class StreamKmvSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-kmv-spec")
    .getOrCreate()

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("streamed KMV estimates reconcile exactly with the batch sketch") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val k = 16

    // fixture (source, token) pairs, time-ordered by doc id
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
      try StreamKmv.estimates(source.toDS(), k)
        .writeStream.outputMode("append")
        .format("memory").queryName("kmv_estimates").start()
      finally prev.fold(spark.conf.unset(confKey))(spark.conf.set(confKey, _))
    try {
      pairs.grouped((pairs.length + 2) / 3).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      // final estimate per key = the row with the largest n_seen
      val streamed = spark.sql(
        """SELECT key, est_distinct FROM (
             SELECT key, est_distinct,
               row_number() OVER (PARTITION BY key ORDER BY n_seen DESC) AS rn
             FROM kmv_estimates) WHERE rn = 1""")
        .as[(String, Double)].collect().toMap

      val batch = graft.operators.Sketch
        .kmvDistinctTokens(docs, "source", "text", k)
        .as[(String, Double)].collect().toMap

      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (key, est) =>
        assert(streamed(key) == est, s"key=$key stream=${streamed(key)} batch=$est")
      }
      // estimates are in a sane range of the truth on this corpus
      val exact = docs
        .select(col("source"), explode(graft.operators.TextAnalysis.tokens(lower(col("text")))).as("t"))
        .distinct().groupBy("source").count()
        .as[(String, Long)].collect().toMap
      batch.foreach { case (s, est) =>
        assert(est > exact(s) * 0.3 && est < exact(s) * 3.0,
          s"KMV estimate wildly off for $s: est=$est exact=${exact(s)}")
      }
    } finally q.stop()
  }

  test("bootstrapped state: batch-built sketch + streamed tail equals full-history batch") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val k = 16
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = docs
      .select(col("doc_id"), col("source"),
        explode(graft.operators.TextAnalysis.tokens(lower(col("text")))).as("term"))
      .orderBy("doc_id")
      .select(col("source"), col("term"))
      .as[(String, String)].collect()
    val (head, tail) = pairs.splitAt(pairs.length / 2)

    // offline recompute of the first half → initial state
    val init = StreamKmv.batchState(
      head.toSeq.toDF("source", "term"), "source", "term", k)

    val source = MemoryStream[(String, String)]
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, RocksDb)
    val q =
      try StreamKmv.estimatesBootstrapped(source.toDS(), init, k)
        .writeStream.outputMode("append")
        .format("memory").queryName("kmv_boot").start()
      finally prev.fold(spark.conf.unset(confKey))(spark.conf.set(confKey, _))
    try {
      tail.grouped((tail.length + 1) / 2).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.sql(
        """SELECT key, est_distinct FROM (
             SELECT key, est_distinct,
               row_number() OVER (PARTITION BY key ORDER BY n_seen DESC) AS rn
             FROM kmv_boot) WHERE rn = 1""")
        .as[(String, Double)].collect().toMap
      val batch = graft.operators.Sketch
        .kmvDistinctTokens(docs, "source", "text", k)
        .as[(String, Double)].collect().toMap
      // KMV merge is associative: bootstrap + tail ≡ full history, exactly
      // (every fixture source gets tail data, so each emits post-bootstrap)
      assert(streamed == batch, s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("sub-k keys report exact counts while the sketch is unsaturated") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val source = MemoryStream[(String, String)]
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, RocksDb)
    val q =
      try StreamKmv.estimates(source.toDS(), k = 16)
        .writeStream.outputMode("append")
        .format("memory").queryName("kmv_small").start()
      finally prev.fold(spark.conf.unset(confKey))(spark.conf.set(confKey, _))
    try {
      source.addData(("x", "a"), ("x", "b"), ("x", "a")); q.processAllAvailable()
      source.addData(("x", "c")); q.processAllAvailable()
      val rows = spark.sql("SELECT n_seen, est_distinct FROM kmv_small ORDER BY n_seen")
        .as[(Long, Double)].collect().toSeq
      assert(rows == Seq((3L, 2.0), (4L, 3.0)))
    } finally q.stop()
  }
}
