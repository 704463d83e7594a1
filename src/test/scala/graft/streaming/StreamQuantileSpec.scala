package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Last streaming quantile snapshot per key == the batch hist_quantiles
  * operator over the same rows — bucket arithmetic, ⌈q·n⌉ rank rule and
  * the >0 gate all shared, across arbitrary micro-batch splits.
  */
class StreamQuantileSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-quantile-spec")
    .getOrCreate()

  test("final snapshots equal batch logHistQuantiles on real fixture values") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("key"), col("value"))
      .as[(String, Double)].collect().toSeq

    val source = MemoryStream[StreamQuantile.Obs]
    val q = StreamQuantile.snapshots(source.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("q_snapshots").start()
    try {
      // three arbitrary splits: the histogram fold is order-insensitive
      val (a, rest) = ev.splitAt(ev.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { chunk =>
        source.addData(chunk.map { case (k, v) => StreamQuantile.Obs(k, v) }: _*)
        q.processAllAvailable()
      }
      // latest snapshot per key (max n — snapshots only grow)
      val got = spark.sql(
        """SELECT key, n, p50, p95, p99 FROM (
             SELECT *, row_number() OVER (PARTITION BY key ORDER BY n DESC) rn
             FROM q_snapshots) WHERE rn = 1""")
        .as[(String, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

      val batch = graft.operators.Sketch.logHistQuantiles(
          graft.Tables.events(spark, "/root/testdata/sf0.001"), "event_type", "value")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
        .toMap

      assert(got.keySet == batch.keySet)
      batch.foreach { case (k, exp) =>
        assert(got(k) == exp, s"key $k: stream ${got(k)} != batch $exp")
      }
    } finally q.stop()
  }

  test("bucket arithmetic matches the batch Column expression exactly") {
    import spark.implicits._
    val vals = Seq(0.001, 0.05, 0.099, 0.1, 1.0, 12.345, 99.99, 1234.5, 0.02347)
    val fromCol = vals.toDF("v")
      .select(expr("CAST(CASE WHEN length(CAST(CAST(floor(v * 1000.0) AS BIGINT) AS STRING)) <= 2 " +
        "THEN CAST(CAST(floor(v * 1000.0) AS BIGINT) AS STRING) " +
        "ELSE rpad(substr(CAST(CAST(floor(v * 1000.0) AS BIGINT) AS STRING), 1, 2), " +
        "length(CAST(CAST(floor(v * 1000.0) AS BIGINT) AS STRING)), '0') END AS BIGINT)"))
      .collect().map(_.getLong(0))
    val fromScala = vals.map(StreamQuantile.bucketOf)
    assert(fromCol.toSeq == fromScala)
  }
}
