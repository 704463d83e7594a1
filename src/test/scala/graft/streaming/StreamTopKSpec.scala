package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Space-Saving guarantee vs a batch groupBy-count over the SAME rows,
  * across arbitrary micro-batch splits: no true heavy hitter missing,
  * every estimate over-approximates within its recorded error, state
  * never exceeds k counters per group.
  */
class StreamTopKSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-topk-spec")
    .getOrCreate()

  private val K = 8

  test("final summaries satisfy the Space-Saving guarantee against batch truth") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    // real fixture stream: per event_type (group), the user_id domain is
    // ~200 wide at sf0.001 — far above K, so eviction churn is exercised
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .orderBy("event_id")
      .select(col("event_type"), col("user_id").cast("string"))
      .as[(String, String)].collect().toSeq

    val source = MemoryStream[StreamTopK.Obs]
    val q = StreamTopK.snapshots(source.toDS(), K)
      .writeStream.outputMode("append")
      .format("memory").queryName("tk_snapshots").start()
    try {
      val (a, rest) = ev.splitAt(ev.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { chunk =>
        source.addData(chunk.map { case (g, i) => StreamTopK.Obs(g, i) }: _*)
        q.processAllAvailable()
      }
      val finals = spark.sql(
        """SELECT group, n, item, est, err FROM (
             SELECT *, max(n) OVER (PARTITION BY group) mx FROM tk_snapshots)
           WHERE n = mx""")
        .as[(String, Long, String, Long, Long)].collect()
        .groupBy(_._1)

      val truth = ev.groupBy(identity).map { case ((g, i), rows) => (g, i) -> rows.size.toLong }
      val groupN = ev.groupBy(_._1).map { case (g, rows) => g -> rows.size.toLong }

      assert(finals.keySet == groupN.keySet)
      finals.foreach { case (g, rows) =>
        val n = groupN(g)
        assert(rows.head._2 == n, s"group $g: stream n ${rows.head._2} != $n")
        assert(rows.length <= K, s"group $g: ${rows.length} counters > k=$K")
        val summary = rows.map(r => r._3 -> ((r._4, r._5))).toMap
        // (1) no false negatives above the n/k threshold
        truth.filter { case ((tg, _), cnt) => tg == g && cnt > n / K }.foreach {
          case ((_, item), cnt) =>
            assert(summary.contains(item),
              s"group $g: true heavy hitter $item (count $cnt > ${n / K}) missing")
        }
        summary.foreach { case (item, (est, err)) =>
          val cnt = truth.getOrElse((g, item), 0L)
          // (2) over-approximation and (3) bounded error
          assert(est >= cnt, s"group $g/$item: est $est < true $cnt")
          assert(est - err <= cnt, s"group $g/$item: est-err ${est - err} > true $cnt")
          assert(err <= n / K + 1, s"group $g/$item: err $err above n/k bound")
        }
      }
    } finally q.stop()
  }

  test("guarantee is split-invariant: one-batch run gives the same summary as three") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val items = (1 to 500).map(i => StreamTopK.Obs("g", s"u${i % 37}"))

    def run(chunks: Seq[Seq[StreamTopK.Obs]], name: String) = {
      val src = MemoryStream[StreamTopK.Obs]
      val q = StreamTopK.snapshots(src.toDS(), 5)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        chunks.foreach { ch => src.addData(ch: _*); q.processAllAvailable() }
        spark.sql(s"SELECT item, est, err FROM $name WHERE n = 500")
          .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      } finally q.stop()
    }
    // the per-step fold is deterministic in arrival order, and arrival
    // order is identical whether delivered as 1 or 3 micro-batches —
    // summaries must be bit-equal (split-invariance of the fold)
    val one = run(Seq(items), "tk_one")
    val three = run(Seq(items.take(100), items.slice(100, 400), items.drop(400)), "tk_three")
    assert(one == three)
    assert(one.nonEmpty && one.size <= 5)
  }
}
