package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-7 session-3 operators: split-conformal intervals, first-occurrence
  * sequence support, nearest as-of join, in-engine ANN recall panel,
  * quantile normalization, mSPRT always-valid A/B, grouping sets.
  */
class SequentialConformalSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("sequential-conformal-spec")
    .getOrCreate()
  private lazy val sf = "/root/testdata/sf0.001"

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // ------------------------------------------------------------ conformal

  test("conformal: constant values give zero radius and full coverage") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, "g", 5.0)).toDF("id", "grp", "v")
    val out = Conformal.intervals(df, "grp", "id", "v").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_eval") == 200L)
    assert(r.getAs[Double]("qhat") == 0.0)
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("conformal: fixture coverage is near nominal and halves partition the group") {
    val ev = graft.Tables.events(spark, sf)
    val sizes = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Conformal.intervals(ev, "event_type", "event_id", "value").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getString(0)
      assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_eval") == sizes(g))
      val cov = r.getAs[Double]("coverage")
      // finite-sample guarantee is >= 0.9 in expectation; fixture halves
      // are a single draw, so assert a loose band around nominal
      assert(cov >= 0.8 && cov <= 1.0, s"$g coverage $cov")
      assert(r.getAs[Double]("qhat") >= 0.0)
    }
  }

  // ------------------------------------------------------------- seq mine

  test("seq support: strict first-occurrence precedence, ties count neither") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", ts(10)), (1L, "b", ts(20)),            // a -> b
      (2L, "b", ts(10)), (2L, "a", ts(20)),            // b -> a
      (3L, "a", ts(30)), (3L, "b", ts(30)),            // tie: neither
      (4L, "a", ts(5)), (4L, "a", ts(50)), (4L, "b", ts(40)) // a -> b (first a wins)
    ).toDF("u", "t", "ts")
    val out = SeqMine.pairSupport(df, "u", "t", "ts")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_seq"), r.getAs[Long]("n_both"))).toMap
    assert(out(("a", "b")) == (2L, 4L))
    assert(out(("b", "a")) == (1L, 4L))
  }

  // --------------------------------------------------------- asof nearest

  test("nearest as-of picks the closer side, ties resolve backward") {
    import spark.implicits._
    val left = Seq((100L, 1L, ts(10))).toDF("event_id", "k", "ts")
    def right(rows: (Long, Long, Long)*) =
      rows.map { case (id, k, t) => (id, k, ts(t)) }.toDF("event_id", "k", "ts")
    def dirOf(r: org.apache.spark.sql.DataFrame) =
      AsOfJoin.leftAsOfNearest(left, r, "k", "ts", Seq("event_id"), "event_id")
        .select("right_event_id", "matched_dir").collect().head
    val closerFwd = dirOf(right((1L, 1L, 8L), (2L, 1L, 11L)))
    assert(closerFwd.getLong(0) == 2L && closerFwd.getString(1) == "fwd")
    val tieBack = dirOf(right((1L, 1L, 8L), (2L, 1L, 12L)))
    assert(tieBack.getLong(0) == 1L && tieBack.getString(1) == "back")
    val onlyBack = dirOf(right((1L, 1L, 2L)))
    assert(onlyBack.getLong(0) == 1L && onlyBack.getString(1) == "back")
    val onlyFwd = dirOf(right((9L, 1L, 30L)))
    assert(onlyFwd.getLong(0) == 9L && onlyFwd.getString(1) == "fwd")
    val none = AsOfJoin.leftAsOfNearest(left, right((7L, 2L, 9L)), "k", "ts",
      Seq("event_id"), "event_id").select("right_event_id", "matched_dir").collect().head
    assert(none.isNullAt(0) && none.isNullAt(1))
  }

  test("nearest as-of equals backward as-of when no forward rows exist") {
    val ev = graft.Tables.events(spark, sf)
    val p = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    // clicks all shifted far into the past => forward matches impossible
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        (col("ts") - expr("INTERVAL 10000 DAYS")).as("ts"))
    val near = AsOfJoin.leftAsOfNearest(p, c, "user_id", "ts", Seq("event_id"), "event_id")
      .select("event_id", "right_event_id").orderBy("event_id").collect().toSeq
    val back = AsOfJoin.leftAsOf(p, c, "user_id", "ts", Seq("event_id"), "event_id")
      .select("event_id", "right_event_id").orderBy("event_id").collect().toSeq
    assert(near == back)
  }

  // ----------------------------------------------------------- ann recall

  test("ann recall: probing every centroid recovers recall 1.0 on all queries") {
    val emb = graft.Tables.embeddings(spark, sf)
    val (cents, index) = Similarity.ivfTrained(emb, "vec_id", "embedding",
      nCentroids = 8, kmeansIters = 1)
    val full = Similarity.annRecallPanel(cents, index, "vec_id", "embedding",
      queryMod = 50, k = 10, nProbe = 8).collect()
    assert(full.nonEmpty)
    full.foreach(r => assert(r.getAs[Double]("recall") == 1.0,
      s"qid ${r.getLong(0)} recall ${r.getAs[Double]("recall")}"))
    // partial probing can only lose candidates
    val part = Similarity.annRecallPanel(cents, index, "vec_id", "embedding",
      queryMod = 50, k = 10, nProbe = 2).collect()
    part.foreach(r => assert(r.getAs[Double]("recall") <= 1.0 &&
      r.getAs[Double]("recall") >= 0.0))
  }

  test("silhouette: tight clusters near 1, boundary 0, misassignment negative") {
    import spark.implicits._
    val cents = Array((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    // cluster 0 members hug (1,0); cluster 1 hugs (0,1); vec 100 sits on
    // the bisector (s ≈ 0); vec 101 is assigned AGAINST its geometry
    val index = (Seq(
      (1L, Seq(1.0f, 0.0f), 0L), (2L, Seq(0.99f, 0.01f), 0L),
      (3L, Seq(0.0f, 1.0f), 1L), (4L, Seq(0.01f, 0.99f), 1L),
      (100L, Seq(0.7071f, 0.7071f), 0L),
      (101L, Seq(0.0f, 1.0f), 0L)))
      .toDF("vec_id", "embedding", "cluster")
    val out = Similarity.silhouette(cents, index, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n") == 2L)
    assert(out(1L).getAs[Double]("mean_sil") > 0.9)
    assert(out(0L).getAs[Long]("n") == 4L)
    // cluster 0 mix: two tight (≈1), one boundary (≈0), one wrong (−1)
    val tight = Similarity.silhouette(cents,
      index.where(col("vec_id") <= 2), "vec_id", "embedding")
      .collect()(0)
    assert(tight.getAs[Double]("mean_sil") > 0.9)
    val wrong = Similarity.silhouette(cents,
      index.where(col("vec_id") === 101L), "vec_id", "embedding")
      .collect()(0)
    assert(wrong.getAs[Double]("mean_sil") < -0.9)
    val boundary = Similarity.silhouette(cents,
      index.where(col("vec_id") === 100L), "vec_id", "embedding")
      .collect()(0)
    assert(math.abs(boundary.getAs[Double]("mean_sil")) < 0.01)
  }

  test("ivfStability: data-determined blobs score 1, seed artifacts score low") {
    import spark.implicits._
    // two tight, well-separated blobs; ids interleave so seed set A
    // (ids 0,1) and the disjoint seed set B (ids 2,3) BOTH start with one
    // seed per blob → identical partitions → ARI 1
    def blob(ang: Double, i: Int) = {
      val jitter = 0.02 * ((i % 5) - 2)
      Seq((math.cos(ang) + jitter).toFloat, (math.sin(ang) + jitter).toFloat)
    }
    val good = (0 until 40).map { i =>
      val b = i % 2 // even ids in blob 0, odd in blob 1
      (i.toLong, blob(if (b == 0) 0.0 else 1.4, i), b)
    }.toDF("vec_id", "embedding", "blob")
    val r1 = Similarity.ivfStability(good, "vec_id", "embedding",
      nCentroids = 2, kmeansIters = 1).collect()(0)
    assert(r1.getAs[Double]("ari") == 1.0, r1.getAs[Double]("ari"))
    // ids arranged so seed set B (ids 2,3) sits ENTIRELY in blob 0: with
    // RAW seeding (iters=0) its partition splits blob 0 and lumps blob 1
    // — a pure seed artifact, low ARI...
    val bad = (0 until 40).map { i =>
      // ids 0,1: one per blob; ids 2,3: both blob 0
      val b = if (i == 1) 1 else if (i < 4) 0 else i % 2
      (i.toLong, blob(if (b == 0) 0.0 else 1.4, i), b)
    }.toDF("vec_id", "embedding", "blob")
    val r0 = Similarity.ivfStability(bad, "vec_id", "embedding",
      nCentroids = 2, kmeansIters = 0).collect()(0)
    assert(r0.getAs[Double]("ari") < 0.5, s"ari=${r0.getAs[Double]("ari")}")
    // ...and ONE Lloyd iteration repairs it (the mean update walks the
    // redundant centroid across to the unclaimed blob): ARI back to 1 —
    // exactly the sensitivity the operator exists to measure
    val rFix = Similarity.ivfStability(bad, "vec_id", "embedding",
      nCentroids = 2, kmeansIters = 1).collect()(0)
    assert(rFix.getAs[Double]("ari") == 1.0)
  }

  // -------------------------------------------------------- quantile norm

  test("quantile norm: monotone within source, shared profile across sources") {
    val docs = graft.Tables.documents(spark, sf)
    val out = QuantileNorm.normalize(docs, "doc_id", "source", "n_chars")
      .collect()
    val bySrc = out.groupBy(_.getString(1))
    assert(bySrc.size > 1)
    bySrc.values.foreach { rows =>
      val sorted = rows.sortBy(r => (r.getDouble(2), r.getLong(0)))
      val norms = sorted.map(_.getAs[Double]("norm_score"))
      assert(norms.zip(norms.tail).forall { case (a, b) => a <= b },
        "norm_score must be monotone in within-source rank")
    }
    // every source's extremes land on the same pooled profile endpoints
    val maxes = bySrc.values.map(_.map(_.getAs[Double]("norm_score")).max).toSet
    val mins = bySrc.values.map(_.map(_.getAs[Double]("norm_score")).min).toSet
    assert(maxes.size == 1, s"per-source maxima should coincide: $maxes")
    assert(mins.size == 1, s"per-source minima should coincide: $mins")
  }

  // -------------------------------------------------------------- mSPRT

  test("mSPRT lambda/p derive exactly from the ab_conversion counts") {
    val ev = graft.Tables.events(spark, sf)
    val conv = EventSeq.abConversion(ev, "user_id", "event_type", "purchase")
      .collect().head
    val (na, ca, nb, cb) = (conv.getAs[Long]("n_a"), conv.getAs[Long]("c_a"),
      conv.getAs[Long]("n_b"), conv.getAs[Long]("c_b"))
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val theta = pb - pa
    val seSq = math.max(pa * (1 - pa) / na + pb * (1 - pb) / nb, 1e-12)
    val tauSq = 0.01
    val lam = math.sqrt(seSq / (seSq + tauSq)) *
      math.exp(theta * theta * tauSq / (2 * seSq * (seSq + tauSq)))
    val out = EventSeq.msprtAb(ev, "user_id", "event_type", "purchase").collect().head
    assert(out.getAs[Long]("n_a") == na && out.getAs[Long]("n_b") == nb)
    assert(math.abs(out.getAs[Double]("lambda") - lam) < 5e-7)
    assert(out.getAs[Double]("p_always_valid") ==
      math.rint(math.min(1.0 / lam, 1.0) * 1e6) / 1e6)
    assert(out.getAs[Double]("p_always_valid") > 0.0 &&
      out.getAs[Double]("p_always_valid") <= 1.0)
  }

  // ------------------------------------------------------- grouping sets

  test("grouping sets: every granularity tallies the same corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val total = docs.count()
    val out = docs
      .groupingSets(
        Seq(Seq(col("source"), col("lang")), Seq(col("source")),
          Seq(col("lang")), Seq()),
        col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == total)
    val bySrcSum = out.filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(_.getAs[Long]("n")).sum
    val fineSum = out.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(_.getAs[Long]("n")).sum
    assert(bySrcSum == total && fineSum == total)
  }
}
