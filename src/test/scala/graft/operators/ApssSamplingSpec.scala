package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 session-4 operators: prefix-filtered APSS, ES weighted sampling,
  * shard manifests, path trigrams.
  */
class ApssSamplingSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("apss-sampling-spec")
    .getOrCreate()
  private lazy val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- APSS

  test("apss: prefix-filtered equals brute on the real fixture corpus") {
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sf)
    val filtered = Apss.tfidfPairs(docs, "doc_id", "text", 0.8)
      .orderBy("id_a", "id_b").collect().toSeq
    val brute = Apss.tfidfPairsBrute(docs, "doc_id", "text", 0.8)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(filtered.nonEmpty, "fixture should contain shingle near-dups")
    assert(filtered == brute)
  }

  test("apss: planted near-identical pair found, unrelated docs excluded") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),                         // near-identical
      (3L, "completely different words about spark catalyst optimizer plans"),
      (4L, "yet another unrelated document mentioning parquet and shuffles")
    ).toDF("doc_id", "text")
    val out = Apss.tfidfPairs(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("apss: candidate generation prunes to the true pair structure") {
    // the prefix join on the fixture produces candidates ≈ matches, not
    // all-pairs: re-derive the candidate count bound through the public
    // result (docs in NO near-dup pair never reach verification with
    // anything — checked indirectly: a corpus of pairwise-unrelated docs
    // yields zero rows, so zero verify work)
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, s"unique$i words body$i with token$i tail$i mark$i end$i"))
      .toDF("doc_id", "text")
    assert(Apss.tfidfPairs(docs, "doc_id", "text", 0.5).count() == 0L)
  }

  // ---------------------------------------- Efraimidis–Spirakis sampling

  test("weighted sample: exact k, deterministic, weight-monotone in bulk") {
    val docs = graft.Tables.documents(spark, sf)
    val s1 = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(docs, "doc_id", col("n_chars"), 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.size == 50 && s1 == s2)
    // inclusion odds ∝ weight: the sampled mean n_chars must exceed the
    // corpus mean (a coarse but deterministic check — the sample is fixed)
    val sampledMean = docs.where(col("doc_id").isin(s1.toSeq: _*))
      .agg(avg("n_chars")).head().getDouble(0)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean should exceed corpus mean $corpusMean")
  }

  test("cluster-balanced sample: weights invert cluster size, singletons weigh 1") {
    import spark.implicits._
    val docs = (1L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // docs 1-3 form one near-dup cluster; 4-6 are singletons
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster_id")
    val out = Sampling.clusterBalancedSample(docs, "doc_id", clusters,
        "id", "cluster_id", k = 6)
      .select("doc_id", "cluster_size", "weight")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == (1L to 6L), s"k >= corpus keeps everything: $out")
    assert(out.filter(_._1 <= 3).forall(r => r._2 == 3L && r._3 == 0.333333))
    assert(out.filter(_._1 > 3).forall(r => r._2 == 1L && r._3 == 1.0))
    // expected draws per cluster equalize: with k=2 the clustered trio can
    // place at most 2 but its TOTAL weight equals one singleton's
    val k2 = Sampling.clusterBalancedSample(docs, "doc_id", clusters,
      "id", "cluster_id", k = 2).select("doc_id").as[Long].collect().toSet
    assert(k2.size == 2)
  }

  test("weighted sample: zero/negative weights never selected") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 0L), (3L, -5L), (4L, 10L), (5L, 10L))
      .toDF("doc_id", "w")
    val out = Sampling.weightedSample(df, "doc_id", col("w"), 5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 4L, 5L))
  }

  // ------------------------------------------------------ shard manifest

  test("shard manifest: counts/totals/fingerprint match a recomputation") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val tok = TextAnalysis.tokenCount(col("text"))
    val assign = Sharding.packShards(docs, "doc_id", tok, budget = 10000)
    val withTok = assign.join(
      docs.select(col("doc_id"), tok.as("tok")), "doc_id")
    val m = Sharding.shardManifest(withTok, "doc_id", col("tok"))
      .orderBy("shard").collect()
    val byShard = withTok.as[(Long, Long, Long)].collect()
      .groupBy(_._2).toSeq.sortBy(_._1)
    assert(m.length == byShard.length)
    m.zip(byShard).foreach { case (row, (shard, members)) =>
      assert(row.getLong(0) == shard)
      assert(row.getLong(1) == members.length.toLong)
      assert(row.getLong(2) == members.map(_._3).sum)
      val expFp = java.security.MessageDigest.getInstance("MD5")
        .digest(members.map(_._1.toString).sorted.mkString(",")
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(row.getString(5) == expFp)
    }
  }

  // ------------------------------------------------------- simhash pairs

  test("simhash pairs: block pigeonhole equals brute hamming on fixtures") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val filtered = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    // brute: every pair's popcount over the same signatures
    val sigs = docs.select(col("doc_id"),
        Dedup.simhashMd5Hex(col("text")).as("s"))
      .as[(Long, String)].collect()
      .map { case (id, s) => (id, java.lang.Long.parseUnsignedLong(s, 16)) }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h.toLong)).sortBy(p => (p._1, p._2)).toSeq
    assert(filtered.nonEmpty && filtered == brute)
  }

  // ------------------------------------------------------- path trigrams

  test("path trigrams: hand-computed journeys, ts+id ordering, top-k ties") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a->b->c->d  => abc, bcd
      (1L, 1L, 1L, "a"), (2L, 2L, 1L, "b"), (3L, 3L, 1L, "c"), (4L, 4L, 1L, "d"),
      // user 2: a->b->c     => abc
      (5L, 1L, 2L, "a"), (6L, 2L, 2L, "b"), (7L, 3L, 2L, "c"),
      // user 3: only two events — no trigram
      (8L, 1L, 3L, "a"), (9L, 2L, 3L, "b"),
      // user 4: ts tie broken by event_id: (10,t1,'x') before (11,t1,'y')
      (10L, 1L, 4L, "x"), (11L, 1L, 4L, "y"), (12L, 2L, 4L, "z")
    ).toDF("event_id", "t", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("t")))
    val out = EventSeq.pathTrigrams(ev, "user_id", "ts", "event_type",
        "event_id", topN = 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(out == Seq(("a", "b", "c", 2L), ("b", "c", "d", 1L),
      ("x", "y", "z", 1L)))
  }
}
