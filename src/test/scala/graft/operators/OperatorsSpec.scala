package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level verification against brute-force ground truth on sf0.001. */
class OperatorsSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("operators-spec")
    .getOrCreate()
  private def docs = {
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.documents(spark, "/root/testdata/sf0.001")
  }
  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("checkpoint release targets the RDD that actually holds blocks") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.storage.StorageLevel
    val df = spark.range(100).toDF("x").localCheckpoint()
    val rdd = ColumnBridge.checkpointedRdd(df)
    assert(rdd.isDefined, "LogicalRDD leaf not found in checkpointed plan")
    assert(rdd.get.getStorageLevel != StorageLevel.NONE, "checkpoint not persisted")
    // the plain df.rdd wrapper was the OLD (no-op) unpersist target
    assert(df.rdd.getStorageLevel == StorageLevel.NONE)
    rdd.get.unpersist(blocking = true)
    assert(rdd.get.getStorageLevel == StorageLevel.NONE, "blocks not released")
  }

  test("LSH near-dup pairs ⊇ high-jaccard brute-force pairs (recall at 0.9)") {
    import spark.implicits._
    val lsh = Dedup.nearDupPairs(docs, "doc_id", "text", k = 8, rowsPerBand = 2, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // brute force: all pairs with shingle-set jaccard >= 0.9
    val sh = docs.select(col("doc_id"), array_distinct(Dedup.shingles(col("text"))).as("sh"))
      .as[(Long, Seq[String])].collect()
    val brute = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      union = sa.toSet.union(sb.toSet).size
      if union > 0 && inter.toDouble / union >= 0.9
    } yield (ia, ib)).toSet

    assert(brute.nonEmpty, "fixture should contain planted near-dups")
    // 4 bands of 2 rows at j>=0.9: P(miss) = (1-j^2)^4 <= (1-0.81)^4 ≈ 0.13%
    val missed = brute -- lsh
    assert(missed.size <= math.max(1, brute.size / 20),
      s"LSH missed too many: ${missed.size}/${brute.size}")
    // precision: every returned pair really has jaccard >= 0.9 (verified stage)
    assert(lsh.forall { case (a, b) => brute.contains((a, b)) })
  }

  test("one-pass MinHashSigsExpr equals the Column-pipeline signatures") {
    import spark.implicits._
    // the fast expression must stay bit-identical to the HOF pipeline the
    // DuckDB oracle mirrors
    val fast = Dedup.signatureTable(docs, "doc_id", "text", 4)
      .orderBy("doc_id").as[(Long, String, String, String, String)].collect()
    val slow = docs
      .select(col("doc_id") +: Dedup.minhashSigs(Dedup.shingles(col("text")), 4): _*)
      .orderBy("doc_id").as[(Long, String, String, String, String)].collect()
    assert(fast.toSeq == slow.toSeq)
  }

  test("ANN top-k hits overlap brute-force cosine top-k") {
    import spark.implicits._
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    // LSH bucket always contains the query itself; overlap should be real
    assert(ann.contains(0L))
    assert((ann intersect brute).nonEmpty)
  }

  test("one-pass CosineSimExpr equals the HOF cosine bit-for-bit") {
    import spark.implicits._
    val q = emb.where(col("vec_id") === 0L).select(col("embedding").as("qv"))
    val both = emb.crossJoin(q.limit(1))
      .select(
        Similarity.cosine(col("embedding"), col("qv")).as("fast"),
        Similarity.cosineHof(col("embedding"), col("qv")).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, h) => assert(f == h, s"$f != $h") }
  }

  test("one-pass SimHash64Expr equals the Column-pipeline simhash") {
    import spark.implicits._
    val fast = docs.select(col("doc_id"), Dedup.simhash64Fast(col("text")).as("sh"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    val slow = docs.select(col("doc_id"),
        Dedup.simhash64(TextAnalysis.tokens(col("text"))).as("sh"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(fast.toSeq == slow.toSeq)
  }

  test("simhash: identical texts equal, different texts differ") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines")
    ).toDF("id", "text")
    val out = df.select(col("id"), Dedup.simhash64(TextAnalysis.tokens(col("text"))).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("simhash near-dup: hamming distance small for small edits") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val edited = base.replace("token7", "tokenX")
    val df = Seq((1L, base), (2L, edited)).toDF("id", "text")
    val out = df.select(col("id"), Dedup.simhash64(TextAnalysis.tokens(col("text"))).as("sh"))
      .as[(Long, Long)].collect().toMap
    val hamming = java.lang.Long.bitCount(out(1L) ^ out(2L))
    assert(hamming <= 16, s"hamming $hamming too large for a 1-token edit")
  }

  test("capBands: hot boilerplate buckets drop, true twins keep colliding, big cap is identity") {
    import spark.implicits._
    // 200 identical boilerplate docs (every band bucket occupancy 200 —
    // the quadratic hazard: 19,900 candidate pairs from ONE template) plus
    // two planted twin pairs with unique text
    val boiler = (0L until 200L).map(i =>
      (i, "standard footer terms apply all rights reserved contact support team today"))
    val base1 = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val base2 = (1 to 30).map(i => s"beta$i").mkString(" ")
    val docs = (boiler ++ Seq(
      (1000L, base1), (1001L, base1.replace("alpha7", "alphaX")),
      (2000L, base2), (2001L, base2.replace("beta3", "betaY"))))
      .toDF("doc_id", "text")
    val bands = Dedup.lshBands(docs, "doc_id", "text", k = 8, rowsPerBand = 2)
      .localCheckpoint()
    val capped = Dedup.capBands(bands, maxBucket = 8).localCheckpoint()
    // (a) the boilerplate bucket contributes NOTHING downstream
    val pairs = Dedup.nearDupPairsFromBands(capped, docs, "doc_id", "text", 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists { case (a, b) => a < 200 || b < 200 },
      s"boilerplate pairs leaked through the cap: $pairs")
    // (b) the true twins survive — their buckets are cool
    assert(pairs.contains((1000L, 1001L)) && pairs.contains((2000L, 2001L)),
      s"twin recall lost to the cap: $pairs")
    // (c) a cap above every occupancy is the identity
    val all = Dedup.nearDupPairsFromBands(bands, docs, "doc_id", "text", 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bigCap = Dedup.nearDupPairsFromBands(
        Dedup.capBands(bands, maxBucket = 1000).localCheckpoint(),
        docs, "doc_id", "text", 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bigCap == all)
  }

  test("nearDupClusters: labels are cluster minima and respect every edge") {
    import spark.implicits._
    // hand-built graph: {1-2, 2-3} one component, {10-11} another, chain
    // {20-21, 21-22, 22-23} (diameter > 1 forces multiple propagation rounds)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("nearDupClusters: the driver union-find and distributed propagation paths agree") {
    import spark.implicits._
    // long chains + a star + singletons-with-one-edge; run both paths by
    // toggling the local-solve edge budget
    val rnd = new scala.util.Random(7)
    val chain = (0 until 200).map(i => (i.toLong, (i + 1).toLong))
    val star = (500 until 560).map(i => (400L, i.toLong))
    val extra = (0 until 100).map(_ => (rnd.nextInt(300).toLong, (300 + rnd.nextInt(300)).toLong))
    val pairs = (chain ++ star ++ extra).toDF("id_a", "id_b")
    val local = Dedup.nearDupClusters(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.nearDupClusters(pairs, localSolveMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    assert(local(200L) == 0L) // 200-link chain fully collapsed
  }

  test("dedupDecisions: exact tier wins, near tier names the keep-best keeper") {
    import spark.implicits._
    // docs 1 and 2 byte-identical (exact pair, keeper 1); docs 3,4 a
    // near-dup cluster where 4 is LONGER (keep-best keeps 4); doc 5 clean
    val docs = Seq(
      (1L, "same text body"), (2L, "same text body"),
      (3L, "near dup short"), (4L, "near dup short but longer"),
      (5L, "unique")
    ).toDF("doc_id", "text")
    val clusters = Seq((3L, 3L), (4L, 3L)).toDF("id", "cluster_id")
    val scored = docs.select($"doc_id", length($"text").as("n_chars"))
    val out = Dedup.dedupDecisions(docs, "doc_id", "text", clusters,
        scored, "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, "keep", -1L), (2L, "exact_dup", 1L),
      (3L, "near_dup", 4L), (4L, "keep", -1L), (5L, "keep", -1L)), s"$out")
  }

  test("dedupDecisions: a doc both exact- and near-dup reports the exact tier") {
    import spark.implicits._
    val docs = Seq(
      (1L, "twin"), (2L, "twin"), (3L, "twin sibling")).toDF("doc_id", "text")
    // 2 is in a near-dup cluster with 3 AND byte-equal to 1
    val clusters = Seq((2L, 2L), (3L, 2L)).toDF("id", "cluster_id")
    val scored = docs.select($"doc_id", length($"text").as("n_chars"))
    val out = Dedup.dedupDecisions(docs, "doc_id", "text", clusters,
        scored, "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(2L) == "exact_dup", s"$out")
  }

  test("sign-band buckets stay bounded (no quadratic within-bucket blowup)") {
    import spark.implicits._
    // larger fixture for a meaningful population test
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val n = e.count().toDouble
    val pops = Similarity.signBands(e, "vec_id", "embedding", 16, 8)
      .groupBy("band_idx", "band_val").count()
      .as[(Int, Int, Long)].collect()
    val maxShare = pops.map(_._3).max / n
    // 256 buckets per band: uniform share ≈ 0.4%; 5% ⇒ no collapsed buckets,
    // so within-bucket pair counts stay ~(n/256)² per band, not (n/16)²
    assert(maxShare < 0.05, f"max bucket share $maxShare%.3f — bucketing collapsed")
    assert(pops.map(t => (t._1, t._2)).distinct.length > 64, "too few distinct buckets")
  }

  test("banded near-dup pairs: every returned pair verified, candidates pruned") {
    import spark.implicits._
    val out = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect()
    // every returned pair really has cosine >= threshold (verified stage)
    out.foreach { case (_, _, sim) => assert(sim >= 0.3) }
    // and pairs are canonical (a < b), unique
    assert(out.forall { case (a, b, _) => a < b })
    assert(out.map(p => (p._1, p._2)).distinct.length == out.length)
  }

  test("one-pass HyperplaneSigExpr equals the Column-pipeline signature") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val both = e.select(
        Similarity.lshSignature(col("embedding"), 8, 64).as("fast"),
        Similarity.lshSignatureColumns(col("embedding"), 8, 64).as("cols"))
      .as[(Long, Long)].collect()
    both.foreach { case (f, c) => assert(f == c, s"$f != $c") }
    // short/absent coordinates contribute 0.0 in both forms; a NULL vector
    // degenerates to the all-bits-set signature (empty sums, 0.0 >= 0) in
    // BOTH forms — null-propagation would silently diverge from the oracle
    val edge = Seq((1L, Some(Seq(0.5f, -1.0f))), (2L, None))
      .toDF("id", "embedding")
    val s2 = edge.select(
        Similarity.lshSignature(col("embedding"), 8, 64).as("fast"),
        Similarity.lshSignatureColumns(col("embedding"), 8, 64).as("cols"))
      .as[(Long, Long)].collect()
    s2.foreach { case (f, c) => assert(f == c, s"$f != $c") }
    assert(s2(1)._1 == 255L) // 8 bits, all set
    // double-array columns evaluate via the double accessor, same results
    val dbl = Seq((1L, Seq(0.5, -1.0, 2.25))).toDF("id", "embedding")
    val s3 = dbl.select(
        Similarity.lshSignature(col("embedding"), 8, 64).as("fast"),
        Similarity.lshSignatureColumns(col("embedding"), 8, 64).as("cols"))
      .as[(Long, Long)].head()
    assert(s3._1 == s3._2)
    // NaN coordinates: the Column form compares under Spark SQL ordering
    // (NaN is the LARGEST double, so every NaN dot sets its bit); the
    // one-pass expression must agree, not follow IEEE `NaN >= 0` = false
    val nan = Seq((1L, Seq(Double.NaN, 1.0)), (2L, Seq(-5.0, Double.NaN)))
      .toDF("id", "embedding")
    val s4 = nan.select(
        Similarity.lshSignature(col("embedding"), 8, 64).as("fast"),
        Similarity.lshSignatureColumns(col("embedding"), 8, 64).as("cols"))
      .as[(Long, Long)].collect()
    s4.foreach { case (f, c) => assert(f == c, s"NaN divergence: $f != $c") }
    assert(s4.forall(_._1 == 255L)) // every dot is NaN → all 8 bits set
  }

  test("annTopK plan scans the materialized index, not a recomputed signature") {
    val idx = Similarity.signatureIndex(emb, "vec_id", "embedding")
    val plan = Similarity.annTopKIndexed(idx, "vec_id", "embedding", 0L, 10)
      .queryExecution.executedPlan.toString
    // the corpus side must come from the checkpointed index...
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"expected materialized-index scan in plan:\n$plan")
    // ...and no per-row hyperplane recompute: the signature expression would
    // show up as a chain of element_at adds in the projection
    assert(!plan.contains("try_element_at"),
      s"signature recomputed corpus-wide in plan:\n$plan")
  }

  test("IVF top-k: probed search finds the query and overlaps brute force") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val ivf = Similarity.ivfTopK(e, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect()
    val brute = Similarity.cosineTopK(e, "vec_id", "embedding", 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    // the query's own cluster is always probed, so the query itself is found
    assert(ivf.contains(0L))
    assert(ivf.length == 10)
    // 2-of-8 probes: partial recall expected, zero overlap is a bug
    assert(ivf.toSet.intersect(brute).nonEmpty)
    // assignment covers every vector exactly once
    val idx = Similarity.ivfIndex(e, "vec_id", "embedding", 8)
    assert(idx.count() == e.count())
    assert(idx.select("cluster").distinct().count() <= 8)
    // the probe search scans the materialized index, not a recompute
    val plan = Similarity.ivfTopK(e, "vec_id", "embedding", 0L, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"IVF search not index-backed:\n$plan")
  }

  test("multi-probe ANN: bounded candidates, recall@10 >= single-bucket per query") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val idx = Similarity.signatureIndex(e, "vec_id", "embedding", 8, 64)
    val qids = (0L until 500L by 25L).toSeq
    var singleSum = 0.0
    var multiSum = 0.0
    qids.foreach { qid =>
      val brute = Similarity.cosineTopK(e, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
      val single = Similarity.annTopKIndexed(idx, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
      val multi = Similarity.annTopKMultiProbe(idx, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
      val (rs, rm) = (single.intersect(brute).size / 10.0, multi.intersect(brute).size / 10.0)
      // candidate-set monotonicity: the probe set is a superset of the
      // single bucket, and top-k recall is monotone in the candidate set
      assert(rm >= rs, s"qid $qid: multi-probe recall $rm < single $rs")
      singleSum += rs; multiSum += rm
    }
    assert(multiSum > singleSum,
      s"multi-probe panel recall ${multiSum / qids.size} did not improve on ${singleSum / qids.size}")
    // bounded probe cost: 9 of 256 buckets ⇒ a few percent of the corpus
    val qsig = idx.where(col("vec_id") === 0L).select("lsh_sig").as[Long].head()
    val probeSet = (0 until 8).map(b => qsig ^ (1L << b)) :+ qsig
    val cand = idx.where(col("lsh_sig").isin(probeSet: _*)).count()
    assert(cand < e.count() / 8, s"multi-probe candidate set too large: $cand")
  }

  test("k-means IVF centroids: deterministic, and recall beats the first-N seed") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    // determinism: two independent runs converge to identical centroids
    // (DECIMAL-exact means — this is what lets the oracle SQL mirror them)
    val c1 = Similarity.kmeansCentroids(e, "vec_id", "embedding", 8, 2)
    val c2 = Similarity.kmeansCentroids(e, "vec_id", "embedding", 8, 2)
    assert(c1.toSeq == c2.toSeq)
    // aggregate recall@10 over a 20-query panel vs brute force: Lloyd
    // refinement beats the raw first-N seed at the same probe budget
    // (measured 0.57 vs 0.54 here — per-query results vary, the panel
    // aggregate is deterministic: same data, same exact arithmetic)
    val qids = (0L until 500L by 25L).toSeq
    val brute = qids.map { qid =>
      qid -> Similarity.cosineTopK(e, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
    }.toMap
    def recall(kmIters: Int): Double = {
      val scores = qids.map { qid =>
        val ivf = Similarity.ivfTopK(e, "vec_id", "embedding", qid, 10, kmeansIters = kmIters)
          .select("vec_id").as[Long].collect().toSet
        ivf.intersect(brute(qid)).size.toDouble / brute(qid).size
      }
      scores.sum / scores.size
    }
    val seedRecall = recall(0)
    val kmRecall = recall(2)
    assert(kmRecall >= seedRecall,
      s"k-means recall $kmRecall below first-N seed recall $seedRecall")
  }

  test("salting splits hot keys and stays result-identical") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.01")
    // the hottest grouping key's largest (key, salt) sub-group must be a
    // small fraction of the unsalted hot group — that's the whole point
    val hot = ev.groupBy("event_type").count().orderBy(col("count").desc)
      .as[(String, Long)].head()
    val maxSub = ev
      .withColumn("_salt", pmod(hash(col("event_id")), lit(16)))
      .groupBy("event_type", "_salt").count()
      .where(col("event_type") === hot._1)
      .agg(max("count")).as[Long].head()
    assert(maxSub <= hot._2 / 8, s"salting left a hot sub-group: $maxSub of ${hot._2}")
    // and the two-phase result equals the one-phase aggregation exactly
    val salted = Skew.saltedSumCount(ev, "event_type", "value", col("event_id"), 16)
      .select(col("event_type"), round(col("sum_value").cast("double"), 2), col("n"))
      .orderBy("event_type").as[(String, Double, Long)].collect()
    val plain = ev.groupBy("event_type")
      .agg(round(sum(col("value").cast("decimal(18,6)")).cast("double"), 2).as("s"),
        count(lit(1)).as("n"))
      .orderBy("event_type").as[(String, Double, Long)].collect()
    assert(salted.toSeq == plain.toSeq)
    // salted join reproduces the plain join exactly
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val cust = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    val sj = Skew.saltedJoin(orders, cust, "o_custkey", "c_custkey", col("o_orderkey"), 8)
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    val pj = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name").as[(Long, String)].collect().toSet
    assert(sj == pj)
  }

  test("md5 SimHash hex: deterministic, matches an independent computation") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "")).toDF("id", "text")
    val got = df.select(col("id"), Dedup.simhashMd5Hex(col("text")).as("sh"))
      .as[(Long, String)].collect().toMap
    // independent reference: same md5-first-64-bits bit-vote, plain Scala
    def ref(text: String): String = {
      val words = text.trim.split("\\s+", -1)
      val votes = new Array[Int](64)
      for (w <- words) {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(w.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseUnsignedLong(hex, 16)
        for (b <- 0 until 64) if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      }
      val sig = (0 until 64).foldLeft(0L)((acc, b) => if (votes(b) > 0) acc | (1L << b) else acc)
      f"$sig%016x"
    }
    assert(got(1L) == ref("alpha beta gamma"))
    assert(got(2L) == ref(""))
  }

  test("as-of join matches brute force and plans without a range-join explosion") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val c = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.leftAsOf(p, c, "user_id", "ts", Seq("event_id"), "event_id")
      .select(col("event_id"), col("right_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    // brute force: per purchase, max-ts click at-or-before (ties: max id).
    // Compare at MICROsecond precision — the operator orders raw timestamps,
    // and ms-truncated getTime() would build a wrong oracle for sub-ms data
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos % 1000000) / 1000
    val clicks = c.select("event_id", "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2))))
    val purchases = p.select("event_id", "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2))))
    assert(purchases.nonEmpty && clicks.nonEmpty)
    purchases.foreach { case (pid, u, pts) =>
      val cand = clicks.filter(cc => cc._2 == u && cc._3 <= pts)
      val expect =
        if (cand.isEmpty) None
        else Some(cand.maxBy(cc => (cc._3, cc._1))._1)
      assert(out(pid) == expect, s"purchase $pid: got ${out(pid)}, want $expect")
    }
    // some purchases must have a match AND some must not, or the fixture
    // proves nothing
    assert(out.values.exists(_.isDefined) && out.values.exists(_.isEmpty))
    // plan shape: union+window — no cartesian/broadcast-nested-loop, no
    // O(n·m) inequality join
    val plan = AsOfJoin.leftAsOf(p, c, "user_id", "ts", Seq("event_id"), "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of join planned a product join:\n$plan")
    assert(plan.contains("Window"), s"expected window plan:\n$plan")
    // the whole join is ONE keyed shuffle (the documented plan): a second
    // hashpartitioning exchange would mean the tie-break dedup regressed
    // to its own shuffle
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"as-of join should shuffle exactly once:\n$plan")
  }

  test("forward as-of join matches brute force (nearest at-or-after, max-id ties)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val c = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val p = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val out = AsOfJoin.leftAsOfForward(c, p, "user_id", "ts", Seq("event_id"), "event_id")
      .select(col("event_id"), col("right_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos % 1000000) / 1000
    val clicks = c.select("event_id", "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2))))
    val purchases = p.select("event_id", "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2))))
    clicks.foreach { case (cid, u, cts) =>
      val cand = purchases.filter(pp => pp._2 == u && pp._3 >= cts)
      val expect =
        if (cand.isEmpty) None
        // nearest forward; ties at the same ts keep the max id
        else Some(cand.minBy(pp => (pp._3, -pp._1))._1)
      assert(out(cid) == expect, s"click $cid: got ${out(cid)}, want $expect")
    }
    assert(out.values.exists(_.isDefined) && out.values.exists(_.isEmpty))
  }

  test("winnowed fingerprints: shared token runs guarantee a shared fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // k=3, w=4: any shared run of >= w+k-1 = 6 tokens must share a window-min
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three delta epsilon zeta eta theta iota four five six"
    val c = "totally different words with no overlap at all here now"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = df
      .select(col("doc_id"),
        TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).nonEmpty && fps(1L).toSet.size == fps(1L).size) // distinct, sorted
    assert(fps(1L) == fps(1L).sorted)
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "6-token shared run produced no shared fingerprint")
    assert(fps(1L).toSet.intersect(fps(3L).toSet).isEmpty)
    // identical docs fingerprint identically; tiny docs are still defined
    val dup = Seq((1L, a), (2L, a), (3L, "x"), (4L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(dup(1L) == dup(2L))
    assert(dup(3L).nonEmpty && dup(4L).nonEmpty)
    // the one-pass expression equals the Column-HOF reference bit-for-bit
    // over the real corpus (the HOF form is O(n²)-interpreted — reference
    // only; trailing-space/tab/multi-space shapes included via fixtures)
    val both = docs
      .limit(50)
      .select(
        TextAnalysis.winnowFingerprints(col("text")).as("fast"),
        TextAnalysis.winnowFingerprintsColumns(col("text")).as("cols"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (f, c) => assert(f == c) }
    val edge = Seq("  spaced  out  ", "tab\tsep", "one", "").toDF("text")
      .select(
        TextAnalysis.winnowFingerprints(col("text")).as("fast"),
        TextAnalysis.winnowFingerprintsColumns(col("text")).as("cols"))
      .as[(Seq[Long], Seq[Long])].collect()
    edge.foreach { case (f, c) => assert(f == c) }
  }

  test("image header parsing: PNG IHDR and JPEG general marker scan") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def png(w: Int, h: Int): Array[Byte] =
      hx("89504E470D0A1A0A0000000D49484452" + f"$w%08X$h%08X" + "0806000000")
    // JPEG whose SOF2 (progressive) sits after a VARIABLE-length APP1 and a
    // COM segment — exercises the real marker scan, not a fixed offset
    def jpeg(w: Int, h: Int, appJunk: Int): Array[Byte] =
      hx("FFD8" +
        "FFE1" + f"${appJunk + 2}%04X" + "AB" * appJunk + // APP1, junk payload
        "FFFE0004CAFE" + // COM, 2-byte payload
        "FFC2" + "0011" + "08" + f"$h%04X$w%04X" + "03011100021101031101")
    assert(Multimodal.parseDims(png(640, 480)) == Some(("png", 640, 480)))
    assert(Multimodal.parseDims(png(1, 1)) == Some(("png", 1, 1)))
    assert(Multimodal.parseDims(jpeg(123, 77, 40)) == Some(("jpeg", 123, 77)))
    assert(Multimodal.parseDims(jpeg(4096, 2160, 7)) == Some(("jpeg", 4096, 2160)))
    // truncation, non-image bytes, and a PNG signature without IHDR fall back
    assert(Multimodal.parseDims(png(9, 9).take(20)).isEmpty)
    assert(Multimodal.parseDims(jpeg(9, 9, 5).take(6)).isEmpty)
    assert(Multimodal.parseDims("just some text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseDims(hx("89504E470D0A1A0A0000000D49484400" + "00" * 16)).isEmpty)
    // decodeStub surfaces the REAL dims for parseable headers, stub otherwise
    // (legacy — pinned here only; board queries route through
    // withDecodedMeta, which lands NULL for unparseable bytes instead)
    assert(Multimodal.decodeStub(jpeg(123, 77, 40)).width == 123)
    assert(Multimodal.decodeStub("abc".getBytes).width == 3 % 640)
  }

  test("withDecodedMeta lands NULL dims for unparseable bytes, real dims otherwise") {
    import spark.implicits._
    def pngHdr(w: Int, h: Int): Array[Byte] =
      ("89504E470D0A1A0A0000000D49484452" + f"$w%08X$h%08X" + "0806000000")
        .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val df = Seq(
      (1L, pngHdr(31, 17)),
      (2L, "definitely not an image".getBytes("UTF-8"))).toDF("id", "blob")
    val rows = Multimodal.withDecodedMeta(df, "blob")
      .select(col("id"), col("asset_meta.format"), col("asset_meta.width"),
        col("asset_meta.height"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(rows(1L) == (("png", Some(31), Some(17))))
    assert(rows(2L) == (("raw", None, None)))
  }

  test("GIF/BMP dims and RIFF/WAV chunk scan, little-endian and padded chunks") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def le16(v: Int) = f"${v & 0xFF}%02X${(v >> 8) & 0xFF}%02X"
    def le32(v: Int) =
      f"${v & 0xFF}%02X${(v >> 8) & 0xFF}%02X${(v >> 16) & 0xFF}%02X${(v >> 24) & 0xFF}%02X"
    // GIF: both signature versions, LE dims
    assert(Multimodal.parseDims(hx("474946383761" + le16(320) + le16(200) + "F70000"))
      == Some(("gif", 320, 200)))
    assert(Multimodal.parseDims(hx("474946383961" + le16(1) + le16(65535) + "F70000"))
      == Some(("gif", 1, 65535)))
    // BMP: negative height means top-down rows, dimension is |h|
    def bmp(w: Int, h: Int) = hx("424D" + le32(28) + "00000000" + le32(28) +
      le32(40) + le32(w) + le32(h) + "0100")
    assert(Multimodal.parseDims(bmp(640, 480)) == Some(("bmp", 640, 480)))
    assert(Multimodal.parseDims(bmp(8, -32)) == Some(("bmp", 8, 32)))
    assert(Multimodal.parseDims(hx("424D" + "00" * 10)).isEmpty) // truncated
    // WAV: an ODD-sized LIST chunk before fmt exercises RIFF word padding
    def wav(ch: Int, rate: Int, dataSz: Int, junk: String) =
      hx("52494646" + le32(100) + "57415645" + junk +
        "666D7420" + le32(16) + le16(1) + le16(ch) + le32(rate) +
        le32(rate * ch * 2) + le16(ch * 2) + le16(16) +
        "64617461" + le32(dataSz))
    val plain = Multimodal.parseWav(wav(2, 44100, 8000, ""))
    assert(plain == Some(Multimodal.WavMeta(2, 44100, 16, 176400, 8000L)), plain.toString)
    val padded = Multimodal.parseWav(
      wav(1, 8000, 123, "4C495354" + le32(3) + "414243" + "00")) // LIST len 3 + pad
    assert(padded == Some(Multimodal.WavMeta(1, 8000, 16, 16000, 123L)), padded.toString)
    assert(Multimodal.parseWav("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseWav(hx("524946460400000057415645")).isEmpty) // no fmt/data
  }

  test("multimodal decode stub: mapPartitions path matches column path") {
    import spark.implicits._
    val df = docs.limit(50).withColumn("blob", encode(col("text"), "UTF-8"))
    val decoded = Multimodal.withDecodedMeta(df, "blob")
      .select(col("doc_id"), col("asset_meta.byteLen"), col("asset_meta.checksum"))
      .as[(Long, Long, String)].collect()
      .map { case (id, len, sum) => id -> ((len, sum)) }.toMap
    val colPath = Multimodal.byteFeatures(df, "blob")
      .select(col("doc_id"), col("byte_len"), col("checksum"))
      .as[(Long, Long, String)].collect()
    colPath.foreach { case (id, len, sum) =>
      val (dlen, dsum) = decoded(id)
      assert(dlen == len && dsum == sum)
    }
  }

  test("frame sampling emits deterministic slices") {
    import spark.implicits._
    val df = Seq((1L, Array.range(0, 100).map(_.toByte))).toDF("id", "blob")
    val frames = Multimodal.sampleFrames(df, "id", "blob", 32)
      .as[(Long, Int, Array[Byte])].collect()
    assert(frames.length == 3)
    assert(frames.map(_._3.length).toSeq == Seq(32, 32, 32))
    assert(frames(1)._3(0) == 32.toByte)
  }

  test("langId returns a deterministic language tag") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of a house in town"),
      (2L, "der hund und die katze das haus"),
      (3L, "zzz qqq www")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "unknown")
  }

  test("packShards equals the naive global prefix sum, with NO global window in the plan") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokenCount(col("text"))
    val out = Sharding.packShards(docs, "doc_id", toks, budget = 2000)
    // ground truth: the single-window form the DuckDB oracle uses
    val naive = docs.select(col("doc_id"), toks.as("t"))
      .withColumn("start", coalesce(sum("t").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), expr("start DIV 2000L").as("shard"))
    assert(out.orderBy("doc_id").as[(Long, Long)].collect().toSeq ==
      naive.orderBy("doc_id").as[(Long, Long)].collect().toSeq)
    // shards are contiguous id ranges starting at 0
    val shards = out.orderBy("doc_id").as[(Long, Long)].collect().map(_._2)
    assert(shards.head == 0L)
    assert(shards.zip(shards.tail).forall { case (a, b) => b == a || b == a + 1 })
    // the scale property: every data-bearing Window partitions by bucket —
    // the only unpartitioned window may be the constant-size bucket-totals
    // prefix, which consumes an Aggregate, never the corpus
    val winLines = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.exists(_.contains("_ps_b#")), s"bucketed window missing:\n${winLines.mkString("\n")}")
  }

  test("packShards survives an id span wider than Long (sentinel ids)") {
    import spark.implicits._
    // span Long.MinValue..Long.MaxValue: naive (maxId-minId) wraps negative
    // and naive (id-minId) wraps per row — bucket order must still follow
    // id order, so cumulative starts stay correct
    val df = Seq(
      (Long.MinValue, "a b c d e f g h i j"),
      (-5L, "a b c d e f g h i j"),
      (0L, "a b c d e f g h i j"),
      (7L, "a b c d e f g h i j"),
      (Long.MaxValue, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val out = Sharding.packShards(df, "doc_id", TextAnalysis.tokenCount(col("text")), budget = 25)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // exclusive cumsums 0,10,20,30,40 → DIV 25 → 0,0,0,1,1 in id order
    assert(out.map(_._2) == Seq(0L, 0L, 0L, 1L, 1L), s"wrong shards: $out")
  }

  test("stratifiedSample takes exactly ceil(frac * |stratum|) per stratum, deterministically") {
    import spark.implicits._
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang", 0.1)
      .select(col("doc_id"), col("lang"))
    val got = sampled.as[(Long, String)].collect().toSet
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val gotSizes = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (lang, n) =>
      assert(gotSizes.getOrElse(lang, 0L) == math.ceil(n * 0.1).toLong,
        s"stratum $lang quota wrong: ${gotSizes.get(lang)} of $n")
    }
    // stable across recomputation (pure function of ids)
    val again = Sampling.stratifiedSample(docs, "doc_id", "lang", 0.1)
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toSet
    assert(got == again)
  }

  test("tfIdf matches a hand-computed corpus") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry durian")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(df, "doc_id", "text")
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    def ln(x: Double) = math.log(x)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out((1L, "apple")) == (2L, r4(2 * ln(3.0 / 1))))
    assert(out((1L, "banana")) == (1L, r4(1 * ln(3.0 / 2))))
    assert(out((3L, "cherry")) == (2L, r4(2 * ln(3.0 / 2))))
    assert(out((3L, "durian")) == (1L, r4(1 * ln(3.0 / 1))))
    assert(out.size == 6)
  }

  test("one-pass ShinglesExpr equals the Column-HOF shingles") {
    import spark.implicits._
    for (n <- Seq(3, 5)) {
      val both = docs.select(
        graft.functions.MinHashExpr.shinglesArray(col("text"), n).as("fast"),
        Dedup.shingles(col("text"), n).as("hof"))
      assert(both.where(col("fast") =!= col("hof")).count() == 0, s"n=$n drift")
    }
    // short-doc path: whole text as the single gram
    val tiny = Seq("one two", " padded  ", "").toDF("text")
    val b = tiny.select(
      graft.functions.MinHashExpr.shinglesArray(col("text"), 3).as("fast"),
      Dedup.shingles(col("text"), 3).as("hof"))
    assert(b.where(col("fast") =!= col("hof")).count() == 0)
  }

  test("ShinglesExpr fuzz: equals HOF shingles over adversarial whitespace/unicode") {
    import spark.implicits._
    // deterministic adversarial strings: runs of spaces/tabs/newlines at the
    // edges, unicode glyphs, empty/blank strings — the places a hand-rolled
    // trim/split drifts from Spark's trim (spaces only) + split('\s+', -1)
    val rnd = new scala.util.Random(42)
    val glyphs = Array("a", "bb", "é", "✓", "0", " ", " ", "\t", "\n", "  ")
    val strs = ("" +: "   " +: "\t\n" +: (0 until 400).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => glyphs(rnd.nextInt(glyphs.length))).mkString
    }).toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val drift = strs.select(
          graft.functions.MinHashExpr.shinglesArray(col("text"), n).as("fast"),
          Dedup.shingles(col("text"), n).as("hof"))
        .where(col("fast") =!= col("hof"))
      assert(drift.count() == 0,
        s"n=$n drift: ${drift.take(3).mkString("; ")}")
    }
  }

  test("ngramOverlap finds exactly the train/eval pairs sharing a 5-gram") {
    import spark.implicits._
    val train = Seq(
      (1L, "a b c d e f g"), // shares "c d e f g" with eval 10
      (2L, "x y z w q r s"), // no overlap
      (3L, "tiny doc")       // < n tokens: whole text is the gram
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "c d e f g h i"),
      (11L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = Decontam.ngramOverlap(train, eval_, "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (3L, 11L, 1L)))
  }

  test("ngramOverlap counts DISTINCT shared grams once per pair") {
    import spark.implicits._
    // "a b c d e a b c d e a b c d e": the repeated gram "a b c d e" (and
    // its rotations) appear many times but each distinct gram counts once
    val train = Seq((1L, "a b c d e a b c d e a b c d e")).toDF("doc_id", "text")
    val eval_ = Seq((2L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val got = Decontam.ngramOverlap(train, eval_, "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect()
    // distinct 5-grams of the cycle a..e: exactly 5 (one per rotation);
    // eval's 10-token text contains all 5 rotations too (6 windows)
    assert(got.toSeq == Seq((1L, 2L, 5L)))
  }

  test("scrubPii replaces emails then phones, and counts each once") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail john.doe42@test.org or call +1 555-123-4567 now"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c.d@e.org one phone 020 7946 0958")
    ).toDF("doc_id", "text")
    val out = df.select(
      col("doc_id"),
      TextAnalysis.piiCount(col("text"), TextAnalysis.emailRe).as("ne"),
      TextAnalysis.piiCount(TextAnalysis.scrubEmails(col("text")),
        TextAnalysis.phoneRe).as("np"),
      TextAnalysis.scrubPii(col("text")).as("s")
    ).as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "mail <EMAIL> or call <PHONE> now")
    assert(out(2L) == ((2L, 0L, 0L, "no pii here at all")))
    assert(out(3L)._2 == 2 && out(3L)._3 == 1)
    assert(!out(3L)._4.contains("@") && !out(3L)._4.contains("0958"))
  }

  test("matchAllTerms returns only docs with every term, with total hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark window join spark"),   // all three, 4 hits
      (2L, "spark join"),                // missing window
      (3L, "Window JOIN spark extra"),   // case-insensitive, 3 hits
      (4L, "sparkly window joint")       // token-level, not substring
    ).toDF("doc_id", "text")
    val got = Search.matchAllTerms(df, "doc_id", "text",
        Seq("spark", "window", "join"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 4L), (3L, 3L)))
    // duplicate / case-duplicate query terms collapse to one requirement
    // instead of demanding an unsatisfiable distinct-match count
    val dup = Search.matchAllTerms(df, "doc_id", "text",
        Seq("Spark", "spark", "window", "join"))
      .as[(Long, Long)].collect().toSet
    assert(dup == got)
  }

  test("embedNearDupAcross: planted semantic twin found across splits, verify filters, sides never self-pair") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // train: 40 spread unit-ish vectors; eval: a near-copy of train #7
    // (cosine ~0.9997) plus two unrelated directions
    val train = (0L until 40L).map { i =>
      val a = i.toDouble / 40 * math.Pi
      (i, v(math.cos(a), math.sin(a), 0.1 * math.cos(3 * a), 0.1 * math.sin(3 * a)))
    }
    val a7 = 7.0 / 40 * math.Pi
    val eval_ = Seq(
      (100L, v(math.cos(a7) + 0.01, math.sin(a7), 0.1 * math.cos(3 * a7), 0.1 * math.sin(3 * a7))),
      (101L, v(0.0, 0.0, 1.0, 0.0)),
      (102L, v(0.0, 0.0, 0.0, -1.0)))
    val out = Decontam.embedNearDupAcross(
        train.toDF("vec_id", "embedding"), eval_.toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.98)
      .as[(Long, Long, Double)].collect()
    assert(out.exists(p => p._1 == 7L && p._2 == 100L && p._3 >= 0.98),
      s"planted twin missed: ${out.toSeq}")
    // verification is real: nothing below the threshold leaks, and every
    // pair is train-side × eval-side by construction
    assert(out.forall(_._3 >= 0.98), s"unverified pair leaked: ${out.toSeq}")
    assert(out.forall(p => p._1 < 100L && p._2 >= 100L), s"side mixed: ${out.toSeq}")
  }

  test("nearDupAcross: exact cross-split dup found, precision verified, no within-side pairs") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated training text about sbt builds"),
      (3L, "the quick brown fox jumps over the lazy dog") // near-dup of 1, same side
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1/3
      (11L, "another disjoint evaluation document entirely")
    ).toDF("doc_id", "text")
    val got = Decontam.nearDupAcross(train, eval_, "doc_id", "text",
        k = 8, rowsPerBand = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    // identical text ⇒ identical signatures ⇒ guaranteed candidate, jaccard 1
    assert(got.filter(r => r._1 == 1L && r._2 == 10L).map(_._3).toSeq == Seq(1.0))
    assert(got.filter(r => r._1 == 3L && r._2 == 10L).map(_._3).toSeq == Seq(1.0))
    // sides are directional: train ids on the left, eval ids on the right
    assert(got.forall(r => Set(1L, 2L, 3L)(r._1) && Set(10L, 11L)(r._2)))
    // precision: every returned pair really clears the threshold
    assert(!pairs.contains((2L, 11L)) && !pairs.contains((2L, 10L)))
  }

  test("repetition signals: dup 3-gram fraction and top-token share") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),      // grams: [aaa, aaa] -> dup 0.5; top token 1.0
      (2L, "a b c d"),      // 2 distinct grams -> 0.0; top 0.25
      (3L, "x")             // short doc: whole-text gram -> 0.0; top 1.0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((0.5, 1.0)))
    assert(got(2L) == ((0.0, 0.25)))
    assert(got(3L) == ((0.0, 1.0)))
  }

  test("tokenChunks fuzz: equals a Scala reference over random sizes/strides") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docsF = (0 until 120).map { i =>
      (i.toLong, (0 until rnd.nextInt(120)).map(j => s"w${rnd.nextInt(9)}").mkString(" "))
    }
    val df = docsF.toDF("doc_id", "text")
    for ((size, stride) <- Seq((4, 3), (8, 8), (16, 5))) {
      val got = Chunking.tokenChunks(df, "doc_id", "text", size, stride)
        .as[(Long, Int, String, Long)].collect().toSet
      val want = docsF.flatMap { case (id, text) =>
        val ws = text.trim.split("\\s+", -1)
        val last = math.max(0L, math.ceil((ws.length - size).toDouble / stride).toLong)
        (0L to last).map { k =>
          val start = (k * stride).toInt
          val tok = ws.slice(start, start + size)
          (id, k.toInt, tok.mkString(" "), math.min(size.toLong, ws.length - start))
        }
      }.toSet
      assert(got == want, s"size=$size stride=$stride mismatch")
    }
  }

  test("pruneVocab: rare tokens become <unk>, token order preserved") {
    import spark.implicits._
    val df = Seq(
      (1L, "aa bb cc"),
      (2L, "aa bb dd"),
      (3L, "aa bb"),
      (4L, "qq aa rr bb") // interleaved rare tokens pin order preservation
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pruneVocab(df, "doc_id", "text", minCount = 2)
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (("aa bb <unk>", 1L)))
    assert(got(2L) == (("aa bb <unk>", 1L)))
    assert(got(3L) == (("aa bb", 0L)))
    assert(got(4L) == (("<unk> aa <unk> bb", 2L)))
  }

  test("tokenChunks: overlapping windows cover every token, short docs one chunk") {
    import spark.implicits._
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (2L, "a b")
    ).toDF("doc_id", "text")
    val got = Chunking.tokenChunks(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got == Set(
      (1L, 0, "t1 t2 t3 t4", 4L),
      (1L, 1, "t4 t5 t6 t7", 4L),
      (1L, 2, "t7 t8 t9 t10", 4L),
      (2L, 0, "a b", 2L)))
  }

  test("neardup_clusters memoized-pairs result equals clusters over fresh pairs") {
    import spark.implicits._
    val viaEntry = graft.SparkEntry.queries("neardup_clusters")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toSet
    val fresh = Dedup.nearDupClusters(
        Dedup.nearDupPairs(docs, "doc_id", "text",
          k = 8, rowsPerBand = 2, threshold = 0.2))
      .as[(Long, Long)].collect().toSet
    assert(viaEntry == fresh)
  }

  test("dupSpans finds maximal cross-doc spans, merges islands, handles within-doc repeats") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),       // shares "a b c d e" with doc 2
      (2L, "x y a b c d e z"),
      (3L, "m n o"),                 // unique — must not appear
      (4L, "r s r s r s r s r s")    // self-repeating: whole doc one span
    ).toDF("doc_id", "text")
    val got = DupSpans.dupSpans(df, "doc_id", "text", k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 1: windows 0..2 duplicated → span tokens [0,4]; doc 2: windows
    // 2..4 → [2,6]; doc 4: every window repeats a later/earlier one →
    // one island covering the doc
    assert(got == Seq(
      (1L, 0L, 4L, 5L, 3L),
      (2L, 2L, 6L, 5L, 3L),
      (4L, 0L, 9L, 10L, 8L)))
  }

  test("dupSpans clamps sub-k duplicate documents to the real document end") {
    import spark.implicits._
    val df = Seq(
      (1L, "p q"), (2L, "p q"),       // exact short dup: span [0,1], 2 tokens
      (3L, "only once here at all")
    ).toDF("doc_id", "text")
    val got = DupSpans.dupSpans(df, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 1L, 2L, 1L), (2L, 0L, 1L, 2L, 1L)))
  }

  test("dupSpans plan: every data-bearing window is partitioned (digest or doc)") {
    val out = DupSpans.dupSpans(docs, "doc_id", "text", k = 8)
    val winLines = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.forall(l => l.contains("g#") || l.contains("doc_id#")),
      s"unpartitioned window in dupSpans plan:\n${winLines.mkString("\n")}")
  }

  test("globalShuffle is a permutation equal to the naive global rank, stable across runs") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val out = CorpusShuffle.globalShuffle(docs, "doc_id")
      .as[(Long, Long)].collect().toMap
    val key = md5(concat(lit("shuffle:"), col("doc_id").cast("string")))
    val naive = docs.select(col("doc_id"),
        (row_number().over(Window.orderBy(key, col("doc_id"))) - 1).cast("long").as("pos"))
      .as[(Long, Long)].collect().toMap
    assert(out == naive)
    // permutation of 0..N-1
    assert(out.values.toSeq.sorted == (0L until out.size.toLong))
    // and genuinely shuffled: not the identity order
    assert(out.toSeq.sortBy(_._1).map(_._2) != (0L until out.size.toLong))
    val again = CorpusShuffle.globalShuffle(docs, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(out == again)
  }

  test("globalShuffle plan: corpus rank windows partition by the key-prefix bucket") {
    val out = CorpusShuffle.globalShuffle(docs, "doc_id")
    val winLines = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.exists(_.contains("_gs_b#")),
      s"bucketed window missing:\n${winLines.mkString("\n")}")
  }

  test("temperatureSample keeps ceil(min(n, c*sqrt(n))) per stratum; small strata whole") {
    import spark.implicits._
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val c = 4.0
    val sampled = Sampling.temperatureSample(docs, "doc_id", "lang", c)
    val gotSizes = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (lang, n) =>
      val want = math.ceil(math.min(n.toDouble, c * math.sqrt(n.toDouble))).toLong
      assert(gotSizes.getOrElse(lang, 0L) == want,
        s"stratum $lang quota wrong: ${gotSizes.get(lang)} want $want of $n")
    }
    // a stratum smaller than c^2 survives intact (c*sqrt(n) >= n)
    import org.apache.spark.sql.functions.{col => fcol}
    val tiny = docs.limit(0).union(docs.where(fcol("lang") === "en").limit(3))
    val keptWhole = Sampling.temperatureSample(tiny, "doc_id", "lang", c).count()
    assert(keptWhole == 3L)
    // deterministic: pure function of ids
    val again = Sampling.temperatureSample(docs, "doc_id", "lang", c)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sampled.select("doc_id").as[Long].collect().toSet)
  }

  test("stripDupSpans cuts exactly the duplicated spans; fully-dup docs drop") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),       // span [0,4] stripped → "f g h"
      (2L, "x y a b c d e z"),       // span [2,6] stripped → "x y z"
      (3L, "m n o"),                 // untouched
      (4L, "p q"), (5L, "p q")       // fully duplicated → dropped
    ).toDF("doc_id", "text")
    val got = DupSpans.stripDupSpans(df, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    def fp(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    assert(got == Seq(
      (1L, fp("f g h"), 3L),
      (2L, fp("x y z"), 3L),
      (3L, fp("m n o"), 3L)))
  }

  test("stripDupSpans handles overlapping expanded spans from separate islands") {
    import spark.implicits._
    // doc 1: "a b c" dup at pos 0 and "c d e" dup at pos 2 (via docs 2/3),
    // pos 1 window "b c d" unique → two islands whose k-expanded token
    // ranges [0,2] and [2,4] OVERLAP at token 2 — the anti-join must not
    // double-drop or leak token 2
    val df = Seq(
      (1L, "a b c d e q r s"),
      (2L, "a b c z z z"),
      (3L, "z c d e z z")
    ).toDF("doc_id", "text")
    val got = DupSpans.stripDupSpans(df, "doc_id", "text", k = 3)
      .where(col("doc_id") === 1L)
      .as[(Long, String, Long)].collect().toSeq
    assert(got.map(_._3) == Seq(3L), s"doc 1 should keep exactly q r s: $got")
  }

  test("containmentPairs surfaces an embedded excerpt that Jaccard misses") {
    import spark.implicits._
    // doc 2 is a verbatim excerpt of doc 1 (first 12 tokens of 24
    // distinct): containment(B in A) = 1.0 while jaccard = 10/22 — below
    // any useful jaccard threshold. Single-row bands (k=16, r=1): a band
    // collides iff that seed's corpus-wide argmin shingle lies in the
    // shared set (p = 10/22 per seed), so 16 seeds make a collision
    // effectively certain
    val long =
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20 w21 w22 w23 w24"
    val df = Seq((1L, long), (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text",
        k = 16, rowsPerBand = 1, threshold = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.length == 1)
    val (a, b, cab, cba) = got.head
    assert((a, b) == ((1L, 2L)))
    assert(cba == 1.0, s"excerpt containment should be exactly 1.0: $cba")
    assert(cab < 0.46, s"long-side containment stays low: $cab")
    // and the jaccard path at the same threshold finds nothing
    assert(Dedup.nearDupPairs(df, "doc_id", "text",
      k = 16, rowsPerBand = 1, threshold = 0.9).count() == 0L)
  }

  test("int8Quantize: codes round-trip within one scale step, zero vector safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(3.0f))
    ).toDF("vec_id", "embedding")
    val out = Quantize.int8Quantize(df, "vec_id", "embedding")
      .orderBy("vec_id")
      .as[(Long, Long, Double, String)].collect().toSeq
    assert(out.map(_._2) == Seq(4L, 4L, 1L))
    assert(out(0)._3 == 1.0 / 127.0)
    assert(out(1)._3 == 0.0)
    // codes directly: [64, -127, 32, 0] (0.5*127=63.5 → half-up 64)
    val codes = df.where(col("vec_id") === 1L)
      .select(Quantize.int8Codes(col("embedding"), Quantize.absMax(col("embedding"))))
      .as[Seq[Int]].head()
    assert(codes == Seq(64, -127, 32, 0), s"codes: $codes")
    // dequantized max error ≤ scale/2
    val deq = codes.map(_ * (1.0 / 127.0))
    val orig = Seq(0.5, -1.0, 0.25, 0.0)
    assert(deq.zip(orig).forall { case (d, o) => math.abs(d - o) <= 0.5 / 127.0 + 1e-12 })
  }

  test("value_bands partitions all orders; sliding windows double-count; spectrum conserves tokens") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val bands = graft.SparkEntry.queries("value_bands")(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(bands.map(_._1) == Seq("q1", "q2", "q3", "q4"))
    assert(bands.forall(_._2 > 0))
    assert(bands.map(_._2).sum == graft.Tables.orders(spark, dir).count())
    val slid = graft.SparkEntry.queries("sliding_window")(spark, dir)
      .agg(sum("n")).as[Long].head()
    assert(slid == 2 * graft.Tables.events(spark, dir).count(),
      "every event must land in exactly width/hop = 2 hopping windows")
    val spec = graft.SparkEntry.queries("freq_spectrum")(spark, dir)
      .select(col("f") * col("n_terms")).as[Long].collect().sum
    val toks = graft.Tables.documents(spark, dir)
      .select(sum(TextAnalysis.tokenCount(col("text")))).as[Long].head()
    assert(spec == toks, s"spectrum mass $spec != corpus tokens $toks")
  }

  test("unigramLogprob matches hand-computed corpus surprise, decimal-exact") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogprob(df, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // counts: a=2 b=2 c=1, T=5; nll = round(ln(T/cnt), 4)
    val nllA = BigDecimal(math.log(5.0 / 2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val nllC = BigDecimal(math.log(5.0 / 1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 3L), (2L, 2L)))
    assert(math.abs(got(0)._3 - (nllA * 3).toDouble / 3) < 1e-12)
    assert(math.abs(got(1)._3 - (nllA + nllC).toDouble / 2) < 1e-12)
  }

  test("mixUpsample: exact per-stratum totals, 0-based copies, w=0 drops, deterministic") {
    import spark.implicits._
    val weights = Map("src0" -> 0.0, "src1" -> 0.5, "src2" -> 2.25)
    val out = Sampling.mixUpsample(docs, "doc_id", "source", weights)
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val gotSizes = out.groupBy("source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (src, n) =>
      val w = weights.getOrElse(src, 1.0)
      val want = math.floor(w).toLong * n + math.ceil((w - math.floor(w)) * n).toLong
      assert(gotSizes.getOrElse(src, 0L) == want,
        s"stratum $src total wrong: ${gotSizes.get(src)} want $want of $n (w=$w)")
    }
    // copy_idx is a complete 0-based range per document
    val badCopies = out.groupBy("doc_id")
      .agg(count(lit(1)).as("c"), min("copy_idx").as("lo"), max("copy_idx").as("hi"))
      .where(col("lo") =!= 0 || col("hi") =!= col("c") - 1)
      .count()
    assert(badCopies == 0L, "copy_idx not a 0-based dense range")
    // the fractional-epoch extra-copy set is the md5-lowest-ranked docs —
    // a pure function of ids: stable across reruns
    val again = Sampling.mixUpsample(docs, "doc_id", "source", weights)
      .select("doc_id", "copy_idx").as[(Long, Long)].collect().toSet
    assert(again == out.select("doc_id", "copy_idx").as[(Long, Long)].collect().toSet)
  }

  test("mrlTruncate: hand-computed renorm codes and norm fraction; zero prefix safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0f, 4.0f, 12.0f)), // prefix (3,4): norm 5, full 13
      (2L, Array(0.0f, 0.0f, 2.0f))   // zero prefix
    ).toDF("vec_id", "embedding")
    val got = Quantize.mrlTruncate(df, "vec_id", "embedding", d = 2)
      .orderBy("vec_id").as[(Long, Double, String)].collect().toSeq
    def fp(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    // 3/5 = 0.6 → 600000; 4/5 = 0.8 → 800000; frac = round(5/13, 6)
    assert(got == Seq(
      (1L, BigDecimal(5.0 / 13).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        fp("600000,800000")),
      (2L, 0.0, fp("0,0"))))
  }

  test("cdcChunks tile each document exactly; boundaries are content-defined") {
    import spark.implicits._
    val out = Chunking.cdcChunks(docs, "doc_id", "text", k = 4, modulus = 16)
    // chunks tile [0, n_tok-1]: starts/ends chain with no gap or overlap
    val bad = out
      .withColumn("nxt", lead(col("start_pos"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("chunk_idx")))
      .where(col("nxt").isNotNull && col("nxt") =!= col("end_pos") + 1)
      .count()
    assert(bad == 0L, s"$bad non-contiguous chunk seams")
    val tokTotals = docs.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .as[(Long, Long)].collect().toMap
    val chunkTotals = out.groupBy("doc_id").agg(sum("n_tokens").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(chunkTotals == tokTotals, "chunk token totals != document token counts")

    // content-defined stability: prepending a token shifts every position by
    // one but re-chunks ONLY the neighborhood of the edit — boundaries
    // strictly beyond the first k-gram window that saw the new token
    // reappear at +1, where fixed-size windows would move every boundary
    val base = docs.limit(1).select(col("doc_id"), col("text"))
    val baseText = base.as[(Long, String)].head()._2
    val edited = Seq((99L, "zzz " + baseText)).toDF("doc_id", "text")
    def boundSet(df: org.apache.spark.sql.DataFrame) =
      Chunking.cdcChunks(df, "doc_id", "text", k = 4, modulus = 16)
        .where(col("start_pos") > 0).select("start_pos").as[Long].collect().toSet
    val b0 = boundSet(base)
    val b1 = boundSet(edited)
    // every original boundary past the edit's k-wide influence zone survives
    val influenced = 4L // the k new windows that include the prepended token
    val survived = b0.filter(_ > influenced).map(_ + 1L)
    assert(survived.subsetOf(b1),
      s"content-defined boundaries did not survive a prepend: missing ${survived -- b1}")
  }

  test("sourceOverlap counts distinct shared grams per unordered source pair") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d", "s1"), // grams(k=3): "a b c", "b c d"
      (2L, "a b c x", "s2"), // shares "a b c" with s1
      (3L, "b c d", "s2"),   // shares "b c d" with s1 (len==k whole window)
      (4L, "a b c y", "s2"), // duplicate shared gram within s2 — distinct'd
      (5L, "q r", "s3")      // sub-k whole-text gram, unshared
    ).toDF("doc_id", "text", "source")
    val got = Audit.sourceOverlap(df, "source", "text", k = 3)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("s1", "s2", 2L)))
  }

  test("ngramOverlapBloom: result identical to ngramOverlap; gate prunes the train side") {
    import spark.implicits._
    val split = Sampling.splitOf(col("doc_id"))
    val train = docs.where(split === "train")
    val eval_ = docs.where(split === "test")
    val exact = Decontam.ngramOverlap(train, eval_, "doc_id", "text", n = 5)
      .as[(Long, Long, Long)].collect().toSet
    val bloomed = Decontam.ngramOverlapBloom(train, eval_, "doc_id", "text", n = 5)
    assert(bloomed.as[(Long, Long, Long)].collect().toSet == exact,
      "bloom-gated decontam diverged from the exact relation")
    // the gate is IN the plan (a bloom_might_contain filter on the train
    // side) — otherwise this is just ngramOverlap with extra steps
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"bloom gate missing:\n$plan")
    // and it actually prunes: random word-salad 5-grams rarely collide
    // across the split, so the gated gram relation must be far smaller
    // count gated vs ungated gram rows via the same internal shapes
    val ungatedGrams = train
      .select(explode(graft.functions.MinHashExpr.shinglesArray(col("text"), 5)).as("gram"))
      .count()
    val evalG = eval_
      .select(explode(graft.functions.MinHashExpr.shinglesArray(col("text"), 5)).as("gram"))
      .select(md5(col("gram")).as("g")).distinct()
    val bloom = evalG.stat.bloomFilter("g", math.max(evalG.count(), 1L), 0.01)
    val bc = spark.sparkContext.broadcast(graft.functions.BloomExpr.serialize(bloom))
    val gatedGrams = train
      .select(explode(graft.functions.MinHashExpr.shinglesArray(col("text"), 5)).as("gram"))
      .select(md5(col("gram")).as("g"))
      .where(graft.functions.BloomExpr.mightContain(col("g"), bc))
      .count()
    assert(gatedGrams < ungatedGrams / 2,
      s"bloom gate barely prunes: $gatedGrams of $ungatedGrams train grams pass")
  }

  test("bloom gate has no false negatives: every inserted digest passes") {
    import spark.implicits._
    val g = docs
      .select(md5(col("text")).as("g"))
    val bloom = g.stat.bloomFilter("g", 2000L, 0.01)
    val bc = spark.sparkContext.broadcast(graft.functions.BloomExpr.serialize(bloom))
    val missed = g.where(!graft.functions.BloomExpr.mightContain(col("g"), bc)).count()
    assert(missed == 0L, s"$missed inserted digests answered false")
  }

  test("semDedup: min-id kept per near-dup group; cross-cluster pairs invisible") {
    import spark.implicits._
    // hand-built index: semDedup consumes a clustered index, training-free
    val index = Seq(
      (1L, Array(1.0f, 0.0f), 0L),   // kept: min id of the (1,2) near-dup pair
      (2L, Array(1.0f, 0.001f), 0L), // dropped: cos to vec 1 ≈ 1 ≥ 0.9
      (3L, Array(0.0f, 1.0f), 0L),   // kept: orthogonal to its cluster-mates
      (4L, Array(1.0f, 0.0f), 1L)    // kept: identical to vec 1 but in
                                     // another cluster — SemDeDup by design
                                     // never compares across clusters
    ).toDF("vec_id", "embedding", "cluster")
    val got = Similarity.semDedup(index, "vec_id", "embedding", threshold = 0.9)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 0L, true), (2L, 0L, false), (3L, 0L, true), (4L, 1L, true)))
    // the verify self-join must hash-partition on the cluster key, not
    // fall back to a cartesian/BNL over the corpus
    val plan = Similarity.semDedup(index, "vec_id", "embedding", 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"within-cluster verify lost its equi-join key:\n$plan")
  }

  test("PQ codebooks and codes match a hand-computed Lloyd step") {
    import spark.implicits._
    // dim=4 split into 2 subspaces of 2; k=2 codewords seeded from ids 0,1.
    // One Lloyd step: sub0 assigns {0,2}->code0, {1,3}->code1 (same for
    // sub1), so refined codewords are the pair means.
    val e = Seq(
      (0L, Seq(0.0f, 0.0f, 10.0f, 10.0f)),
      (1L, Seq(1.0f, 1.0f, 11.0f, 11.0f)),
      (2L, Seq(0.2f, 0.2f, 10.2f, 10.2f)),
      (3L, Seq(0.9f, 0.9f, 10.9f, 10.9f))
    ).toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(e, "vec_id", "embedding",
      numSub = 2, k = 2, iters = 1)
    assert(books.length == 2 && books.forall(_.length == 2))
    // DECIMAL(18,6) accumulation absorbs float noise: means are exact
    assert(books(0)(0)._2 == Seq(0.1, 0.1), books(0)(0)._2.toString)
    assert(books(0)(1)._2 == Seq(0.95, 0.95), books(0)(1)._2.toString)
    assert(books(1)(0)._2 == Seq(10.1, 10.1), books(1)(0)._2.toString)
    assert(books(1)(1)._2 == Seq(10.95, 10.95), books(1)(1)._2.toString)
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", books)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.toSeq == Seq((0L, 0L, 0L), (1L, 1L, 1L), (2L, 0L, 0L), (3L, 1L, 1L)))
  }

  test("PQ codebooks: emptied code keeps its codeword; training is deterministic") {
    import spark.implicits._
    // ids 0 and 1 seed IDENTICAL codewords, so every vector ties and the
    // tie-break (smallest code) drains code 1 completely — the Lloyd step
    // must keep its codeword unchanged (the COALESCE path in the oracle)
    val e = Seq(
      (0L, Seq(0.0f, 0.0f)),
      (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(0.1f, 0.1f)),
      (3L, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(e, "vec_id", "embedding",
      numSub = 1, k = 2, iters = 1)
    assert(books(0)(0)._2 == Seq(0.15, 0.15), books(0)(0)._2.toString)
    assert(books(0)(1)._2 == Seq(0.0, 0.0), books(0)(1)._2.toString)
    val again = Similarity.pqCodebooks(e, "vec_id", "embedding",
      numSub = 1, k = 2, iters = 1)
    assert(books.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("PQ ADC top-k: self-hit, brute-force overlap, probe reads codes only") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val (books, codes) = Similarity.pqTrained(e, "vec_id", "embedding",
      numSub = 8, k = 16, iters = 1)
    // 10-query panel: the query's own reconstruction should rank itself
    // first-ish (self-hit), and overlap with exact top-10 must be well
    // above the random baseline (10/500); measured ~0.37 on this fixture
    var overlap = 0.0
    for (qid <- 0L until 10L) {
      val pq = Similarity.pqTopKIndexed(books, codes, e, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
      val brute = Similarity.cosineTopK(e, "vec_id", "embedding", qid, 10)
        .select("vec_id").as[Long].collect().toSet
      assert(pq.contains(qid), s"qid $qid not in its own PQ top-10")
      overlap += pq.intersect(brute).size / 10.0
    }
    assert(overlap / 10 > 0.15, s"PQ recall@10 ${overlap / 10} at chance level")
    // the probe must scan the materialized code table (ExistingRDD), not
    // re-encode the corpus, and never shuffle-join: only the broadcast of
    // the single query row and the final top-k merge
    val plan = Similarity.pqTopKIndexed(books, codes, e, "vec_id", "embedding", 0L, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"probe not code-table-backed:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Cartesian"),
      s"probe plans a shuffle join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not pushed:\n$plan")
    // encode is scan-only: codebooks are literals, nothing shuffles
    val encPlan = Similarity.pqEncode(e, "vec_id", "embedding", books)
      .queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), s"PQ encode shuffles:\n$encPlan")
  }

  test("one-pass PqCodesExpr equals the Column-form encode bit-for-bit") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val books = Similarity.pqCodebooks(e, "vec_id", "embedding",
      numSub = 8, k = 16, iters = 1)
    val fast = Similarity.pqEncode(e, "vec_id", "embedding", books)
      .orderBy("vec_id").collect().map(_.toSeq)
    val ref = Similarity.pqEncodeColumns(e, "vec_id", "embedding", books)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(fast.toSeq == ref.toSeq)
  }

  test("bigramLogprob matches a hand-computed corpus; <2-token docs absent") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b a b"), // bigrams: "a b" x2, "b a" x1
      (2L, "a b"),
      (3L, "x") // no bigrams -> absent
    ).toDF("doc_id", "text")
    // c2: "a b"->3, "b a"->1; c1: a->3, b->1; V = |{b, a}| = 2
    // nll(a b) = round(ln((3+2)/(3+1)), 4) = 0.2231
    // nll(b a) = round(ln((1+2)/(1+1)), 4) = 0.4055
    val rows = TextAnalysis.bigramLogprob(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 2, rows.mkString(","))
    assert(rows(0) == ((1L, 3L, (2 * 0.2231 + 0.4055) / 3.0)), rows(0).toString)
    assert(rows(1) == ((2L, 1L, 0.2231)), rows(1).toString)
  }

  test("bigramLogprob separates fluent repetition from word salad") {
    import spark.implicits._
    // same token MULTISET, different order: the unigram score is identical
    // by construction, but the salad doc uses pairs the corpus never
    // repeats, so its smoothed bigram nll must be strictly higher
    val d = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),
      (3L, "mat the on sat cat the")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.bigramLogprob(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(3L) > m(0L), s"salad ${m(3L)} not above fluent ${m(0L)}")
    val u = TextAnalysis.unigramLogprob(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(u(3L) == u(0L), "unigram gate should NOT separate these")
  }

  test("bm25Rank matches an independent in-test reference") {
    import spark.implicits._
    val texts = Map(
      1L -> "spark join spark",
      2L -> "spark other words here",
      3L -> "join",
      4L -> "unrelated text entirely")
    val d = texts.toSeq.toDF("doc_id", "text")
    val got = Search.bm25Rank(d, "doc_id", "text", Seq("spark", "join"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // independent reference: the published formula computed directly, with
    // the same per-(doc,term) HALF_UP 4-decimal rounding before the sum
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val dls = toks.map { case (id, s) => id -> s.length }
    val n = texts.size.toDouble
    val avgdl = dls.values.sum.toDouble / n
    def ref(id: Long): Option[Double] = {
      val parts = Seq("spark", "join").flatMap { term =>
        val tf = toks(id).count(_ == term)
        if (tf == 0) None
        else {
          val df = toks.values.count(_.contains(term))
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          val tfw = tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dls(id) / avgdl))
          Some(BigDecimal(idf * tfw).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        }
      }
      if (parts.isEmpty) None else Some(parts.sum.toDouble)
    }
    val want = (1L to 4L).flatMap(id => ref(id).map(id -> _))
      .sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
    // both-term doc outranks the single-term docs; no-match doc absent
    assert(got.head._1 == 1L && !got.exists(_._1 == 4L))
  }

  test("KMV sketch: small groups exact, big groups within tolerance, merge law") {
    import spark.implicits._
    // a group with fewer than k distinct tokens degrades to the EXACT count
    val tiny = Seq((1L, "a", "x b c"), (2L, "a", "b c d")).toDF("doc_id", "lang", "text")
    val t = Sketch.kmvDistinctTokens(tiny, "lang", "text", 256).collect()
    assert(t.length == 1 && t(0).getDouble(1) == 4.0, t.mkString(","))
    // fixture corpus: per-lang estimate within 25% of truth at k=256
    val d = docs
    val est = Sketch.kmvDistinctTokens(d, "lang", "text", 256)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = d.select(col("lang"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
      .distinct().groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((lang, ex) <- exact) {
      val rel = math.abs(est(lang) - ex) / ex
      assert(rel < 0.25, s"$lang: est ${est(lang)} vs exact $ex (rel $rel)")
    }
    // mergeability: the sketch of a union equals keeping the k smallest of
    // the unioned sketches — estimate over two halves' union == whole
    val (h1, h2) = (d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1))
    val whole = Sketch.kmvDistinctTokens(d.where(col("lang") === exact.keySet.min), "lang", "text", 64)
      .collect()(0).getDouble(1)
    val merged = Sketch.kmvDistinctTokens(
      h1.union(h2).where(col("lang") === exact.keySet.min), "lang", "text", 64)
      .collect()(0).getDouble(1)
    assert(whole == merged)
  }

  /** Classic array-based BPE reference (no string tricks): overlapping pair
    * counts, argmax with (freq desc, pair asc), left-to-right greedy merge. */
  private def bpeRef(words: Map[String, Long], steps: Int)
      : (Seq[(Int, String, Long)], Map[String, Seq[String]]) = {
    var reprs: Map[String, Seq[String]] =
      words.map { case (w, _) => w -> (w.map(_.toString) :+ "</w>") }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, Long)]()
    var t = 1
    var done = false
    while (t <= steps && !done) {
      val counts = scala.collection.mutable.Map[String, Long]()
      for ((w, syms) <- reprs; i <- 0 until syms.length - 1)
        counts(syms(i) + " " + syms(i + 1)) =
          counts.getOrElse(syms(i) + " " + syms(i + 1), 0L) + words(w)
      if (counts.isEmpty) done = true
      else {
        val (pair, f) = counts.toSeq.minBy { case (p, c) => (-c, p) }
        merges += ((t, pair, f))
        val Array(p1, p2) = pair.split(" ", 2)
        reprs = reprs.map { case (w, syms) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
              out += p1 + p2; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> out.toSeq
        }
        t += 1
      }
    }
    (merges.toSeq, reprs)
  }

  private def bpeCheck(words: Map[String, Long], steps: Int): Unit = {
    import spark.implicits._
    val rows = words.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
    val d = rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (gotMerges, gotVocab) = Bpe.train(d, "text", steps)
    val (wantMerges, wantReprs) = bpeRef(words, steps)
    assert(gotMerges == wantMerges,
      s"merge tables differ:\n got $gotMerges\nwant $wantMerges")
    val gotReprs = gotVocab.select("word", "repr").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gotReprs == wantReprs.map { case (w, s) => w -> s.mkString(" ") },
      s"final reprs differ for ${words.keys}")
  }

  test("BPE training matches a classic array-based reference on a hand corpus") {
    // "lo" merges first (low+lower+lowest share it) — the Sennrich example
    bpeCheck(Map("low" -> 5L, "lower" -> 2L, "lowest" -> 2L, "newer" -> 6L,
      "wider" -> 3L), steps = 6)
  }

  test("BPE fuzz: doubled-separator string merges equal the array reference") {
    val rnd = new scala.util.Random(7)
    val alpha = "ab1"
    for (round <- 0 until 3) {
      val words = (0 until 30).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }.distinct.map(w => w -> (1L + rnd.nextInt(4))).toMap
      bpeCheck(words, steps = 6)
    }
  }

  test("BPE batched rounds == sequential rounds merge-for-merge") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = (0 until 40).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (0 until len).map(_ => "abc2"(rnd.nextInt(4))).mkString
    }.distinct.map(w => w -> (1L + rnd.nextInt(5)))
    val d = words.zipWithIndex.map { case ((w, _), i) => (i.toLong, w) }.toDF("doc_id", "text")
    val dd = words.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (seq1, _) = Bpe.train(dd, "text", steps = 10, maxBatch = 1)
    val (bat8, _) = Bpe.train(dd, "text", steps = 10, maxBatch = 8)
    assert(bat8 == seq1, s"batched diverged:\n got $bat8\nwant $seq1")
    assert(d.count() > 0) // keep both frames materialized paths exercised
  }

  test("BPE selectBatch: disjoint prefix, strict stop at shared-symbol count") {
    // shared symbol stops the batch; equal-count shared pair trims to strict
    val top = Seq(("a b", 10L), ("c d", 9L), ("a x", 9L), ("e f", 8L))
    assert(Bpe.selectBatch(top, want = 4, listComplete = true) == Seq(("a b", 10L)))
    // no sharing anywhere and a complete list: the whole prefix is safe
    val disjoint = Seq(("a b", 10L), ("c d", 9L), ("e f", 8L))
    assert(Bpe.selectBatch(disjoint, want = 4, listComplete = true) == disjoint)
    // incomplete list: uncollected pairs may tie the tail — trim to strict
    assert(Bpe.selectBatch(disjoint, want = 4, listComplete = false) ==
      Seq(("a b", 10L), ("c d", 9L)))
    // want caps the batch even when more would be safe
    assert(Bpe.selectBatch(disjoint, want = 1, listComplete = true) == Seq(("a b", 10L)))
  }

  test("Z-order layout skips a 2-D box query measurably better than linear sort") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"),
        floor(col("value")).cast("long").as("vb"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // both layouts: a global sort -> each output file covers a contiguous
    // range of the sort key; only the KEY differs
    // cap records per file so the sorted stream splits into many files,
    // each covering a contiguous key range (AQE otherwise coalesces the
    // small fixture into one file and there is nothing to skip)
    ZOrder.zorderBy(e, col("user_id"), col("vb"))
      .write.option("maxRecordsPerFile", 512).parquet(s"$base/z")
    e.orderBy("event_id")
      .write.option("maxRecordsPerFile", 512).parquet(s"$base/linear")
    // per-file min/max boxes straight from the data (what parquet footers
    // hold), one job per layout
    def boxes(dir: String) = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("vb").as("vlo"), max("vb").as("vhi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // query box: users 10-40, value-buckets 50-150 (~20% of each dimension)
    val (ul, uh, vl, vh) = (10L, 40L, 50L, 150L)
    def intersecting(bs: Array[(Long, Long, Long, Long)]) =
      bs.count { case (ulo, uhi, vlo, vhi) =>
        ulo <= uh && uhi >= ul && vlo <= vh && vhi >= vl
      }
    val (zb, lb) = (boxes(s"$base/z"), boxes(s"$base/linear"))
    val (zHit, lHit) = (intersecting(zb), intersecting(lb))
    // linear-by-id files span the whole (user, value) space — no skipping;
    // z-files cover small 2-D boxes — most must be prunable
    assert(zHit < lHit,
      s"z-order skipped nothing: $zHit/${zb.length} vs linear $lHit/${lb.length}")
    assert(zHit <= zb.length / 2,
      s"z-order pruned under half: $zHit/${zb.length}")
    // layout changes bytes on disk, never the relation
    def rows(dir: String) = spark.read.parquet(dir)
      .where(col("user_id").between(ul, uh) && col("vb").between(vl, vh))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows(s"$base/z") == rows(s"$base/linear"))
  }

  test("KMV overlap: undersized unions give exact Jaccard, sketches track truth") {
    import spark.implicits._
    // 3 shared of 9 union tokens, far below k -> the exact path
    val tiny = Seq(
      (1L, "A", "a b c d e f"),
      (2L, "B", "d e f g h i")).toDF("doc_id", "src", "text")
    val t = Sketch.kmvOverlapTokens(tiny, "src", "text", 512).collect()
    assert(t.length == 1)
    assert(t(0).getLong(2) == 3L && t(0).getDouble(3) == 3.0 / 9.0, t(0).toString)
    // fixture: sketched estimate within 0.15 absolute of the exact Jaccard
    val d = docs
    val est = Sketch.kmvOverlapTokens(d, "lang", "text", 512)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val sets = d.select(col("lang"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
      .distinct().collect()
      .groupBy(_.getString(0)).map { case (g, rs) => g -> rs.map(_.getString(1)).toSet }
    for (((a, b), e) <- est) {
      val exact = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      assert(math.abs(e - exact) < 0.15, s"($a,$b): est $e vs exact $exact")
    }
  }

  test("bucketed co-located join: zero exchanges, equals the plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_totalprice"))
    val customer = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    val base = java.nio.file.Files.createTempDirectory("bktspec").toString
    Bucketing.writeBucketed(orders, "bkt_spec_orders", s"$base/o", "custkey", 4)
    Bucketing.writeBucketed(customer, "bkt_spec_customer", s"$base/c", "custkey", 4)
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      // force the join shape a 100 TB run would face: neither side fits in
      // memory, so broadcast is off — bucketing alone must kill the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val j = Bucketing
        .colocatedJoin(spark, "bkt_spec_orders", "bkt_spec_customer", "custkey")
        .groupBy("custkey").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join + agg still shuffles:\n$plan")
      val got = j.orderBy("custkey").collect().toSeq
      val want = orders.join(customer, "custkey")
        .groupBy("custkey").agg(count(lit(1)).as("n"))
        .orderBy("custkey").collect().toSeq
      assert(got == want)
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore("spark.sql.autoBroadcastJoinThreshold", prev)
      restore("spark.sql.adaptive.autoBroadcastJoinThreshold", prevA)
      spark.sql("DROP TABLE IF EXISTS bkt_spec_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_spec_customer")
    }
  }

  test("count-min sketch: one-sided error, no false negatives, exact when collision-free") {
    import spark.implicits._
    // skewed hand corpus: "hot pair" dominates, tail grams are rare
    val df = (Seq.fill(40)("hot pair") ++
      Seq("cold one", "cold two", "cold three", "rare gram here"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val exact = df
      .select(explode(graft.functions.MinHashExpr.shinglesArray(lower(col("text")), 2)).as("g"))
      .where(instr(col("g"), " ") > 0)
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val total = exact.values.sum
    val phiInv = 4 // heavy = cnt >= total/4: only "hot pair" qualifies
    // tiny width forces collisions: the overestimate law must still hold
    val squeezed = Sketch.cmsHeavyHitters(df, "text", n = 2, phiInv = phiInv,
      depth = 2, width = 2).as[(String, Long, Long)].collect()
    assert(squeezed.nonEmpty)
    squeezed.foreach { case (g, cnt, est) =>
      assert(cnt == exact(g), s"exact count wrong for $g")
      assert(est >= cnt, s"CMS must overestimate: $g est=$est cnt=$cnt")
    }
    // no false negatives regardless of width: every true heavy hitter survives
    val trueHeavy = exact.filter { case (_, c) => c.toDouble >= total.toDouble / phiInv }.keySet
    assert(trueHeavy == Set("hot pair"))
    assert(trueHeavy.subsetOf(squeezed.map(_._1).toSet))
    // wide sketch: 5 grams in 64 buckets × 4 rows — md5 is collision-free
    // here, so estimates are EXACT and the output is exactly the heavy set
    val wide = Sketch.cmsHeavyHitters(df, "text", n = 2, phiInv = phiInv,
      depth = 4, width = 64).as[(String, Long, Long)].collect()
    assert(wide.map(_._1).toSet == trueHeavy)
    wide.foreach { case (g, cnt, est) => assert(est == cnt, s"collision-free est must be exact: $g") }
  }

  test("DSIR importance weights: target-like docs outscore off-target docs") {
    import spark.implicits._
    // target slice (is_en) writes about grams A; off-target about grams B;
    // two probe docs are pure-A and pure-B — A-probe must score higher.
    // Texts are long enough that gram totals EXCEED the 1024 smoothing
    // buckets (the operator's intended regime: corpus >> B; a
    // smoothing-dominated corpus shrinks every ratio toward p_t/p_r < 1)
    def rep(s: String, n: Int) = Seq.fill(n)(s).mkString(" ")
    val corpus = Seq(
      (1L, "en", rep("alpha beta", 200)),
      (2L, "en", rep("alpha beta gamma", 150)),
      (3L, "de", rep("zeta eta", 200)),
      (4L, "de", rep("zeta eta theta", 150)),
      (10L, "xx", rep("alpha beta", 40)), // pure target-style
      (11L, "xx", rep("zeta eta", 40)) // pure off-target-style
    ).toDF("doc_id", "lang", "text")
    val w = Dsir.importanceWeights(corpus, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(10L) > 0, s"target-like probe should have positive weight, got ${w(10L)}")
    assert(w(11L) < 0, s"off-target probe should have negative weight, got ${w(11L)}")
    assert(w(10L) > w(11L))
    // weights are per-gram sums: a doc repeating the same grams scales its
    // weight with length, so normalize-by-n_grams ordering also holds
    assert(w(1L) > w(3L))
  }

  test("RRF fusion: both-list docs beat single-list docs; exact reciprocal sums") {
    import spark.implicits._
    val lex = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((2L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val got = Search.rrfFuse(lex, sem, "doc_id", k = 10)
      .select("doc_id", "rrf").as[(Long, Double)].collect().toMap
    def r(k: Long) = 1.0 / (60.0 + k)
    def rnd6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got(2L) == rnd6(r(2) + r(1))) // in both lists
    assert(got(1L) == rnd6(r(1))) // lex only
    assert(got(4L) == rnd6(r(2))) // sem only
    // doc 2 (ranked 2nd + 1st) must beat doc 1 (ranked 1st in one list)
    assert(got(2L) > got(1L))
  }

  test("fuzzy match equals all-pairs brute force; short strings take the brute branch") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // fixture dictionary: operator == brute force over all distinct names
    val parts = graft.Tables.part(spark, "/root/testdata/sf0.001")
    val got = Linkage.fuzzyMatch(parts, "p_name", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    val dict = parts.select("p_name").distinct().as[String].collect()
    val brute = (for {
      x <- dict; y <- dict if x < y
      d = lev(x, y) if d <= 2
    } yield (x, y, d.toLong)).toSet
    assert(brute.nonEmpty && got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    // strings below q*(d+1)=6 chars are un-prunable — the explicit brute
    // branch must still pair them (and mixed short/long pairs ride the
    // gram path when the longer side reaches the bound)
    val hand = Seq("ab", "ac", "abcd", "abcdefgh", "abcdefgi").toDF("n")
    val hg = Linkage.fuzzyMatch(hand, "n", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(hg.contains(("ab", "ac", 1L)), hg.toString)
    assert(hg.contains(("ab", "abcd", 2L)), hg.toString)
    assert(hg.contains(("abcdefgh", "abcdefgi", 1L)), hg.toString)
  }

  test("cluster representatives: score argmax with id tie-break, member counts") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val scored = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 2L), (11L, 7L))
      .toDF("doc_id", "n_chars")
    val got = Dedup.clusterRepresentatives(clusters, scored, "doc_id", "n_chars")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // cluster 1: scores (5,9,9) → id 2 wins the 9-tie; cluster 10: id 11
    assert(got == Seq((1L, 2L, 9L, 3L), (10L, 11L, 7L, 2L)), got.toString)
  }

  test("group split: every group lands whole in exactly one split") {
    import spark.implicits._
    val out = Sampling.groupSplit(docs, "doc_id", "source")
    val perSource = out.groupBy("source")
      .agg(count_distinct(col("split")).as("k"))
      .as[(String, Long)].collect()
    assert(perSource.nonEmpty && perSource.forall(_._2 == 1L),
      "a source straddles splits — leakage")
    // doc-level assignment DOES straddle sources (what group split prevents)
    val docLevel = docs.select(col("source"),
      Sampling.splitOf(col("doc_id")).as("split"))
      .groupBy("source").agg(count_distinct(col("split")).as("k"))
      .as[(String, Long)].collect()
    assert(docLevel.exists(_._2 > 1L), "fixture too small to show the contrast")
  }

  test("MAD outliers: extreme value flagged, uniform group clean, median robust") {
    import spark.implicits._
    val df = Seq(
      ("a", 10.0), ("a", 10.0), ("a", 11.0), ("a", 9.0), ("a", 1000.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)
    ).toDF("grp", "v")
    val got = Robust.madOutliers(df, "grp", "v")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // the 1000.0 cannot drag the median: med=10, MAD=median(0,0,1,1,990)=1
    assert(got("a")._4 == 10.0 && got("a")._5 == 1.0)
    assert(got("a")._3 == 1L, s"exactly the extreme value flags: ${got("a")}")
    assert(got("b")._3 == 0L && got("b")._5 == 0.0)
  }

  test("Kneser-Ney matches an independent reference; continuation beats raw frequency") {
    import spark.implicits._
    // the "san francisco" corpus: "francisco" is FREQUENT but follows only
    // one context; "day" is rarer overall but follows many contexts
    val docs = Seq(
      (1L, "san francisco san francisco san francisco"),
      (2L, "nice day good day long day rainy day"),
      (3L, "one day in san francisco"))
    val got = TextAnalysis.knLogprob(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // independent reference: plain-collections interpolated KN
    val D = 0.75
    val bgs = docs.flatMap { case (id, t) =>
      val w = t.split("\\s+"); w.sliding(2).map(p => (id, p.mkString(" "))).toSeq
    }
    val c12 = bgs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum).toMap
    val n1p = c12.groupBy(_._1.split(" ")(0)).view.mapValues(_.size).toMap
    val nHist = c12.groupBy(_._1.split(" ")(1)).view.mapValues(_.size).toMap
    val nTypes = c12.size
    def rnd4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def nll(bg: String): BigDecimal = {
      val Array(w1, w2) = bg.split(" ")
      val p = (math.max(c12(bg) - D, 0.0) +
        D * n1p(w1) * (nHist(w2).toDouble / nTypes.toDouble)) / c1(w1)
      rnd4(-math.log(p))
    }
    for ((id, _) <- docs) {
      val doc = bgs.filter(_._1 == id).map(_._2)
      val want = (doc.map(nll).sum / doc.size).toDouble
      assert(math.abs(got(id)._2 - want) < 1e-9,
        s"doc $id: got ${got(id)._2}, reference $want")
      assert(got(id)._1 == doc.size.toLong)
    }
    // the KN signature: p(francisco | san) is near 1 - D/c1 territory yet
    // pcont(francisco) < pcont(day) despite francisco being more frequent
    assert(nHist("francisco") < nHist("day"))
  }

  test("token entropy: zero for repetition, ln(n) for uniform, order-invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, "x x x x x x"), // repetition → H = 0
      (2L, "a b c d"), // uniform → ln(4)
      (3L, "d c b a") // permutation of 2 → same entropy
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) == 0.0, s"repeated token must have zero entropy: ${got(1L)}")
    assert(math.abs(got(2L) - math.log(4.0)) < 1e-9)
    assert(got(2L) == got(3L), "entropy must be order-invariant")
  }

  test("MMR picks the diverse candidate over the redundant near-dup") {
    import spark.implicits._
    // q; a1/a2 near-identical and most query-aligned; b less aligned but
    // diverse. Pure relevance ranks (q, a1, a2); MMR at λ=0.7 must demote
    // a2 (its redundancy to a1 ≈ 1) and pick b third.
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.95f, 0.3122499f, 0f, 0f)),
      (2L, Seq(0.94f, 0.3411744f, 0f, 0f)),
      (3L, Seq(0.8f, -0.36f, 0.48f, 0f))
    ).toDF("vec_id", "embedding")
    val mmr = Similarity.mmrTopK(vecs, "vec_id", "embedding", queryId = 0L, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(mmr == Seq(1L, 3L, 2L), s"expected diversified (1,3,2), got $mmr")
    val rel = Similarity.cosineTopK(vecs, "vec_id", "embedding", 0L, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(rel == Seq(0L, 1L, 2L), s"relevance-only baseline should be (0,1,2), got $rel")
    // scores strictly decrease along the greedy sequence
    val scores = Similarity.mmrTopK(vecs, "vec_id", "embedding", 0L, 3)
      .select("score").as[Double].collect().toSeq
    assert(scores == scores.sorted.reverse && scores.distinct == scores)
  }

  test("JL projection: one-pass expression equals Column reference; distances preserved") {
    import spark.implicits._
    val k = 16
    val fast = emb.select(col("vec_id"),
      graft.functions.ProjectExpr.project(col("embedding"), Similarity.planes(k, 64, 7)).as("p"))
    val ref = emb.select(col("vec_id"),
      Similarity.jlProjectColumns(col("embedding"), k, 64, 7).as("p"))
    assert(fast.orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq ==
      ref.orderBy("vec_id").as[(Long, Seq[Double])].collect().toSeq,
      "expression and Column forms disagree")
    // JL property on the fixture: scaled projected distance² vs original
    // distance² for sampled pairs — individual ratios land in a loose band,
    // the mean lands near 1 (E[ratio] = 1 for Rademacher projections)
    val vecs = emb.select("vec_id", "embedding").as[(Long, Seq[Float])]
      .collect().sortBy(_._1).take(40).map(_._2.map(_.toDouble).toArray)
    val projs = fast.orderBy("vec_id").as[(Long, Seq[Double])]
      .collect().take(40).map(_._2.map(_ / math.sqrt(k.toDouble)).toArray)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for { i <- 0 until 40; j <- (i + 1) until 40 }
      yield d2(projs(i), projs(j)) / d2(vecs(i), vecs(j))
    assert(ratios.forall(r => r > 0.15 && r < 4.0),
      s"distortion outside loose JL band: min=${ratios.min} max=${ratios.max}")
    assert(math.abs(ratios.sum / ratios.size - 1.0) < 0.25,
      s"mean distortion should be ~1, got ${ratios.sum / ratios.size}")
  }

  test("phrase search: overlaps, repeated terms, whitespace runs, boundary matches") {
    import spark.implicits._
    val df = Seq(
      (1L, "x stream table hash y"), // one occurrence mid-doc
      (2L, "stream table hash stream table hash"), // two, incl. at both ends
      (3L, "stream  table\thash"), // whitespace runs still tokenize
      (4L, "stream table stream hash"), // near-miss: no adjacency
      (5L, "table hash stream"), // all terms, wrong order
      (6L, "") // empty doc
    ).toDF("doc_id", "text")
    val got = Search.phraseSearch(df, "doc_id", "text", Seq("stream", "table", "hash"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // repeated-term phrase with overlapping occurrences: "a a a a" has
    // three starts of "a a"
    val rep = Seq((1L, "a a a a"), (2L, "a b a")).toDF("doc_id", "text")
    val got2 = Search.phraseSearch(rep, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(got2 == Map(1L -> 3L))
  }

  test("length buckets: pow2 capacities, boundary and overlong docs, exact padding") {
    import spark.implicits._
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val df = Seq(
      (1L, words(10)), // → 16, pad 6
      (2L, words(16)), // boundary: fits 16 exactly, pad 0
      (3L, words(17)), // → 32, pad 15
      (4L, words(600)) // overlong: clamps to 512, pad 0
    ).toDF("doc_id", "text")
    val got = Sharding.lengthBuckets(df, "text")
      .select("bucket", "n_docs", "n_batches", "total_tokens", "padding")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((16L, 2L, 1L, 26L, 6L), (32L, 1L, 1L, 17L, 15L),
      (512L, 1L, 1L, 512L, 0L)), got.toString)
  }

  test("hamming rerank: exact self-hit, packed sign signatures, candidate recall") {
    import spark.implicits._
    // hand vector with a known sign pattern: dims 0 and 33 positive only
    val v = Array.fill(64)(-1.0f); v(0) = 1f; v(33) = 1f
    val one = Seq((1L, v.toSeq)).toDF("id", "vec")
    val sig = one.select(
      Similarity.binaryHalfSig(col("vec"), 0).as("lo"),
      Similarity.binaryHalfSig(col("vec"), 32).as("hi"))
      .as[(Long, Long)].head()
    assert(sig == ((1L, 2L)), s"expected (2^0, 2^1) halves, got $sig")

    val out = Similarity.hammingRerank(emb, "vec_id", "embedding",
      queryId = 1L, k = 10, candidates = 50)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(out.head == ((1L, 1.0)), s"query must rerank first: ${out.head}")
    // two-stage result ⊆ brute top-50 is not guaranteed, but recall vs the
    // brute top-10 should be substantial even on random vectors; pin a
    // conservative floor so a broken signature (recall ≈ k/N) fails loudly
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 1L, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = out.map(_._1).count(brute).toDouble / brute.size
    assert(recall >= 0.4, s"hamming-rerank recall@10 too low: $recall")
  }

  test("log-histogram quantiles: ≤10% error vs exact ranks, merge-by-addition law") {
    import spark.implicits._
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val out = Sketch.logHistQuantiles(events, "event_type", "value")
      .select("event_type", "n", "p50", "p95", "p99")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    val vals = events.select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect().filter(_._2 > 0)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { case (g, (_, n, p50, p95, p99)) =>
      assert(n == vals(g).length.toLong)
      Seq(0.5 -> p50, 0.95 -> p95, 0.99 -> p99).foreach { case (q, est) =>
        val exact = vals(g)(math.ceil(q * n).toInt - 1) // type-1 quantile
        assert(est <= exact + 1e-9, s"$g q$q: estimate $est above exact $exact")
        assert(exact < est * 1.1 + 1e-3, s"$g q$q: $est vs $exact breaks the 10% bound")
      }
    }

    // merge law: the histogram of a union IS the sum of the two halves'
    // histograms — quantiles from driver-side summed sub-histograms must
    // equal the operator's output on the full input
    def bucket(v: Double): Long = {
      val s = math.floor(v * 1000.0).toLong.toString
      (if (s.length <= 2) s else s.take(2).padTo(s.length, '0')).toLong
    }
    val (ha, hb) = {
      val rows = events.select(col("event_id"), col("event_type"), col("value").cast("double"))
        .as[(Long, String, Double)].collect().filter(_._3 > 0)
      val (a, b) = rows.partition(_._1 % 2 == 0)
      def h(rs: Array[(Long, String, Double)]) =
        rs.groupBy(r => (r._2, bucket(r._3))).view.mapValues(_.size.toLong).toMap
      (h(a), h(b))
    }
    val merged = (ha.keySet ++ hb.keySet).map { k =>
      k -> (ha.getOrElse(k, 0L) + hb.getOrElse(k, 0L))
    }.groupBy(_._1._1)
    merged.foreach { case (g, cells) =>
      val hist = cells.map { case ((_, lb), c) => lb -> c }.toSeq.sortBy(_._1)
      val n = hist.map(_._2).sum
      def est(q: Double): Double = {
        var cum = 0L
        hist.collectFirst { case (lb, c) if { cum += c; cum >= math.ceil(q * n) } => lb }
          .get.toDouble / 1000.0
      }
      val (_, nOut, p50, p95, p99) = out(g)
      assert(n == nOut && est(0.5) == p50 && est(0.95) == p95 && est(0.99) == p99,
        s"$g: merged sub-histograms disagree with the one-pass sketch")
    }
  }

  test("pagerank: hand-graph structure + plain-collections power-iteration reference") {
    import spark.implicits._
    // star A(1)-B(2), A-C(3) plus disjoint edge D(4)-E(5)
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Graph.pageRank(pairs, "id_a", "id_b", iters = 5)
      .select("id", "deg", "pagerank").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == 2L && out(2L)._1 == 1L)
    assert(out(2L)._2 == out(3L)._2, "symmetric leaves must tie exactly")
    assert(out(4L)._2 == out(5L)._2, "symmetric component must tie exactly")
    assert(out(1L)._2 > out(2L)._2, "star center must out-rank leaves")
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-6,
      s"rank mass must be conserved: ${out.values.map(_._2).sum}")

    // reference replica with the operator's exact arithmetic contract
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (4L, 5L), (5L, 4L))
    val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val n = deg.size
    var pr = deg.keys.map(id => id -> r12(1.0 / n)).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        r12(pr(s).toDouble / deg(s) * 0.85)
      }.sum).toMap
      pr = pr.keys.map(id => id -> (r12(0.15 / n) + in.getOrElse(id, BigDecimal(0)))).toMap
    }
    pr.foreach { case (id, p) =>
      assert(math.abs(out(id)._2 - p.toDouble) < 1e-12,
        s"node $id: ${out(id)._2} vs reference $p")
    }
  }

  test("naive-bayes classifier matches a plain-collections NB reference on the fixture") {
    import spark.implicits._
    val out = Classify.nbClassify(docs, "doc_id", "text", "lang", trainMod = 5)
      .select("doc_id", "pred_lang", "score").as[(Long, String, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    // independent reference with the operator's exact arithmetic contract:
    // round6(ln(...)) per weight, BigDecimal accumulation, label tie-break
    val corpus = docs.select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    def toks(t: String) = t.trim.toLowerCase.split("\\s+").toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val train = corpus.filter(_._1 % 5 != 0)
    val classCnt = train.flatMap { case (_, c, t) => toks(t).map(tok => (c, tok)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val classes = train.map(_._2).distinct.sorted
    val vocab = classCnt.keysIterator.map(_._2).toSet
    val nc = classes.map(c => c -> classCnt.collect { case ((`c`, _), n) => n }.sum).toMap
    val priors = {
      val dc = train.groupBy(_._2).view.mapValues(_.size).toMap
      val dt = train.length
      classes.map(c => c -> r6(math.log(dc(c).toDouble / dt))).toMap
    }
    val expect = corpus.map { case (id, _, t) =>
      val tf = toks(t).filter(vocab).groupBy(identity).view.mapValues(_.size).toMap
      val scored = classes.map { c =>
        val s = tf.map { case (tok, n) =>
          r6(math.log((classCnt.getOrElse((c, tok), 0L) + 1.0) / (nc(c) + vocab.size))) * n
        }.sum + priors(c)
        (c, s)
      }
      val (pc, ps) = scored.minBy { case (c, s) => (-s, c) }
      id -> ((pc, ps.toDouble))
    }.toMap
    assert(out.keySet == expect.keySet)
    out.foreach { case (id, (pc, ps)) =>
      assert(pc == expect(id)._1, s"doc $id: pred $pc vs reference ${expect(id)._1}")
      assert(math.abs(ps - expect(id)._2) < 1e-9, s"doc $id: score $ps vs ${expect(id)._2}")
    }
    // the fixture's lang/vocab correlation makes held-out accuracy beat chance
    val truth = corpus.map(r => r._1 -> r._2).toMap
    val held = corpus.collect { case (id, _, _) if id % 5 == 0 => id }
    val acc = held.count(id => out(id)._1 == truth(id)).toDouble / held.length
    assert(acc > 1.2 / classes.size, s"held-out accuracy $acc at chance level")
  }

  test("boilerplate strip: minDocs threshold, alignment-robust removal, lossless reassembly") {
    import spark.implicits._
    // a 150-token span shared by FOUR docs at four DIFFERENT offsets (CDC
    // boundaries are content-local, so the span's interior chunks match
    // regardless of offset); a second span shared by only TWO docs must
    // survive minDocs = 3
    val span = (0 until 150).map(i => s"b$i").mkString(" ")
    val rare = (0 until 150).map(i => s"c$i").mkString(" ")
    val rows =
      (0 until 4).map { i =>
        val pre = (0 to i * 7).map(j => s"p${i}x$j").mkString(" ")
        val post = (0 until 20).map(j => s"s${i}x$j").mkString(" ")
        (i.toLong, s"$pre $span $post")
      } ++ Seq(
        (10L, s"q0 q1 q2 $rare q3 q4"),
        (11L, s"r0 r1 $rare r2 r3"))
    val out = Boilerplate
      .stripBoilerplate(rows.toDF("doc_id", "text"), "doc_id", "text",
        k = 4, modulus = 16, minDocs = 3)
      .select("doc_id", "n_chunks", "n_removed", "kept_tokens", "clean_fp")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    (0 until 4).foreach { i =>
      assert(out(i.toLong)._3 > 0, s"doc $i: shared span's interior chunks not removed")
    }
    // the four docs' removed token counts agree on the span interior: every
    // doc loses the SAME shared chunks (offsets differ, content doesn't)
    val removedTokens = (0 until 4).map { i =>
      val (_, _, _, kept, _) = out(i.toLong)
      val total = rows(i)._2.split(" ").length
      total - kept
    }
    assert(removedTokens.distinct.size == 1,
      s"offset-dependent removal: $removedTokens tokens removed per doc")
    Seq(10L, 11L).foreach { id =>
      val (_, _, nRemoved, kept, fp) = out(id)
      assert(nRemoved == 0L, s"doc $id: two-doc span removed below minDocs")
      val text = rows.find(_._1 == id).get._2
      assert(kept == text.split(" ").length.toLong)
      val expectFp = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(fp == expectFp, s"doc $id: reassembly not lossless")
    }
  }

  test("boilerplate strip matches driver-side brute force on the fixture corpus") {
    import spark.implicits._
    val out = Boilerplate.stripBoilerplate(docs, "doc_id", "text",
        k = 4, modulus = 16, minDocs = 3)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    // independent ground truth: chunk extents from cdcChunks, texts sliced
    // driver-side, boilerplate = chunk text in >= 3 distinct docs
    val toks = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val chunks = Chunking.cdcChunks(docs, "doc_id", "text", k = 4, modulus = 16)
      .select("doc_id", "start_pos", "end_pos").as[(Long, Long, Long)].collect()
      .map { case (id, s, e) => (id, toks(id).slice(s.toInt, e.toInt + 1).mkString(" ")) }
    val boiler = chunks.groupBy(_._2).filter(_._2.map(_._1).distinct.size >= 3).keySet
    val expect = chunks.groupBy(_._1).map { case (id, cs) =>
      id -> cs.count(c => boiler(c._2)).toLong
    }
    assert(out == expect, "per-doc removed-chunk counts diverge from brute force")
    assert(expect.values.sum > 0, "fixture should exercise the removal path")
  }
}
