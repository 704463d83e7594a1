package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-scaled IVF build ([[Similarity.ivfTrainedAuto]]): the C = ⌈√n⌉
  * cell-count law, the id-mod sampled-training law, and — the load-bearing
  * pin — bit-equivalence of the scalable construction (one
  * `NearestCentroidsExpr` node, explicit seeds, sampled relation) with the
  * literal-struct construction ([[Similarity.ivfTrained]]) on the same
  * inputs, so swapping the board to the auto path can never change an
  * assignment the fixed path would have produced.
  */
class IvfAutoSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("ivf-auto-spec")
    .getOrCreate()

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("autoCellCount: the sqrt law, floor, cap, monotonicity") {
    import Similarity.autoCellCount
    // the exact values the fixture corpora and the 100x anchor resolve to
    assert(autoCellCount(500) == 23)    // verify corpus — the ivf_auto oracle
    assert(autoCellCount(2000) == 45)   // bench corpus
    assert(autoCellCount(200000) == 448) // DensityScale 100x anchor
    assert(autoCellCount(0) == 4 && autoCellCount(10) == 4, "floor")
    assert(autoCellCount(1L << 40) == (1 << 16), "cap bounds driver state")
    // monotone non-decreasing
    val pts = Seq(0L, 1L, 16L, 100L, 499L, 500L, 1999L, 2000L, 100000L, 1L << 34)
    pts.sliding(2).foreach { case Seq(a, b) =>
      assert(autoCellCount(a) <= autoCellCount(b), s"not monotone at $a->$b")
    }
  }

  test("autoSampleMod: smallest m with n/m <= budget") {
    import Similarity.autoSampleMod
    assert(autoSampleMod(500, 200) == 3) // the ivf_auto oracle's baked mod
    assert(autoSampleMod(500) == 1, "default 64k budget: fixture trains full")
    assert(autoSampleMod(200000) == 4)
    assert(autoSampleMod(0, 10) == 1 && autoSampleMod(10, 10) == 1)
    for (n <- Seq(1L, 7L, 1000L, 123457L); b <- Seq(1, 10, 1000)) {
      val m = autoSampleMod(n, b)
      assert((n + m - 1) / m <= b, s"sample exceeds budget: n=$n b=$b m=$m")
      assert(m == 1 || (n + (m - 1) - 1) / (m - 1) > b, s"m not minimal: n=$n b=$b m=$m")
    }
  }

  test("autoProbeCount: constant scan share, floor, and the oracle couplings") {
    import Similarity.autoProbeCount
    assert(autoProbeCount(23) == 6)   // the ivf_auto_topk oracle's baked probe
    assert(autoProbeCount(45) == 12 && autoProbeCount(142) == 36 &&
      autoProbeCount(448) == 112)     // bench corpus + DensityScale anchors
    assert(autoProbeCount(1) == 2 && autoProbeCount(4) == 2, "floor at 2")
    for (c <- Seq(8, 23, 100, 1000)) {
      val w = autoProbeCount(c)
      assert(w.toDouble / c >= 0.25 && (w - 1).toDouble / c < 0.25,
        s"share drifted from 1/4 at C=$c: w=$w")
    }
  }

  test("unsampled auto build is bit-identical to the literal-struct build at the same C") {
    spark.sparkContext.setLogLevel("WARN")
    // sampleBudget >= n ⇒ mod 1 ⇒ same seeds (first C ids), same training
    // relation — the only difference left is the construction path
    // (NearestCentroidsExpr + kmeansCentroidsFrom vs centroidSims structs +
    // kmeansCentroids). Equality here pins the expression's arithmetic and
    // tie-break to the struct form exactly.
    val c = Similarity.autoCellCount(500)
    val (centsAuto, idxAuto) =
      Similarity.ivfTrainedAuto(emb, "vec_id", "embedding", kmeansIters = 1)
    val (centsRef, idxRef) =
      Similarity.ivfTrained(emb, "vec_id", "embedding", nCentroids = c, kmeansIters = 1)
    assert(centsAuto.length == c && centsRef.length == c)
    assert(centsAuto.map(_._1).sameElements(centsRef.map(_._1)))
    centsAuto.zip(centsRef).foreach { case ((ida, va), (idr, vr)) =>
      assert(ida == idr && va == vr, s"centroid $ida drifted")
    }
    val a = idxAuto.select("vec_id", "cluster").orderBy("vec_id").collect()
    val r = idxRef.select("vec_id", "cluster").orderBy("vec_id").collect()
    assert(a.sameElements(r), "assignments drifted between construction paths")
  }

  test("NearestCentroidsExpr multi-assign matches the sort_array struct ranking") {
    import spark.implicits._
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 1)
    // the struct form probesExpr uses: sort (sim DESC, cid ASC), take top 3
    val structs = cents.map { case (cid, cv) =>
      struct(Similarity.cosine(col("embedding"), typedlit(cv)).as("sim"),
        lit(-cid).as("negcid"))
    }
    val expected = emb.select(col("vec_id"),
      transform(slice(sort_array(array(structs: _*), asc = false), 1, 3),
        s => -s.getField("negcid")).as("top"))
    val got = emb.select(col("vec_id"),
      graft.functions.CentroidExpr.nearestCids(col("embedding"), cents, 3).as("top"))
    val e = expected.orderBy("vec_id").as[(Long, Seq[Long])].collect()
    val g = got.orderBy("vec_id").as[(Long, Seq[Long])].collect()
    assert(e.sameElements(g), "multi-assign ranking drifted from the struct form")
  }

  test("sampled training: board-scale law values, full-corpus partition, deterministic") {
    import spark.implicits._
    // the exact configuration the ivf_auto board query runs at sf0.01
    val (cents, idx) = Similarity.ivfTrainedAuto(emb, "vec_id", "embedding",
      kmeansIters = 1, sampleBudget = 200)
    assert(cents.length == 23, "C = autoCellCount(500)")
    assert(cents.map(_._1).toSeq == (0L until 69L by 3L).toSeq,
      "seeds must be the first 23 sample ids (mod 3, below 69)")
    val rows = idx.select("vec_id", "cluster").as[(Long, Long)].collect()
    assert(rows.length == 500, "every corpus row assigned (not just the sample)")
    val cids = cents.map(_._1).toSet
    assert(rows.forall(r => cids.contains(r._2)), "assignment outside trained cells")
    assert(rows.map(_._2).distinct.length >= 10, "degenerate clustering")
    // bit-reproducible: the whole build is deterministic by construction
    val again = Similarity.ivfTrainedAuto(emb, "vec_id", "embedding",
      kmeansIters = 1, sampleBudget = 200)
      ._2.select("vec_id", "cluster").as[(Long, Long)].collect()
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("cluster-partitioned index: a probe prunes to the probed partitions") {
    import spark.implicits._
    // the 100 TB contract made concrete: ivfTrainedAuto's index written
    // partitionBy(cluster), probed with a cluster IN (...) predicate —
    // the scan must show partition pruning (only the probed directories
    // read), which is what makes probe cost ~w/C of the corpus.
    val (cents, index) = Similarity.ivfTrainedAuto(emb, "vec_id", "embedding",
      kmeansIters = 1, sampleBudget = 200)
    val dir = java.nio.file.Files.createTempDirectory("ivf_auto_idx").toString
    try {
      index.write.partitionBy("cluster").mode("overwrite").parquet(dir)
      val disk = spark.read.parquet(dir)
      val probes = Seq(0L, 3L, 6L) // 3 of the 23 cells
      val probed = disk.where(col("cluster").isin(probes: _*))
      val scan = probed.queryExecution.executedPlan.collectLeaves().head
      val partFilters = scan.toString
      assert(partFilters.contains("PartitionFilters") && partFilters.contains("cluster"),
        s"probe predicate did not reach partition pruning:\n$partFilters")
      // pruning is real, not cosmetic: the probed scan reads only the rows
      // of the 3 probed cells
      val expected = index.where(col("cluster").isin(probes: _*)).count()
      assert(probed.count() == expected && expected < index.count())
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("assignment plan: one scan-parallel projection, no join, no shuffle") {
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 0)
    val plan = emb.select(col("vec_id"),
      element_at(graft.functions.CentroidExpr.nearestCids(col("embedding"), cents, 1), 1)
        .as("cluster"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("nearest_centroids"), s"expression missing:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"assignment must be a scan-only projection:\n$plan")
  }
}
