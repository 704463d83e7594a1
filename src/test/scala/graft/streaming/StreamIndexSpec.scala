package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental index maintenance ([[StreamIndex]]): arriving vectors are
  * assigned to the existing auto-trained centroids per micro-batch, and
  * the drift monitor flags when arrivals stop fitting the trained cells.
  *
  * Pins:
  *   1. streamed incremental assignment ≡ the batch (re)build's assignment
  *     pass at the same centroids — bit-equal (vecId, cluster) across
  *     micro-batch splits, so appending streamed rows to the written index
  *     equals rebuilding it;
  *   2. the streamed union index serves probes identically to a batch
  *     index over the union corpus (StreamAnn over appended assignments);
  *   3. the drift trigger: in-distribution arrivals keep `retrain` false,
  *     an out-of-distribution burst (sign-flipped vectors — maximally far
  *     from every trained centroid in cosine space) flips it true.
  */
class StreamIndexSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-index-spec")
    .getOrCreate()

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("streamed incremental assignment is bit-equal to the batch rebuild's assignments") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    // train on the first 300 ids (the existing index); ids 300+ arrive on
    // the stream in three micro-batches
    val seen = emb.where(col("vec_id") < 300)
    val arriving = emb.where(col("vec_id") >= 300)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (cents, _) = graft.operators.Similarity.ivfTrainedAuto(
      seen, "vec_id", "embedding", kmeansIters = 1, sampleBudget = 200)

    val source = MemoryStream[(Long, Seq[Float])]
    val q = StreamIndex.assign(
        source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", cents)
      .writeStream.outputMode("append").format("memory")
      .queryName("si_assign").start()
    try {
      arriving.grouped(70).foreach { chunk =>
        source.addData(chunk: _*); q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT vecId, cluster FROM si_assign")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      // the batch rebuild's assignment pass at the SAME centroids
      val rebuilt = StreamIndex.assign(
          emb.where(col("vec_id") >= 300), "vec_id", "embedding", cents)
        .select("vecId", "cluster")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(streamed == rebuilt, "incremental assignment drifted from rebuild")
      assert(streamed.length == arriving.length)
    } finally q.stop()
  }

  test("a probe over the union (old index + streamed assignments) equals the batch union index probe") {
    import spark.implicits._
    val seen = emb.where(col("vec_id") < 300)
    val (cents, oldIndex) = graft.operators.Similarity.ivfTrainedAuto(
      seen, "vec_id", "embedding", kmeansIters = 1, sampleBudget = 200)
    // streamed-side assignments (batch form of the same projection — the
    // first test pinned stream ≡ batch for it), appended to the old index
    val appended = StreamIndex.assign(
        emb.where(col("vec_id") >= 300), "vec_id", "embedding", cents)
      .join(emb.select(col("vec_id").as("vecId"), col("embedding")), "vecId")
      .select(col("vecId").as("vec_id"), col("embedding"), col("cluster"))
    val unionIndex = oldIndex.unionByName(appended)
    // the batch "rebuild" at the same centroids: assign the WHOLE corpus
    val fullIndex = emb.select(col("vec_id"), col("embedding"),
      element_at(graft.functions.CentroidExpr.nearestCids(
        col("embedding"), cents, 1), 1).as("cluster"))
    for (qid <- Seq(0L, 42L, 350L, 499L)) {
      val a = graft.operators.Similarity.ivfTopKIndexed(cents, unionIndex,
          "vec_id", "embedding", qid, 10, nProbe = 6)
        .as[(Long, Double)].collect().toSeq
      val b = graft.operators.Similarity.ivfTopKIndexed(cents, fullIndex,
          "vec_id", "embedding", qid, 10, nProbe = 6)
        .as[(Long, Double)].collect().toSeq
      assert(a == b, s"qid=$qid union=$a full=$b")
    }
  }

  test("foreachBatch append grows the WRITTEN index: served probes equal the batch rebuild across 2 appends, files/cell bounded") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val seen = emb.where(col("vec_id") < 300)
    val (cents, oldIndex) = graft.operators.Similarity.ivfTrainedAuto(
      seen, "vec_id", "embedding", kmeansIters = 1, sampleBudget = 200)
    val dir = java.nio.file.Files.createTempDirectory("si_append_idx").toString
    val fullDir = java.nio.file.Files.createTempDirectory("si_append_full").toString
    val ckpt = java.nio.file.Files.createTempDirectory("si_append_ckpt").toString
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    try {
      graft.operators.Similarity.writeIvfIndex(oldIndex, dir)
      val arriving = emb.where(col("vec_id") >= 300)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
      val source = MemoryStream[(Long, Seq[Float])]
      val q = StreamIndex.appendToIndex(
          source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          cents, dir)
        .option("checkpointLocation", ckpt).start()
      val appends = try {
        val chunks = arriving.grouped(100).toSeq
        chunks.foreach { chunk => source.addData(chunk: _*); q.processAllAvailable() }
        chunks.length
      } finally q.stop()
      assert(appends >= 2, s"fixture must drive >=2 appends, got $appends")

      // the batch rebuild at the SAME centroids, written the batch way —
      // the grown table must serve identically (train-offline/serve-online:
      // appends between retrains never change an answer)
      val fullIndex = emb.select(col("vec_id"), col("embedding"),
        element_at(graft.functions.CentroidExpr.nearestCids(
          col("embedding"), cents, 1), 1).as("cluster"))
      graft.operators.Similarity.writeIvfIndex(fullIndex, fullDir)
      assert(spark.read.parquet(dir).count() == emb.count(),
        "append duplicated or dropped rows")
      val nProbe = graft.operators.Similarity.autoProbeCount(cents.length)
      def qvOf(qid: Long): Seq[Float] =
        emb.where(col("vec_id") === qid).select("embedding")
          .as[Seq[Float]].head()
      for (qid <- Seq(0L, 42L, 350L, 499L)) {
        val grown = graft.operators.Similarity.ivfServedTopK(spark, dir,
            cents, "vec_id", "embedding", qvOf(qid), 10, nProbe)
          .as[(Long, Double)].collect().toSeq
        val rebuilt = graft.operators.Similarity.ivfServedTopK(spark, fullDir,
            cents, "vec_id", "embedding", qvOf(qid), 10, nProbe)
          .as[(Long, Double)].collect().toSeq
        assert(grown == rebuilt, s"qid=$qid grown=$grown rebuilt=$rebuilt")
      }
      // file-count law under growth: initial write ≤2 files/cell, each
      // append adds AT MOST one file per touched cell (the per-batch
      // repartition) — never one per task per cell
      val cellDirs = Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("cluster="))
      val filesPerCell = cellDirs.map(d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet")))
      assert(filesPerCell.max <= 2 + appends,
        s"append file-count law broken: max ${filesPerCell.max} " +
          s"files/cell after $appends appends")

      // compaction closes the growth loop: oversized cells rewritten to 1
      // file, quiet cells untouched, rows + served answers bit-unchanged
      val before = spark.read.parquet(dir)
        .orderBy("vec_id").collect().map(_.toString).toSeq
      val nCompacted = graft.operators.Similarity.compactIvfCells(
        spark, dir, maxFilesPerCell = 1)
      assert(nCompacted >= 1, "no cell needed compaction — fixture too small")
      val filesAfter = cellDirs.map(d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet")))
      assert(filesAfter.max == 1,
        s"compaction left ${filesAfter.max} files in a cell")
      val after = spark.read.parquet(dir)
        .orderBy("vec_id").collect().map(_.toString).toSeq
      assert(after == before, "compaction changed the table's rows")
      for (qid <- Seq(0L, 350L)) {
        val grown = graft.operators.Similarity.ivfServedTopK(spark, dir,
            cents, "vec_id", "embedding", qvOf(qid), 10, nProbe)
          .as[(Long, Double)].collect().toSeq
        val rebuilt = graft.operators.Similarity.ivfServedTopK(spark, fullDir,
            cents, "vec_id", "embedding", qvOf(qid), 10, nProbe)
          .as[(Long, Double)].collect().toSeq
        assert(grown == rebuilt, s"post-compaction probe drifted: qid=$qid")
      }
    } finally { rm(new java.io.File(dir)); rm(new java.io.File(fullDir))
      rm(new java.io.File(ckpt)) }
  }

  test("replay guard: a re-delivered batch id is a no-op for the written tables") {
    import spark.implicits._
    // foreachBatch is at-least-once across crash-restarts — the writers
    // gate on a per-batch marker. Simulate redelivery by applying the same
    // (batch, batchId) twice through the guard exactly as the writers do.
    val seen = emb.where(col("vec_id") < 300)
    val (cents, oldIndex) = graft.operators.Similarity.ivfTrainedAuto(
      seen, "vec_id", "embedding", kmeansIters = 1, sampleBudget = 200)
    val dir = java.nio.file.Files.createTempDirectory("si_replay_idx").toString
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    try {
      graft.operators.Similarity.writeIvfIndex(oldIndex, dir)
      val batch = emb.where(col("vec_id") >= 300)
      def deliver(batchId: Long): Unit =
        if (!StreamIndex.batchCommitted(spark, dir, batchId)) {
          StreamIndex.appendBatch(batch, "vec_id", "embedding", cents, dir)
          StreamIndex.markCommitted(spark, dir, batchId)
        }
      deliver(7L)
      val afterFirst = spark.read.parquet(dir).count()
      assert(afterFirst == emb.count())
      deliver(7L) // the replay
      assert(spark.read.parquet(dir).count() == afterFirst,
        "replayed batch duplicated rows in the written index")
      deliver(8L) // a genuinely new batch still lands
      assert(spark.read.parquet(dir).count() > afterFirst)
    } finally rm(new java.io.File(dir))
  }

  test("streamed appends keep BOTH served tables fresh: IVF-PQ probe over grown written tables equals the rebuild") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val seen = emb.where(col("vec_id") < 300)
    val (cents, oldIndex) = graft.operators.Similarity.ivfTrainedAuto(
      seen, "vec_id", "embedding", kmeansIters = 1, sampleBudget = 200)
    // codebooks train on the SEEN corpus and stay fixed between retrains,
    // exactly like the centroids
    val books = graft.operators.Similarity.pqCodebooksAuto(
      seen, "vec_id", "embedding", subDim = 8, sampleBudget = 200)
    val idxDir = java.nio.file.Files.createTempDirectory("si_both_idx").toString
    val codeDir = java.nio.file.Files.createTempDirectory("si_both_code").toString
    val ckpt = java.nio.file.Files.createTempDirectory("si_both_ckpt").toString
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    try {
      graft.operators.Similarity.writeIvfIndex(oldIndex, idxDir)
      graft.operators.Similarity.writeIvfPqCodes(
        graft.operators.Similarity.pqEncode(oldIndex, "vec_id", "embedding",
          books, carry = Seq("cluster")), codeDir)
      val arriving = emb.where(col("vec_id") >= 300)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect().toSeq
      val source = MemoryStream[(Long, Seq[Float])]
      val q = StreamIndex.appendToIndexAndCodes(
          source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
          cents, books, idxDir, codeDir)
        .option("checkpointLocation", ckpt).start()
      try arriving.grouped(100).foreach { chunk =>
        source.addData(chunk: _*); q.processAllAvailable()
      } finally q.stop()
      assert(spark.read.parquet(codeDir).count() == emb.count())

      // the rebuild at the same artifacts: full-corpus assignment + encode
      val fullIndex = emb.select(col("vec_id"), col("embedding"),
        element_at(graft.functions.CentroidExpr.nearestCids(
          col("embedding"), cents, 1), 1).as("cluster"))
      val fullCodes = graft.operators.Similarity.pqEncode(
        fullIndex, "vec_id", "embedding", books, carry = Seq("cluster"))
      val nProbe = graft.operators.Similarity.autoProbeCount(cents.length)
      def qvOf(qid: Long): Seq[Float] =
        emb.where(col("vec_id") === qid).select("embedding")
          .as[Seq[Float]].head()
      for (qid <- Seq(0L, 42L, 350L, 499L)) {
        val grown = graft.operators.Similarity.ivfPqServedTopK(spark,
            codeDir, idxDir, cents, books, "vec_id", "embedding", qvOf(qid),
            k = 10, nProbe = nProbe, rerank = 50)
          .as[(Long, Double)].collect().toSeq
        val rebuilt = graft.operators.Similarity.ivfPqTopKRerank(cents,
            books, fullCodes, emb, "vec_id", "embedding", qid,
            k = 10, nProbe = nProbe, rerank = 50)
          .as[(Long, Double)].collect().toSeq
        assert(grown == rebuilt, s"qid=$qid grown=$grown rebuilt=$rebuilt")
      }
    } finally { rm(new java.io.File(idxDir)); rm(new java.io.File(codeDir))
      rm(new java.io.File(ckpt)) }
  }

  test("windowed drift monitor trips within one window where the cumulative mean is still diluted by history") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    // mild drift fixture: residual ≈ jitter²/2, so jitter 0.05 → baseline
    // b ≈ 0.00125 and jitter 0.05·√2 → 2b. Feed 400 in-distribution rows
    // then 200 drifted rows in 100-row batches: the cumulative mean is
    // (400·b + 200·2b)/600 = 1.33b — UNDER the 1.5b trigger (history
    // dilutes it; it would need 400 more drifted rows), while the trailing
    // 2×100-row windows see only drifted rows (mean 2b) and trip.
    val dim = 8
    def member(c: Int, jdim: Int, m: Float): Seq[Float] =
      Seq.tabulate(dim)(d =>
        (if (d == c) 1.0f else 0.0f) + (if (d == jdim) m else 0.0f))
    val cents: Array[(Long, Seq[Double])] =
      Array.tabulate(4)(c => (c.toLong, Seq.tabulate(dim)(d =>
        if (d == c) 1.0 else 0.0)))
    val train = (0 until 100)
      .map(i => (i.toLong, member(i % 4, 4 + i % 4, 0.05f)))
      .toDF("vec_id", "embedding")
    val baseline = StreamIndex.baselineResidual(train, "vec_id", "embedding", cents)
    val inDist = (100 until 500).map(i => (i.toLong, member(i % 4, 4 + i % 3, 0.05f)))
    val drifted = (1000 until 1200)
      .map(i => (i.toLong, member(i % 4, 4 + i % 3, (0.05 * math.sqrt(2)).toFloat)))

    val source = MemoryStream[(Long, Seq[Float])]
    val assigned = StreamIndex.assign(
        source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", cents)
      .as[StreamIndex.Assigned]
    val qw = StreamIndex.driftMonitorWindowed(assigned, "emb_idx", baseline,
        factor = 1.5, windowRows = 100, nWindows = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("si_driftw").start()
    val qc = StreamIndex.driftMonitor(assigned, "emb_idx", baseline, factor = 1.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("si_driftc").start()
    try {
      (inDist ++ drifted).grouped(100).foreach { chunk =>
        source.addData(chunk: _*)
        qw.processAllAvailable(); qc.processAllAvailable()
      }
      val win = spark.sql(
        "SELECT n, meanResidual, retrain FROM si_driftw ORDER BY n")
        .as[(Long, Double, Boolean)].collect().toSeq
      val cum = spark.sql(
        "SELECT n, meanResidual, retrain FROM si_driftc ORDER BY n")
        .as[(Long, Double, Boolean)].collect().toSeq
      // in-distribution prefix: both quiet
      assert(win.takeWhile(_._1 <= 400).forall(!_._3), s"windowed false-tripped: $win")
      assert(cum.takeWhile(_._1 <= 400).forall(!_._3), s"cumulative false-tripped: $cum")
      // after the 200 drifted rows: windowed trips (trailing windows are
      // all-drift), cumulative is still diluted below 1.5×baseline — the
      // unbounded-latency failure the windowed fold exists to fix
      assert(win.last._3,
        s"windowed monitor missed the shift: ${win.last} baseline=$baseline")
      assert(!cum.last._3,
        s"cumulative unexpectedly tripped (fixture drift too harsh): ${cum.last}")
      assert(cum.last._2 < baseline * 1.5 && win.last._2 > baseline * 1.5)
    } finally { qw.stop(); qc.stop() }
  }

  test("drift monitor: in-distribution arrivals stay quiet, an out-of-distribution burst trips retrain") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    // a CLUSTERED corpus (the regime where an IVF index is any good and
    // drift is a real event — the isotropic fixture has residual ≈ const
    // for every direction, so no trigger can or should separate anything
    // there): 4 tight axis clusters in 8 dims, in-distribution residual
    // ≈ 0.001; a uniform-direction burst sits at ≈ 0.65 from every
    // centroid.
    val dim = 8
    def member(c: Int, jitterDim: Int): Seq[Float] =
      Seq.tabulate(dim)(d =>
        (if (d == c) 1.0f else 0.0f) +
          (if (d == jitterDim) 0.05f else 0.0f))
    val cents: Array[(Long, Seq[Double])] =
      Array.tabulate(4)(c => (c.toLong, Seq.tabulate(dim)(d =>
        if (d == c) 1.0 else 0.0)))
    val trainCorpus = (0 until 100)
      .map(i => (i.toLong, member(i % 4, 4 + i % 4)))
      .toDF("vec_id", "embedding")
    val baseline = StreamIndex.baselineResidual(
      trainCorpus, "vec_id", "embedding", cents)
    assert(baseline > 0 && baseline < 0.01, s"clustered baseline $baseline")

    val inDist = (100 until 300).map(i => (i.toLong, member(i % 4, 4 + i % 3)))
    val outDist = (10000 until 10200)
      .map(i => (i.toLong, Seq.fill(dim)(1.0f / math.sqrt(dim).toFloat)))

    val source = MemoryStream[(Long, Seq[Float])]
    val assigned = StreamIndex.assign(
        source.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", cents)
      .as[StreamIndex.Assigned]
    val q = StreamIndex.driftMonitor(assigned, "emb_idx", baseline, factor = 1.5)
      .writeStream.outputMode("append").format("memory")
      .queryName("si_drift").start()
    try {
      source.addData(inDist.take(100): _*); q.processAllAvailable()
      source.addData(inDist.drop(100): _*); q.processAllAvailable()
      val quiet = spark.sql("SELECT retrain FROM si_drift")
        .collect().map(_.getBoolean(0)).toSeq
      assert(quiet.nonEmpty && quiet.forall(_ == false),
        s"in-distribution arrivals tripped retrain: $quiet")
      // the burst pulls the cumulative mean residual far past 1.5x baseline
      source.addData(outDist: _*); q.processAllAvailable()
      val last = spark.sql(
        "SELECT n, meanResidual, retrain FROM si_drift ORDER BY n").collect().last
      assert(last.getBoolean(2),
        s"drift burst did not trip retrain: n=${last.getLong(0)} " +
          s"mean=${last.getDouble(1)} baseline=$baseline")
    } finally q.stop()
  }
}
