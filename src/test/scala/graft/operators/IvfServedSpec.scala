package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WRITTEN ANN serving path ([[Similarity.writeIvfIndex]] +
  * [[Similarity.ivfServedTopK]]): the round-10 conversion of "at 100 TB the
  * index is a cluster-partitioned table so probing is partition pruning"
  * from build-operator comment to measured behavior.
  *
  * Three pins:
  *   1. the DRIVER probe ranking ([[Similarity.nearestCentroidsDriver]],
  *      which turns the probe list into partition-pruning literals) is
  *      bit-equal to the in-plan [[graft.functions.NearestCentroidsExpr]]
  *      ranking — the served path can never probe different cells;
  *   2. the served scan is PARTITION-PRUNED, and really: the files the scan
  *      reads (`input_file_name()`, post-pruning ground truth) are exactly
  *      the probed cells' files — fraction of the index read ≈ w/C;
  *   3. the served top-k is bit-equal to the checkpointed-index probe
  *      ([[Similarity.ivfTopKIndexed]]) for a panel of queries — layout
  *      changes bytes on disk, never the answer (the ZOrder contract).
  */
class IvfServedSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("ivf-served-spec")
    .getOrCreate()

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  private lazy val trained = Similarity.ivfTrainedAuto(
    emb, "vec_id", "embedding", kmeansIters = 1, sampleBudget = 200)

  private def qvOf(qid: Long): Seq[Float] = {
    import spark.implicits._
    emb.where(col("vec_id") === qid).select("embedding").as[Seq[Float]].head()
  }

  test("driver probe ranking is bit-equal to the in-plan NearestCentroidsExpr ranking") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val (cents, _) = trained
    val nProbe = Similarity.autoProbeCount(cents.length)
    // every 25th vector as a query panel — enough ties/near-ties in the
    // near-orthogonal fixture to exercise the tie-break, cheap to run
    val panel = emb.where(col("vec_id") % 25 === 0)
      .select(col("vec_id"),
        graft.functions.CentroidExpr.nearestCids(col("embedding"), cents, nProbe)
          .as("probes"),
        col("embedding"))
      .as[(Long, Seq[Long], Seq[Float])].collect()
    assert(panel.length >= 20)
    panel.foreach { case (qid, inPlan, qv) =>
      val onDriver = Similarity.nearestCentroidsDriver(cents, qv, nProbe)
      assert(onDriver == inPlan, s"qid=$qid driver=$onDriver inPlan=$inPlan")
    }
  }

  test("served probe partition-prunes: plan pin + measured files-read fraction = w/C") {
    val (cents, index) = trained
    val dir = java.nio.file.Files.createTempDirectory("ivf_served_idx").toString
    try {
      Similarity.writeIvfIndex(index, dir)
      val c = cents.length
      val nProbe = Similarity.autoProbeCount(c)
      val qv = qvOf(0L)
      val probes = Similarity.nearestCentroidsDriver(cents, qv, nProbe).toSet

      // (a) planning-time pin: the cluster IN (...) literals must land in
      // PartitionFilters (pruning), not PushedFilters (row filtering)
      val served = Similarity.ivfServedTopK(spark, dir, cents,
        "vec_id", "embedding", qv, k = 10, nProbe = nProbe)
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
        s"probe literals did not reach partition pruning:\n$plan")

      // (b) measured ground truth: the files the pruned scan actually reads
      // (input_file_name over the SAME pruned relation) are exactly the
      // probed cells' files — w of C directories, ≈ w/C of the index files
      val readFiles = spark.read.parquet(dir)
        .where(col("cluster").isin(probes.toSeq: _*))
        .select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0)).toSet
      def leafFiles(d: java.io.File): Seq[java.io.File] = {
        val kids = Option(d.listFiles()).getOrElse(Array.empty).toSeq
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(leafFiles)
      }
      val allFiles = leafFiles(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet"))
      val probedDirFiles = allFiles.filter(f =>
        probes.exists(p => f.getPath.contains(s"cluster=$p/")))
      assert(readFiles.forall(f => probes.exists(p => f.contains(s"cluster=$p/"))),
        s"scan read a non-probed cell's file: ${readFiles.find(f =>
          !probes.exists(p => f.contains(s"cluster=$p/")))}")
      assert(readFiles.size == probedDirFiles.length,
        s"scan read ${readFiles.size} files, probed dirs hold ${probedDirFiles.length}")
      val fraction = readFiles.size.toDouble / allFiles.length
      val share = nProbe.toDouble / c
      // the fixture writes ~1 file per cell directory, so the files-read
      // fraction tracks the cell share; allow one file of slack per side
      // for uneven file-per-dir splits
      assert(fraction <= share + 1.0 / allFiles.length,
        f"read fraction $fraction%.3f exceeds probe share $share%.3f " +
          s"(${readFiles.size}/${allFiles.length} files, $nProbe/$c cells)")
      assert(fraction < 0.5, s"pruning read most of the index: $fraction")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("panel probe: runtime pruning via DynamicPruningSubquery + per-query equality with the literal form") {
    import spark.implicits._
    val (cents, index) = trained
    val dir = java.nio.file.Files.createTempDirectory("ivf_served_panel").toString
    try {
      Similarity.writeIvfIndex(index, dir)
      val nProbe = Similarity.autoProbeCount(cents.length)
      val panel = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding"))
      val res = Similarity.ivfServedTopKPanel(spark, dir, cents,
        "vec_id", "embedding", panel, "qid", "embedding", k = 10, nProbe)

      // (a) the probe list is a RELATION, so pruning must arrive at runtime:
      // the index scan's PartitionFilters carry a dynamicpruning expression
      // on the partition column (planning-time literals are impossible here)
      val plan = res.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no DynamicPruningSubquery on the written-index scan:\n$plan")

      // (b) per-query equality with the driver-literal served probe — the
      // batched join changes WHEN pruning happens, never the answer
      val got = res.as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(h => (h._3, h._4)).toSeq).toMap
      val qids = panel.select("qid").as[Long].collect()
      assert(got.keySet == qids.toSet)
      qids.foreach { qid =>
        val one = Similarity.ivfServedTopK(spark, dir, cents,
            "vec_id", "embedding", qvOf(qid), k = 10, nProbe)
          .as[(Long, Double)].collect().toSeq
        assert(got(qid) == one, s"qid=$qid panel=${got(qid)} single=$one")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("written index file-count law: repartition-by-cluster writes ~1 file per cell") {
    val (_, index) = trained
    val dir = java.nio.file.Files.createTempDirectory("ivf_served_files").toString
    try {
      Similarity.writeIvfIndex(index, dir)
      val cellDirs = Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty).filter(d => d.isDirectory && d.getName.startsWith("cluster="))
      assert(cellDirs.nonEmpty)
      val filesPerCell = cellDirs.map(d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet")))
      // the round-10 shape was 31.6 files/cell (every write task emitted a
      // file per cell it held) — at cells ×10⁵, tasks ×10⁴ that is 10⁹
      // metastore entries. The repartition(col("cluster")) before the write
      // routes each cell to ONE task: files/cell must stay a small constant
      // (2 allows a spill split), independent of writer parallelism.
      assert(filesPerCell.max <= 2,
        s"files/cell law broken: max ${filesPerCell.max} (dirs=${cellDirs.length})")
      assert(filesPerCell.sum <= 2 * cellDirs.length)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("served IVF-PQ: written codes + written index, both scans pruned, bit-equal to the in-session rerank") {
    import spark.implicits._
    val (cents, index) = trained
    val books = Similarity.pqCodebooksAuto(emb, "vec_id", "embedding",
      subDim = 8, sampleBudget = 200)
    val codes = Similarity.pqEncode(index, "vec_id", "embedding", books,
      carry = Seq("cluster"))
    val idxDir = java.nio.file.Files.createTempDirectory("ivfpq_served_idx").toString
    val codeDir = java.nio.file.Files.createTempDirectory("ivfpq_served_code").toString
    try {
      Similarity.writeIvfIndex(index, idxDir)
      Similarity.writeIvfPqCodes(codes, codeDir)
      val nProbe = Similarity.autoProbeCount(cents.length)

      // files/cell law holds for the code table too
      val codeCells = Option(new java.io.File(codeDir).listFiles())
        .getOrElse(Array.empty).filter(d => d.isDirectory && d.getName.startsWith("cluster="))
      assert(codeCells.nonEmpty && codeCells.forall(d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet")) <= 2))

      for (qid <- Seq(0L, 17L, 101L, 333L)) {
        val qv = qvOf(qid)
        val served = Similarity.ivfPqServedTopK(spark, codeDir, idxDir,
          cents, books, "vec_id", "embedding", qv, k = 10,
          nProbe = nProbe, rerank = 50)
        // both scans carry the probe literals as PartitionFilters
        val plan = served.queryExecution.executedPlan.toString
        assert(plan.contains("PartitionFilters"),
          s"served IVF-PQ scans not partition-pruned:\n$plan")
        val servedRows = served.as[(Long, Double)].collect().toSeq
        val memRows = Similarity.ivfPqTopKRerank(cents, books,
            codes, emb, "vec_id", "embedding", qid, k = 10,
            nProbe = nProbe, rerank = 50)
          .as[(Long, Double)].collect().toSeq
        assert(servedRows == memRows, s"qid=$qid served=$servedRows mem=$memRows")
      }

      // panel face: a query relation over the same written tables — runtime
      // pruning (DynamicPruningSubquery on the broadcast probe join, since
      // probe lists are rows, not driver literals) and per-qid equality
      // with the single-query served form
      val panel = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding"))
      val panelRes = Similarity.ivfPqServedTopKPanel(spark, codeDir, idxDir,
        cents, books, "vec_id", "embedding", panel, "qid", "embedding",
        k = 10, nProbe = nProbe, rerank = 50)
      val panelPlan = panelRes.queryExecution.executedPlan.toString
      assert(panelPlan.contains("dynamicpruning"),
        s"no DynamicPruningSubquery on the written-codes panel scan:\n$panelPlan")
      val byQid = panelRes.as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(h => (h._3, h._4)).toSeq).toMap
      val qids = panel.select("qid").as[Long].collect()
      assert(byQid.keySet == qids.toSet)
      qids.foreach { qid =>
        val one = Similarity.ivfPqServedTopK(spark, codeDir, idxDir,
            cents, books, "vec_id", "embedding", qvOf(qid), k = 10,
            nProbe = nProbe, rerank = 50)
          .as[(Long, Double)].collect().toSeq
        assert(byQid(qid) == one, s"qid=$qid panel=${byQid(qid)} single=$one")
      }

      // measured ground truth on the code scan: the ADC pass reads only the
      // probed cells' CODE files (the 8 B/vec w/C claim, file-level)
      val probes = Similarity.nearestCentroidsDriver(cents, qvOf(0L), nProbe).toSet
      val readFiles = spark.read.parquet(codeDir)
        .where(col("cluster").isin(probes.toSeq: _*))
        .select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0)).toSet
      assert(readFiles.nonEmpty && readFiles.forall(f =>
        probes.exists(p => f.contains(s"cluster=$p/"))),
        s"code scan read a non-probed cell: $readFiles")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(idxDir)); rm(new java.io.File(codeDir))
    }
  }

  test("served top-k is bit-equal to the checkpointed-index probe for a query panel") {
    import spark.implicits._
    val (cents, index) = trained
    val dir = java.nio.file.Files.createTempDirectory("ivf_served_eq").toString
    try {
      Similarity.writeIvfIndex(index, dir)
      val nProbe = Similarity.autoProbeCount(cents.length)
      for (qid <- Seq(0L, 17L, 101L, 250L, 333L, 499L)) {
        val servedRows = Similarity.ivfServedTopK(spark, dir, cents,
            "vec_id", "embedding", qvOf(qid), k = 10, nProbe = nProbe)
          .as[(Long, Double)].collect().toSeq
        val memRows = Similarity.ivfTopKIndexed(cents, index,
            "vec_id", "embedding", qid, k = 10, nProbe = nProbe)
          .as[(Long, Double)].collect().toSeq
        assert(servedRows == memRows, s"qid=$qid served=$servedRows mem=$memRows")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }
}
