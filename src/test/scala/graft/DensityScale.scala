package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Auto-width density scale anchors (diagnostic main, not a spec): times
  * `hubnessAuto` / `lofOutliersAuto` at 1×, 10× and 100× replicas of the
  * sf0.1 embeddings (2k → 200k vectors) and prints the chosen band width
  * plus the measured candidate volume per row — the claim under test is
  * [[operators.Similarity.autoBandWidth]]'s budget law: candidates/row
  * bounded by the budget at every scale, wall time ~linear in n, where the
  * fixed-width operators are ∝ n² (their 100× point would be 10^10
  * candidate pairs — not run, that is the point).
  *
  * Replicas use the [[RecallPanel]] circular-shift construction (orthogonal
  * transform per replica): per-replica similarity structure is exactly the
  * original's, cross-replica directions are scrambled — density-honest.
  *
  *   sbt "Test/runMain graft.DensityScale"
  */
object DensityScale {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).appName("density-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb1 = spark.read.parquet(s"$base/embeddings.parquet")
    val span = emb1.agg(max(col("vec_id"))).head().getLong(0) + 1
    val dim = emb1.select(size(col("embedding"))).head().getInt(0)

    def replica(reps: Int): DataFrame = {
      val repDf = spark.range(reps).select(col("id").as("rep"))
      emb1.crossJoin(broadcast(repDf))
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)),
            i => element_at(col("embedding"), ((i + col("rep") * 7) % dim).cast("int") + 1)))
        .withColumn("vec_id", col("vec_id") + col("rep") * span)
        .drop("rep")
        .repartition(math.max(32, reps))
        .localCheckpoint()
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    println("| reps | n | width r | cand/row | t(hubness_auto) s | t(lof_auto) s |")
    println("|---|---|---|---|---|---|")
    for (reps <- Seq(1, 10, 100)) {
      val emb = replica(reps)
      val n = reps.toLong * span
      val r = operators.Similarity.autoBandWidth(n)
      val bands = operators.Similarity.planeBands(emb, "vec_id", "embedding", 4, r, dim)
      val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") =!= col("b.vec_id")).count()
      val tH = time(operators.Similarity.hubnessAuto(emb, "vec_id", "embedding", k = 5))
      val tL = time(operators.Similarity.lofOutliersAuto(emb, "vec_id", "embedding", k = 5))
      println(f"| ${reps}x | $n | $r | ${cand.toDouble / n}%.1f | $tH%.1f | $tL%.1f |")
    }

    // auto-scaled IVF build anchor: C = ⌈√n⌉ cells, sampled training —
    // the claims under test are (a) driver state stays at C·dim doubles,
    // (b) training scans ≤ sampleBudget rows regardless of n, (c) the
    // full-corpus assignment is the only n-proportional pass (n·C
    // comparisons, scan-parallel, no shuffle)
    println()
    println("| reps | n | C | sample mod | train rows | driver doubles | t(ivf_auto build) s |")
    println("|---|---|---|---|---|---|---|")
    for (reps <- Seq(1, 10, 100)) {
      val emb = replica(reps)
      val n = reps.toLong * span
      val c = operators.Similarity.autoCellCount(n)
      val m = operators.Similarity.autoSampleMod(n)
      val t0 = System.nanoTime()
      val (cents, index) = operators.Similarity.ivfTrainedAuto(
        emb, "vec_id", "embedding", kmeansIters = 1)
      index.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      val trainRows = (n + m - 1) / m
      println(f"| ${reps}x | $n | $c | $m | $trainRows | ${cents.length * dim} | $t%.1f |")
    }

    // WRITTEN-index probe anchor: the round-10 served path — the auto index
    // persisted cluster-partitioned (writeIvfIndex), probes pruned by
    // cluster IN (...) literals. The claim under test: probe wall time is
    // ∝ w/C of the WRITTEN index (files read scale with the probe count at
    // a fixed index), because partition pruning makes the scan itself
    // w/C-sized — the 100 TB serving-cost story, measured.
    println()
    println("| reps | n | C | w | files read/total | t(served probe) s |")
    println("|---|---|---|---|---|---|")
    for (reps <- Seq(10)) {
      val emb = replica(reps)
      val (cents, index) = operators.Similarity.ivfTrainedAuto(
        emb, "vec_id", "embedding", kmeansIters = 1)
      val dirIdx = java.nio.file.Files.createTempDirectory("ds_ivf_idx").toString
      operators.Similarity.writeIvfIndex(index, dirIdx)
      val n = reps.toLong * span
      val c = cents.length
      val qv = emb.where(col("vec_id") === 0L)
        .select("embedding").head().getSeq[Float](0)
      def leafCount(d: java.io.File): Int = {
        val kids = Option(d.listFiles()).getOrElse(Array.empty)
        kids.count(f => f.isFile && f.getName.endsWith(".parquet")) +
          kids.filter(_.isDirectory).map(leafCount).sum
      }
      val total = leafCount(new java.io.File(dirIdx))
      for (w <- Seq(c / 16, c / 4, c / 2).map(math.max(_, 2)).distinct) {
        val probes = operators.Similarity.nearestCentroidsDriver(cents, qv, w)
        val read = spark.read.parquet(dirIdx)
          .where(col("cluster").isin(probes: _*))
          .select(input_file_name()).distinct().count()
        val tP = time(operators.Similarity.ivfServedTopK(
          spark, dirIdx, cents, "vec_id", "embedding", qv, k = 10, nProbe = w))
        println(f"| ${reps}x | $n | $c | $w | $read/$total | $tP%.2f |")
      }

      // WRITTEN IVF-PQ serving anchor (round-11): BOTH tables on disk —
      // the ADC pass partition-prunes the CODE table (numSub small ints
      // per vector instead of dim floats) and the rerank point-reads the
      // float index. Claims measured: probe time ∝ w/C at code-table
      // byte-cost (disk sizes printed — the 8 B/vec story), answers from
      // written tables ≡ the in-session rerank (spec-pinned, not re-argued
      // here).
      val books = operators.Similarity.pqCodebooksAuto(
        emb, "vec_id", "embedding", subDim = 8)
      val codes = operators.Similarity.pqEncode(
        index, "vec_id", "embedding", books, carry = Seq("cluster"))
      val dirCodes = java.nio.file.Files.createTempDirectory("ds_ivfpq_codes").toString
      operators.Similarity.writeIvfPqCodes(codes, dirCodes)
      def dirBytes(d: java.io.File): Long = {
        val kids = Option(d.listFiles()).getOrElse(Array.empty)
        kids.filter(_.isFile).map(_.length).sum +
          kids.filter(_.isDirectory).map(dirBytes).sum
      }
      val idxMb = dirBytes(new java.io.File(dirIdx)) / 1e6
      val codeMb = dirBytes(new java.io.File(dirCodes)) / 1e6
      println()
      println(f"written float index $idxMb%.1f MB vs code table $codeMb%.1f MB " +
        f"(${idxMb / codeMb}%.1fx smaller scan target)")
      println("| reps | n | C | w | code files read/total | t(ivfpq served probe) s |")
      println("|---|---|---|---|---|---|")
      val totalCodeFiles = leafCount(new java.io.File(dirCodes))
      for (w <- Seq(c / 16, c / 4, c / 2).map(math.max(_, 2)).distinct) {
        val probes = operators.Similarity.nearestCentroidsDriver(cents, qv, w)
        val read = spark.read.parquet(dirCodes)
          .where(col("cluster").isin(probes: _*))
          .select(input_file_name()).distinct().count()
        val tP = time(operators.Similarity.ivfPqServedTopK(
          spark, dirCodes, dirIdx, cents, books, "vec_id", "embedding", qv,
          k = 10, nProbe = w, rerank = 200))
        println(f"| ${reps}x | $n | $c | $w | $read/$totalCodeFiles | $tP%.2f |")
      }
    }
    spark.stop()
  }
}
