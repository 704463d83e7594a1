package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The staged (parquet stage-table) corpus pipeline
  * ([[CorpusPipeline.staged]]) against its in-session checkpointed form
  * ([[CorpusPipeline.checkpointed]], the board's `pipeline_e2e`):
  *
  *   1. byte-equal final manifests — barrier strategy is materialization
  *      only, never the answer;
  *   2. resume semantics — a re-run with surviving stage tables reuses
  *      them verbatim (upstream `_SUCCESS` mtimes untouched) and only
  *      re-executes downstream of the deepest surviving stage;
  *   3. the re-run-from-stage-k cost table (printed; NOTES_r10 records the
  *      sf0.01 numbers) — the restartability economics that justify
  *      writing stages at 100 TB.
  */
class StagedPipelineSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("staged-pipeline-spec")
    .getOrCreate()

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  private def manifestRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("staged manifest is byte-equal to the checkpointed manifest; stages resume, not recompute") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("staged_pipe").toString
    try {
      def time[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (stagedRows, tFull) =
        time(manifestRows(CorpusPipeline.staged(docs, dir)))
      val checkRows = manifestRows(CorpusPipeline.checkpointed(docs))
      assert(stagedRows == checkRows,
        "staged and checkpointed manifests diverged")
      CorpusPipeline.stageNames.foreach { n =>
        assert(new java.io.File(s"$dir/$n/_SUCCESS").exists(),
          s"stage table $n missing after a full run")
      }

      // resume from ALL stages surviving: nothing re-executes upstream of
      // `chunks` — every _SUCCESS mtime is untouched and the manifest is
      // unchanged
      val mtimes = CorpusPipeline.stageNames
        .map(n => n -> new java.io.File(s"$dir/$n/_SUCCESS").lastModified()).toMap
      val (again, tResumeAll) = time(manifestRows(CorpusPipeline.staged(docs, dir)))
      assert(again == checkRows)
      CorpusPipeline.stageNames.foreach { n =>
        assert(new java.io.File(s"$dir/$n/_SUCCESS").lastModified() == mtimes(n),
          s"stage $n was rewritten on resume")
      }

      // resume from `kept`: delete clean+chunks — the re-run rebuilds ONLY
      // those two (their _SUCCESS is new, the first three are untouched)
      rm(new java.io.File(s"$dir/clean"))
      rm(new java.io.File(s"$dir/chunks"))
      val (third, tResumeKept) = time(manifestRows(CorpusPipeline.staged(docs, dir)))
      assert(third == checkRows)
      Seq("gated", "bands", "kept").foreach { n =>
        assert(new java.io.File(s"$dir/$n/_SUCCESS").lastModified() == mtimes(n),
          s"upstream stage $n was rewritten on resume-from-kept")
      }
      Seq("clean", "chunks").foreach { n =>
        assert(new java.io.File(s"$dir/$n/_SUCCESS").lastModified() > mtimes(n),
          s"downstream stage $n was not rebuilt")
      }
      info(f"re-run-from-stage-k cost (sf0.001): full $tFull%.1f s, " +
        f"resume-all(manifest only) $tResumeAll%.1f s, " +
        f"resume-from-kept $tResumeKept%.1f s")
      // the economics the stage tables buy: a resume must not pay the
      // full build again (generous bound — box noise safe)
      assert(tResumeAll < tFull, "resume-all cost >= full build")
    } finally rm(new java.io.File(dir))
  }

  test("bucketed stage tables: same manifest, exchange-free doc_id semi-joins, catalog re-attach on resume") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("staged_bkt").toString
    val tag = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    try {
      val bucketedRows = manifestRows(CorpusPipeline.stagedBucketed(docs, dir))
      val checkRows = manifestRows(CorpusPipeline.checkpointed(docs))
      assert(bucketedRows == checkRows,
        "bucketed-staged manifest diverged from checkpointed")

      // the layout's point: the band-slice semi-join (bands ⋈ kept ids,
      // read three times per pipeline run) plans with ZERO exchange when
      // both sides are doc_id-bucketed stage tables — the shuffle was paid
      // once at stage write. Broadcast disabled so the pin proves
      // BUCKETING, not small-table luck (the BucketingSpec discipline).
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val bands = spark.table(s"graft_stage_bands_$tag")
        val kept = spark.table(s"graft_stage_kept_$tag")
        val plan = bands
          .join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
          .queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-bucketed stage semi-join still shuffles:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

      // round-12 file-sizing pin (guide §6): the bucketed write clusters
      // by the bucket key first, so each stage table holds AT MOST one
      // file per bucket — not input-tasks × buckets crumbs (the band
      // stage measured 256 ~3 KB files before the fix)
      CorpusPipeline.stageNames.filter(_ != "chunks").foreach { n =>
        val files = Option(new java.io.File(s"$dir/$n").listFiles())
          .getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet"))
        assert(files <= 8, s"stage $n wrote $files files (> buckets)")
      }

      // new-session resume: the catalog entry is gone but the files
      // survive — the barrier re-attaches the bucket spec (metadata-only
      // DDL), nothing rewrites, the manifest is unchanged
      val keptSuccess = new java.io.File(s"$dir/kept/_SUCCESS")
      val mtime = keptSuccess.lastModified()
      CorpusPipeline.stageNames.foreach { n =>
        spark.sql(s"DROP TABLE IF EXISTS graft_stage_${n}_$tag")
      }
      val resumed = manifestRows(CorpusPipeline.stagedBucketed(docs, dir))
      assert(resumed == checkRows)
      assert(keptSuccess.lastModified() == mtime,
        "re-attach rewrote a surviving stage table")
      val replan = spark.table(s"graft_stage_bands_$tag")
        .join(spark.table(s"graft_stage_kept_$tag").select("doc_id"),
          Seq("doc_id"), "left_semi")
      val thr2 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert(!replan.queryExecution.executedPlan.toString.contains("Exchange"),
          "re-attached tables lost the bucket spec")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr2)
    } finally {
      CorpusPipeline.stageNames.foreach { n =>
        spark.sql(s"DROP TABLE IF EXISTS graft_stage_${n}_$tag")
      }
      rm(new java.io.File(dir))
    }
  }

  test("interrupted bucketed stage write: stray committed files without _SUCCESS are cleared, not absorbed") {
    val dir = java.nio.file.Files.createTempDirectory("staged_bkt_int").toString
    val tag = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    try {
      // simulate a killed earlier attempt: the `kept` stage directory holds
      // a committed parquet file (real rows!) but no _SUCCESS marker — the
      // rewrite must clear it, or the re-created external table would count
      // those rows twice
      val keptDir = new java.io.File(s"$dir/kept")
      assert(keptDir.mkdirs())
      docs.limit(7).select("doc_id", "text", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/kept_tmp")
      val part = Option(new java.io.File(s"$dir/kept_tmp").listFiles())
        .getOrElse(Array.empty).find(_.getName.endsWith(".parquet")).get
      val stray = new java.io.File(keptDir, "part-stray.parquet")
      java.nio.file.Files.copy(part.toPath, stray.toPath)
      assert(!new java.io.File(keptDir, "_SUCCESS").exists())

      val rows = manifestRows(CorpusPipeline.stagedBucketed(docs, dir))
      assert(rows == manifestRows(CorpusPipeline.checkpointed(docs)),
        "stray pre-crash files leaked into the rebuilt bucketed stage")
      assert(!new java.io.File(keptDir, "part-stray.parquet").exists(),
        "interrupted-attempt file survived the stage rewrite")
    } finally {
      CorpusPipeline.stageNames.foreach { n =>
        spark.sql(s"DROP TABLE IF EXISTS graft_stage_${n}_$tag")
      }
      rm(new java.io.File(dir))
    }
  }
}
