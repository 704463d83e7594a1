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
}
