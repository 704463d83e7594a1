package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Versioned index publication ([[IndexLifecycle]]): the pointer-swap
  * deployment loop around the written-index operators. Pins:
  *
  *   1. publish → probe-through-pointer equals the in-memory probe;
  *   2. a second publish swaps the pointer atomically — new probes read
  *      v2 while v1's directory (an in-flight reader's plan) is untouched
  *      and still serves the OLD answer;
  *   3. compactAndPublish absorbs streamed appends into a fresh 1-file-
  *      per-cell version without mutating the served directory; retire
  *      refuses the published version and removes drained ones.
  */
class IndexLifecycleSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("index-lifecycle-spec")
    .getOrCreate()

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  test("publish/swap/append/compact/retire: the full pointer lifecycle") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("idx_lifecycle").toString
    try {
      val seen = emb.where(col("vec_id") < 300)
      val (cents, oldIndex) = Similarity.ivfTrainedAuto(
        seen, "vec_id", "embedding", kmeansIters = 1, sampleBudget = 200)
      val nProbe = Similarity.autoProbeCount(cents.length)
      def qvOf(qid: Long): Seq[Float] =
        emb.where(col("vec_id") === qid).select("embedding")
          .as[Seq[Float]].head()
      def probe(path: String, qid: Long) =
        Similarity.ivfServedTopK(spark, path, cents,
            "vec_id", "embedding", qvOf(qid), 10, nProbe)
          .as[(Long, Double)].collect().toSeq

      // v1: the trained index published
      assert(IndexLifecycle.currentVersion(spark, base).isEmpty)
      assert(IndexLifecycle.publish(spark, oldIndex, base) == 1)
      assert(IndexLifecycle.currentVersion(spark, base).contains(1))
      val v1Answer = probe(IndexLifecycle.currentPath(spark, base), 42L)
      val memAnswer = Similarity.ivfTopKIndexed(cents, oldIndex,
          "vec_id", "embedding", 42L, 10, nProbe)
        .as[(Long, Double)].collect().toSeq
      assert(v1Answer == memAnswer, "published probe drifted from in-memory")

      // v2: retrain-equivalent (full corpus at the same centroids) — the
      // swap redirects new probes; an in-flight reader pinned to v1's
      // directory still gets v1's answer
      val fullIndex = emb.select(col("vec_id"), col("embedding"),
        element_at(graft.functions.CentroidExpr.nearestCids(
          col("embedding"), cents, 1), 1).as("cluster"))
      assert(IndexLifecycle.publish(spark, fullIndex, base) == 2)
      assert(IndexLifecycle.currentVersion(spark, base).contains(2))
      val v2Answer = probe(IndexLifecycle.currentPath(spark, base), 42L)
      assert(v2Answer != v1Answer, "full-corpus index should change top-k")
      assert(probe(IndexLifecycle.versionPath(base, 1), 42L) == v1Answer,
        "published swap mutated the old version's directory")

      // appends grow v2; compactAndPublish absorbs them into v3 (1 file
      // per cell) WITHOUT touching v2, and answers are unchanged
      val extra = emb.where(col("vec_id") >= 300)
        .withColumn("vec_id", col("vec_id") + 1000L)
      graft.streaming.StreamIndex.appendBatch(extra, "vec_id", "embedding",
        cents, IndexLifecycle.currentPath(spark, base))
      val grownAnswer = probe(IndexLifecycle.currentPath(spark, base), 42L)
      assert(IndexLifecycle.compactAndPublish(spark, base) == 3)
      val v3Path = IndexLifecycle.currentPath(spark, base)
      assert(probe(v3Path, 42L) == grownAnswer,
        "compaction version changed the served answer")
      val v3Cells = Option(new java.io.File(v3Path).listFiles())
        .getOrElse(Array.empty)
        .filter(d => d.isDirectory && d.getName.startsWith("cluster="))
      assert(v3Cells.nonEmpty && v3Cells.forall(d =>
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(_.getName.endsWith(".parquet")) <= 2),
        "compacted version broke the files/cell law")

      // retire: refuses the published version, removes a drained one
      intercept[IllegalArgumentException] {
        IndexLifecycle.retire(spark, base, 3)
      }
      IndexLifecycle.retire(spark, base, 1)
      assert(!new java.io.File(IndexLifecycle.versionPath(base, 1)).exists())
      assert(probe(v3Path, 42L) == grownAnswer, "retire touched the wrong dir")
    } finally rm(new java.io.File(base))
  }
}
