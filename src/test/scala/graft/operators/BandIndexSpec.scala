package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WRITTEN dedup signature index ([[Dedup.writeBandIndex]] +
  * [[Dedup.probeNearDups]]) — the served-ANN discipline applied to
  * MinHash: the corpus's band table is bucketed once at write; every
  * incremental probe joins a new batch's bands against it with zero
  * exchange on the corpus side. Pins:
  *
  *   1. the incremental probe's pairs ≡ the batch rebuild's corpus×batch
  *      cross-pairs ([[Decontam.nearDupAcross]] at the same parameters) —
  *      serving from the written index can never drift from a rebuild;
  *   2. with broadcast disabled, the candidate join plans EXACTLY ONE
  *      Exchange — the batch side's; the bucketed index side reads its
  *      buckets in place (the BucketingSpec contract, on dedup's table).
  */
class BandIndexSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("band-index-spec")
    .getOrCreate()

  private def docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  test("incremental probe against the written band index: batch-rebuild parity + only the batch shuffles") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = docs.where(col("doc_id") % 4 =!= 0)
    val arrivals = docs.where(col("doc_id") % 4 === 0)
    val base = java.nio.file.Files.createTempDirectory("band_idx").toString
    val table = "graft_band_idx_spec"
    try {
      Dedup.writeBandIndex(corpus, "doc_id", "text",
        k = 8, rowsPerBand = 2, table, s"$base/bands", buckets = 8)

      val probed = Dedup.probeNearDups(spark, table, corpus, arrivals,
          "doc_id", "text", k = 8, rowsPerBand = 2, threshold = 0.2)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      val rebuilt = Decontam.nearDupAcross(corpus, arrivals,
          "doc_id", "text", k = 8, rowsPerBand = 2, threshold = 0.2)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(probed.nonEmpty, "fixture produced no cross near-dups — pins vacuous")
      assert(probed == rebuilt, "incremental probe drifted from batch rebuild")

      // the layout claim: candidate join with broadcast OFF plans exactly
      // one Exchange — the arrivals' bands; the index side is
      // bucket-satisfied (band_hash ⊆ join keys)
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val newBands = Dedup.lshBands(arrivals, "doc_id", "text", 8, 2)
          .select(col("doc_id").as("new_id"),
            concat_ws(":", col("band_idx"), col("band_hash")).as("band_key"))
        val plan = spark.table(table)
          .join(newBands, Seq("band_key"))
          .queryExecution.executedPlan.toString
        // exactly ONE hash exchange — the batch side's; lshBands' internal
        // round-robin spread is not a join shuffle and doesn't count
        val needle = "Exchange hashpartitioning"
        val hashExchanges = plan.sliding(needle.length).count(_ == needle)
        assert(hashExchanges == 1,
          s"expected exactly the batch-side hash Exchange, found $hashExchanges:\n$plan")
        assert(plan.contains("Bucketed: true"),
          s"index scan did not use its bucket spec:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      rm(new java.io.File(base))
    }
  }
}
