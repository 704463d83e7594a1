package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class StreamNearDupSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-neardup-spec")
    .getOrCreate()

  private val K = 8
  private val R = 2
  private val THETA = 0.5

  test("identical and near-identical docs flag against the earliest original, across batches") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val source = MemoryStream[(Long, String)]
    val votes = StreamNearDup.bandVotes(
      StreamNearDup.bandRows(source.toDF().toDF("doc_id", "text"), "doc_id", "text", K, R),
      THETA)
    val q = votes.writeStream.outputMode("append")
      .format("memory").queryName("nd_votes").start()
    try {
      source.addData(
        (1L, "the quick brown fox jumps over the lazy dog again and again today"),
        (2L, "an entirely different sentence about spark shuffles and partitions"))
      q.processAllAvailable()
      // batch 2: 3 = exact dup of 1; 4 = unique
      source.addData(
        (3L, "the quick brown fox jumps over the lazy dog again and again today"),
        (4L, "completely unrelated text mentioning neither foxes nor shuffles whatsoever"))
      q.processAllAvailable()
      val out = StreamNearDup.verdicts(spark.sql("SELECT * FROM nd_votes"))
        .as[(Long, Long)].collect().toSet
      assert(out == Set((3L, 1L)))
    } finally q.stop()
  }

  test("stream verdicts over fixture documents equal the batch estimated-Jaccard mirror") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))

    // batch mirror: per-bucket candidates (earlier id < later id), estimated
    // Jaccard from the SAME signature table construction, earliest original
    val sigs = Dedup.signatureTable(docs, "doc_id", "text", K).localCheckpoint()
    val bands = Dedup.lshBandsFrom(sigs, "doc_id", K, R)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val est = (0 until K)
      .map(i => when(col(s"sa.mh$i") === col(s"sb.mh$i"), 1).otherwise(0))
      .reduce(_ + _).cast("double") / K
    val expected = cand
      .join(sigs.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("id_b") === col("sb.doc_id"))
      .where(est >= THETA)
      .groupBy(col("id_b").as("doc_id"))
      .agg(min(col("id_a")).as("dup_of"))
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "fixture produced no near-dups; spec needs a lower threshold")

    val rows = docs.orderBy("doc_id").as[(Long, String)].collect()
    val source = MemoryStream[(Long, String)]
    val q = StreamNearDup.bandVotes(
        StreamNearDup.bandRows(source.toDF().toDF("doc_id", "text"), "doc_id", "text", K, R),
        THETA)
      .writeStream.outputMode("append")
      .format("memory").queryName("nd_fixture_votes").start()
    try {
      rows.grouped((rows.length + 2) / 3).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = StreamNearDup.verdicts(spark.sql("SELECT * FROM nd_fixture_votes"))
        .as[(Long, Long)].collect().toSet
      assert(streamed == expected,
        s"stream ${streamed.size} vs batch ${expected.size} flagged docs")
    } finally q.stop()
  }
}
