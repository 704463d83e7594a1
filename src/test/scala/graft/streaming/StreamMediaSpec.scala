package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Top-level so the Dataset encoder needs no outer instance. */
case class MediaArrival(id: Long, tsMs: Long, img: Array[Byte])

/** Stream ≡ batch parity for [[StreamMedia]]: perceptual first-arrival
  * image dedup over engineered exact-duplicate groups, plus the drop
  * contract for unfingerprintable bytes.
  */
class StreamMediaSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("stream-media-spec")
    .getOrCreate()

  /** 10×9 gray PNG whose pixels depend only on `group` — ids in the same
    * group are byte-identical images (exact perceptual dups); distinct
    * groups differ in many pixels (distinct dHashes). */
  private def asset(group: Long): Array[Byte] =
    Multimodal.encodePng(10, 9, 1,
      (x, y, _) => ((group * 41 + x * 13 + y * 29) % 256).toInt)

  test("streaming perceptual dedup equals batch first-arrival per dHash; undecodable rows drop") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sctx = spark.sqlContext

    // 24 arrivals over 6 groups (4 exact dups each), time-ordered so the
    // first arrival of each group is id = group (ts = id minutes); plus
    // two poison rows: truncated bytes and a too-small-for-dHash image
    val arrivals = (0 until 24).map { i =>
      MediaArrival(i.toLong, i.toLong * 60000L, asset(i % 6))
    } :+ MediaArrival(100L, 100 * 60000L, Array[Byte](1, 2, 3)) :+
      MediaArrival(101L, 101 * 60000L,
        Multimodal.encodePng(4, 4, 1, (x, y, _) => (x + y) % 256))

    val source = MemoryStream[MediaArrival]
    val stream = StreamMedia.firstArrivals(
      source.toDS().withColumn("ts", timestamp_millis(col("tsMs"))).drop("tsMs"),
      "img", "ts", watermark = "1 hour") // horizon > the whole fixture span:
      // no state expiry inside the test, so each group emits EXACTLY once
    val q = stream.select("id", "dhash_hi", "dhash_lo")
      .writeStream.outputMode("append")
      .format("memory").queryName("media_firsts").start()
    try {
      // three micro-batches: duplicate groups span batch boundaries, so
      // the dedup state carry (not per-batch dropDuplicates) is under test
      arrivals.grouped(9).foreach { chunk =>
        source.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT id, dhash_hi, dhash_lo FROM media_firsts")
        .as[(Long, Long, Long)].collect().toSeq

      // batch twin over the same arrivals: decode, one row per dHash.
      // Within a micro-batch the streaming operator keeps an ARBITRARY
      // representative per key (processing order, like batch
      // dropDuplicates) — for exact duplicates every representative is
      // equally correct, so parity is on the FINGERPRINT SET, the emitted
      // count, and group coverage, never on which duplicate survived.
      val batchHashes = Multimodal.withDecodedPixels(
          arrivals.toDF().where(col("id") < 100), "img")
        .select(col("pixel_meta.dhash_hi"), col("pixel_meta.dhash_lo"))
        .distinct()
        .as[(Long, Long)].collect().toSet

      assert(streamed.map(s => (s._2, s._3)).toSet == batchHashes,
        s"stream/batch fingerprint-set mismatch:\n$streamed\nvs\n$batchHashes")
      assert(streamed.size == 6, s"one emission per group: $streamed")
      // each emission is a member of a distinct group; poison rows dropped
      assert(streamed.map(_._1 % 6).sorted == (0L until 6L),
        s"groups covered once each: ${streamed.map(_._1)}")
      assert(streamed.forall(_._1 < 100), s"poison rows must drop: $streamed")
    } finally q.stop()
  }

  test("quarantine stream carries exactly the rows firstArrivals drops") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val rows = Seq(
      MediaArrival(1L, 0L, asset(0)),                        // fingerprintable
      MediaArrival(2L, 60000L, Array[Byte](9, 9, 9)),        // undecodable
      MediaArrival(3L, 120000L,
        Multimodal.encodePng(4, 4, 1, (x, y, _) => (x * y) % 256))) // < 9x8
    val source = MemoryStream[MediaArrival]
    val q = StreamMedia.quarantine(source.toDS().toDF(), "img")
      .select("id")
      .writeStream.outputMode("append")
      .format("memory").queryName("media_quarantine").start()
    try {
      source.addData(rows: _*)
      q.processAllAvailable()
      val quarantined = spark.sql("SELECT id FROM media_quarantine")
        .as[Long].collect().sorted.toSeq
      assert(quarantined == Seq(2L, 3L), s"quarantined: $quarantined")
    } finally q.stop()
  }
}
