package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PERCEPTUAL image dedup — the multimodal twin of
  * [[StreamDedup]]: decode arriving image bytes with the real pure-JVM
  * decoders (PNG/BMP/GIF/JPEG), dHash the pixels, and keep the FIRST
  * arrival of each perceptual fingerprint, discarding later exact
  * re-crawls of the same image.
  *
  * State design for an unbounded crawl feed: keyed by the 64-bit dHash
  * (carried as two sign-safe 32-bit halves, the
  * [[graft.operators.Multimodal.withDecodedPixels]] convention) and
  * expired by the watermark via `dropDuplicatesWithinWatermark` — state is
  * O(distinct fingerprints inside the horizon), never O(all images ever
  * seen). Decode runs stateless per micro-batch through the SAME
  * mapPartitions batch shape as the batch tier, so stream and batch
  * fingerprints agree bit-for-bit (pinned by StreamMediaSpec).
  *
  * Rows whose bytes do not decode, or whose raster is smaller than the
  * 9×8 dHash grid, are DROPPED — no fingerprint means no dedup decision;
  * a production pipeline routes them to a quarantine sink instead of
  * letting unfingerprintable bytes through a dedup gate.
  */
object StreamMedia {

  /** Decode + fingerprint WITHOUT routing: every input row survives with a
    * `fingerprinted` flag (decodable and ≥ the 9×8 dHash grid) and nullable
    * `format`/`width`/`height`/`dhash_hi`/`dhash_lo`. The routing
    * primitive: [[firstArrivals]] dedups the flagged side; [[quarantine]]
    * is the other side — start BOTH as sinks on the same source and no
    * byte is silently lost.
    */
  def withFingerprint(df: DataFrame, binCol: String): DataFrame =
    graft.operators.Multimodal.withDecodedPixels(df, binCol)
      .withColumn("fingerprinted",
        col("pixel_meta").isNotNull &&
          col("pixel_meta.width") >= 9 && col("pixel_meta.height") >= 8)
      .withColumn("format", col("pixel_meta.format"))
      .withColumn("width", col("pixel_meta.width"))
      .withColumn("height", col("pixel_meta.height"))
      .withColumn("dhash_hi", col("pixel_meta.dhash_hi"))
      .withColumn("dhash_lo", col("pixel_meta.dhash_lo"))
      .drop("pixel_meta")

  /** `df` must be a streaming DataFrame with a binary `binCol` and an
    * event-time `tsCol`. Emits first-arrivals only, with `dhash_hi` /
    * `dhash_lo` (and the decoded `width`/`height`/`format`) attached.
    */
  def firstArrivals(df: DataFrame, binCol: String, tsCol: String,
      watermark: String): DataFrame =
    withFingerprint(df, binCol)
      .where(col("fingerprinted"))
      .drop("fingerprinted")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("dhash_hi", "dhash_lo")

  /** The rows [[firstArrivals]] drops, as their own stream (stateless —
    * attach to a quarantine sink so unfingerprintable bytes are routed,
    * never silently discarded). */
  def quarantine(df: DataFrame, binCol: String): DataFrame =
    withFingerprint(df, binCol)
      .where(!col("fingerprinted"))
      .drop("fingerprinted", "format", "width", "height", "dhash_hi", "dhash_lo")
}
