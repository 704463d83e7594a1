package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata structs alongside.
  *
  * The decode step is STUBBED (this container has no image/audio codecs —
  * see the builder brief): [[decodeStub]] produces deterministic pseudo
  * metadata from the bytes. Everything AROUND the stub is real and tested:
  * the schema contract, the batched `mapPartitions` shape (one codec init
  * per partition, the pattern a JNI/FFI decoder needs), partitioning, and
  * the Column-level fast path for cheap byte-level features.
  */
object Multimodal {

  /** Typed metadata produced per asset. */
  final case class AssetMeta(
      byteLen: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: String
  )

  val metaSchema: StructType = StructType(Seq(
    StructField("byteLen", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", StringType)
  ))

  /** The stubbed decoder: in production this would be the image/audio codec
    * call; here it derives deterministic fake dimensions from the bytes.
    * Marked clearly as the swap-out point.
    */
  def decodeStub(bytes: Array[Byte]): AssetMeta = {
    // ??? <- real codec goes here (e.g. TwelveMonkeys/JCodec via JNI batch)
    val len = bytes.length.toLong
    val fmt =
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else "raw"
    AssetMeta(
      byteLen = len,
      format = fmt,
      width = (len % 640).toInt,
      height = ((len * 7) % 480).toInt,
      checksum = java.security.MessageDigest
        .getInstance("MD5")
        .digest(bytes)
        .map("%02x".format(_))
        .mkString
    )
  }

  /** Batched decode over partitions — the real-workload shape: per-partition
    * codec initialization, row-group-sized batches, typed output. At 100 TB
    * the binary column stays columnar (Parquet BYTE_ARRAY) and decode
    * parallelism == partition count; no shuffle is introduced.
    */
  def withDecodedMeta(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add("asset_meta", metaSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition init would go here (codec handles, buffers)
      rows.map { r =>
        val meta = decodeStub(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq :+ Row(meta.byteLen, meta.format, meta.width, meta.height, meta.checksum))
      }
    }(enc)
  }

  /** Column-level byte features — no decode needed, stays in codegen. */
  def byteFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(binCol)).cast("long"))
      .withColumn("checksum", md5(col(binCol)))
      .withColumn("width_stub", col("byte_len") % 640)
      .withColumn("height_stub", (col("byte_len") * 7) % 480)

  /** Deterministic frame sampling plumbing for video-like assets: emit
    * (asset_id, frame_idx, frame_bytes) rows — the explode pattern a frame
    * extractor feeds; the slice stands in for the codec's frame decode.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, everyNBytes: Int): DataFrame =
    df.select(
      col(idCol),
      posexplode(
        transform(
          sequence(lit(0), greatest((octet_length(col(binCol)) / everyNBytes).cast("int") - 1, lit(0))),
          i => col(binCol).substr(i * everyNBytes + 1, lit(everyNBytes))
        )
      ).as(Seq("frame_idx", "frame_bytes"))
    )
}
