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

  /** REAL header parsing for the two public container formats whose
    * dimensions live in a fixed-layout header — no codec dependency:
    *
    *   - PNG: 8-byte signature, then the IHDR chunk is mandatory-first, so
    *     width/height are the big-endian u32s at offsets 16/20
    *     (PNG spec §5.2, §11.2.2);
    *   - JPEG: standard marker scan from SOI — skip APPn/COM/DQT/… segments
    *     by their u16 lengths (and standalone RSTn/TEM markers) until a
    *     frame header SOFn (0xC0–0xCF except DHT 0xC4, JPG 0xC8, DAC 0xCC),
    *     whose payload is precision u8, height u16, width u16 (JPEG
    *     ISO/IEC 10918-1 B.2.2).
    *
    * None for truncated/other/garbage bytes — the caller falls back to the
    * deterministic stub dimensions.
    */
  def parseDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Int = (u16(i) << 16) | u16(i + 2) // header dims < 2^31
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def i32le(i: Int): Int = u16le(i) | (u16le(i + 2) << 16)
    val isPng = bytes.length >= 24 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
      u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R'
    val isGif = bytes.length >= 10 &&
      u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == '8' &&
      (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a'
    val isBmp = bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M'
    if (isPng) Some(("png", u32(16), u32(20)))
    // GIF87a/89a: logical-screen w/h are the LITTLE-endian u16s at 6/8
    else if (isGif) Some(("gif", u16le(6), u16le(8)))
    // BMP (BITMAPINFOHEADER): w/h are the LE i32s at 18/22; |h| because a
    // negative height encodes top-down row order, not a negative dimension
    else if (isBmp) Some(("bmp", i32le(18), math.abs(i32le(22))))
    else if (bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 1 < bytes.length) {
        if (u8(i) != 0xFF) return None // marker desync: not a parseable JPEG
        val m = u8(i + 1)
        if (m == 0xFF) i += 1 // fill byte
        else if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) i += 2 // standalone
        else if (i + 3 < bytes.length) {
          val len = u16(i + 2)
          if (len < 2) return None
          if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
            return if (i + 9 <= bytes.length) Some(("jpeg", u16(i + 7), u16(i + 5)))
            else None
          i += 2 + len
        } else return None
      }
      None
    } else None
  }

  /** The decoder behind [[withDecodedMeta]]: REAL dimensions whenever the
    * bytes carry a parseable PNG/JPEG header ([[parseDims]]); the pixel
    * DECODE itself stays stubbed with deterministic byte-derived values
    * (this container ships no codecs — swap-out point below).
    */
  def decodeStub(bytes: Array[Byte]): AssetMeta = {
    // ??? <- real pixel codec goes here (e.g. TwelveMonkeys/JCodec via JNI batch)
    val len = bytes.length.toLong
    val parsed = parseDims(bytes)
    val fmt = parsed.map(_._1).getOrElse {
      if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
      else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
      else "raw"
    }
    AssetMeta(
      byteLen = len,
      format = fmt,
      width = parsed.map(_._2).getOrElse((len % 640).toInt),
      height = parsed.map(_._3).getOrElse(((len * 7) % 480).toInt),
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

  /** Parsed RIFF/WAVE audio metadata — header fields only, no sample
    * decode. */
  case class WavMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
      byteRate: Int, dataLen: Long)

  private val wavSchema = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("byte_rate", IntegerType),
    StructField("data_len", LongType)
  ))

  /** RIFF/WAVE fmt-chunk scan (no codec): "RIFF"…"WAVE", then chunks of
    * (4-byte id, u32le size) word-aligned per the RIFF spec; the fmt chunk
    * carries channels/rate/bits/byte-rate, the data chunk's SIZE is the
    * payload length (readable even when the payload itself is elsewhere —
    * the metadata-reader shape). None for non-WAV/truncated headers.
    */
  def parseWav(bytes: Array[Byte]): Option[WavMeta] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u16le(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int): Long = u16le(i).toLong | (u16le(i + 2).toLong << 16)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var dataLen = -1L
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val id = tag(i)
      val size = u32le(i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= bytes.length)
        fmt = Some((u16le(i + 10), u32le(i + 12).toInt, u32le(i + 16).toInt, u16le(i + 22)))
      else if (id == "data") dataLen = size
      i += 8 + size.toInt + (size.toInt & 1) // RIFF chunks pad to even
    }
    fmt.collect { case (ch, rate, byteRate, bits) if dataLen >= 0 =>
      WavMeta(ch, rate, bits, byteRate, dataLen)
    }
  }

  /** Batched WAV metadata extraction — same mapPartitions decode shape as
    * [[withDecodedMeta]]; unparseable rows get a null `wav_meta`. */
  def withWavMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = df.schema.add("wav_meta", wavSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = parseWav(r.getAs[Array[Byte]](binIdx)).orNull
        val metaRow =
          if (m == null) null
          else Row(m.channels, m.sampleRate, m.bitsPerSample, m.byteRate, m.dataLen)
        Row.fromSeq(r.toSeq :+ metaRow)
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
