package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * travel as opaque `binary` columns with typed metadata structs alongside.
  *
  * Pixel decode is REAL for the pure-JVM-decodable formats: 24-bit BMP
  * ([[decodeBmp24]]), baseline PNG ([[decodePng]] — zlib Inflater +
  * per-row unfilter, the full public spec pipeline), and GIF
  * ([[decodeGif]] — general variable-width LZW up to 12 bits, palette
  * mapping), feeding per-channel stats and a perceptual [[dHash64]]
  * through the batched [[withDecodedPixels]] shape — and baseline JPEG
  * decodes through the pure-JVM [[Jpeg]] codec (lossy, so spec-pinned by
  * round-trip error bounds rather than oracle hashes). Video keeps the
  * header-parse tier
  * ([[parseDims]]) + deterministic stub values in [[decodeStub]]; the
  * mapPartitions batch shape is identical, so a codec swap-in is local.
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

  /** LEGACY deterministic fallback, retained ONLY because a spec pins its
    * determinism (OperatorsSpec "decodeStub surfaces the REAL dims").
    * Board queries no longer reach it: [[withDecodedMeta]] routes through
    * [[parseDims]] and lands NULL width/height for unparseable bytes — the
    * honest answer — instead of this function's byte-length-derived dims.
    */
  def decodeStub(bytes: Array[Byte]): AssetMeta = {
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
    *
    * Dimensions are REAL ([[parseDims]]) or NULL — never fabricated: a
    * crawl asset whose header does not parse gets `width`/`height` NULL
    * and a magic-byte `format` sniff ("jpeg"/"png" prefix, else "raw"),
    * so a downstream filter can't mistake a byte-length artifact for a
    * real dimension.
    */
  def withDecodedMeta(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema.add("asset_meta", metaSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition init would go here (codec handles, buffers)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val parsed = parseDims(bytes)
        val fmt = parsed.map(_._1).getOrElse {
          if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) "jpeg"
          else if (bytes.length >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 'P') "png"
          else "raw"
        }
        md.reset()
        val checksum = md.digest(bytes).map("%02x".format(_)).mkString
        Row.fromSeq(r.toSeq :+ Row(bytes.length.toLong, fmt,
          parsed.map(p => Int.box(p._2)).orNull,
          parsed.map(p => Int.box(p._3)).orNull, checksum))
      }
    }(enc)
  }

  // ---- real pixel decode (pure JVM, public specs only) -------------------

  /** Decoded raster: `channels` bytes per pixel (1 = gray, 3 = RGB,
    * 4 = RGBA), row-major top-down.
    */
  final case class Image(width: Int, height: Int, channels: Int, data: Array[Byte]) {
    def channel(x: Int, y: Int, c: Int): Int = {
      val i = (y * width + x) * channels
      if (channels == 1) data(i) & 0xFF else data(i + c) & 0xFF
    }
    /** Integer ITU-R 601 luma, floor — exact across engines. */
    def luma(x: Int, y: Int): Int =
      if (channels == 1) channel(x, y, 0)
      else (299 * channel(x, y, 0) + 587 * channel(x, y, 1) + 114 * channel(x, y, 2)) / 1000
  }

  /** Uncompressed 24-bit BMP decode (BITMAPINFOHEADER, BI_RGB): pixel rows
    * are bottom-up unless height is negative, padded to 4-byte boundaries,
    * samples stored B,G,R (Windows BMP spec). None for any other BMP
    * flavor or truncated bytes.
    */
  def decodeBmp24(bytes: Array[Byte]): Option[Image] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    def i32le(i: Int) = u16le(i) | (u16le(i + 2) << 16)
    if (bytes.length < 54 || u8(0) != 'B' || u8(1) != 'M') return None
    val dataOff = i32le(10)
    val w = i32le(18)
    val hRaw = i32le(22)
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    if (u16le(28) != 24 || i32le(30) != 0 || w <= 0 || h == 0) return None
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (dataOff.toLong + rowSize.toLong * h > bytes.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val src = dataOff + (if (bottomUp) h - 1 - y else y) * rowSize
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        out(d) = bytes(src + x * 3 + 2)     // R
        out(d + 1) = bytes(src + x * 3 + 1) // G
        out(d + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, 3, out))
  }

  /** Baseline PNG decode — the full public pipeline, no codec library:
    * chunk walk → IDAT concat → zlib Inflater → per-row unfilter
    * (None/Sub/Up/Average/Paeth, PNG spec §9). Supports bit depth 8,
    * color types 0 (gray), 2 (RGB), 6 (RGBA), no interlace — the shapes a
    * training-data pipeline synthesizes and the overwhelming web majority.
    */
  def decodePng(bytes: Array[Byte]): Option[Image] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val sig = bytes.length >= 8 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A
    if (!sig) return None
    var i = 8
    var w = 0; var h = 0; var depth = 0; var colorType = -1; var interlace = 0
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= bytes.length) {
      val len = u32(i)
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      if (len < 0 || i + 12 + len > bytes.length) return None
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = u32(i + 8); h = u32(i + 12)
          depth = u8(i + 16); colorType = u8(i + 17); interlace = u8(i + 20)
        case "IDAT" => idat.write(bytes, i + 8, len)
        case _      => ()
      }
      i += 12 + len // len + type + crc
    }
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => return None
    }
    if (depth != 8 || interlace != 0 || w <= 0 || h <= 0) return None
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var filled = 0
    try {
      while (filled < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, filled, raw.length - filled)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        filled += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (filled < raw.length) return None
    // unfilter in place into the output raster
    val out = new Array[Byte](stride * h)
    val bpp = channels
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xFF
      val rowOff = y * (stride + 1) + 1
      val outOff = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowOff + x) & 0xFF
        val left = if (x >= bpp) out(outOff + x - bpp) & 0xFF else 0
        val up = if (y > 0) out(outOff - stride + x) & 0xFF else 0
        val upLeft = if (y > 0 && x >= bpp) out(outOff - stride + x - bpp) & 0xFF else 0
        val recon = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor (PNG spec §9.4)
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => return None
        }
        out(outOff + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, channels, out))
  }

  /** PNG or 24-bit BMP pixel decode; None otherwise. */
  def decodeImage(bytes: Array[Byte]): Option[Image] =
    decodePng(bytes).orElse(decodeBmp24(bytes)).orElse(decodeGif(bytes))
      .orElse(Jpeg.decode(bytes))

  /** 24-bit uncompressed BMP encoder (the decoder's inverse): `px(x, y)` is
    * packed 0xRRGGBB, rows written bottom-up with 4-byte padding.
    */
  def encodeBmp24(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataOff = 54
    val size = dataOff + rowSize * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(dataOff)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    b.putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      val rowStart = b.position()
      var x = 0
      while (x < w) {
        val p = px(x, y)
        b.put((p & 0xFF).toByte).put(((p >> 8) & 0xFF).toByte).put(((p >> 16) & 0xFF).toByte)
        x += 1
      }
      while (b.position() < rowStart + rowSize) b.put(0.toByte)
      y -= 1
    }
    b.array()
  }

  /** Baseline PNG encoder: bit depth 8, gray (channels = 1) or RGB (3), one
    * IDAT, zlib STORED blocks (Deflater level 0 — byte-exact, no entropy
    * coding), real CRC32 chunk checksums. Rows cycle through ALL five PNG
    * filter types so a round-trip exercises every unfilter branch of
    * [[decodePng]].
    */
  def encodePng(w: Int, h: Int, channels: Int, sample: (Int, Int, Int) => Int): Array[Byte] = {
    require(channels == 1 || channels == 3, "gray or RGB")
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    // raster first (unfiltered reference for the filter math)
    val px = new Array[Int](stride * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until channels)
      px(y * stride + x * channels + c) = sample(x, y, c) & 0xFF
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      for (i <- 0 until stride) {
        val cur = px(y * stride + i)
        val left = if (i >= channels) px(y * stride + i - channels) else 0
        val up = if (y > 0) px((y - 1) * stride + i) else 0
        val upLeft = if (y > 0 && i >= channels) px((y - 1) * stride + i - channels) else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
        }
        raw(y * (stride + 1) + 1 + i) = (v & 0xFF).toByte
      }
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.NO_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      val lenB = java.nio.ByteBuffer.allocate(4).putInt(payload.length).array()
      out.write(lenB)
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(payload)
      out.write(tb); out.write(payload)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put((if (channels == 1) 0 else 2).toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    chunk("IDAT", zOut.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** GIF87a encoder, 8-bit grayscale palette (index i → RGB (i,i,i)),
    * single frame. The LZW stream uses the standard "uncompressed GIF"
    * discipline: every pixel emitted as its own literal code with a CLEAR
    * every 253 codes, so the dictionary never grows past 9-bit width —
    * a valid stream ANY conforming decoder (including [[decodeGif]]'s
    * general LZW) reads back bit-exactly.
    */
  def encodeGifGray(w: Int, h: Int, sample: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16le(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16le(w); u16le(h)
    out.write(0xF7) // global color table, 8-bit color resolution, 256 entries
    out.write(0); out.write(0)
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2C) // image descriptor
    u16le(0); u16le(0); u16le(w); u16le(h)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW minimum code size
    val clear = 256; val eoi = 257
    var bitBuf = 0L; var bitCnt = 0
    val data = new java.io.ByteArrayOutputStream()
    def putCode(code: Int): Unit = { // 9-bit codes, LSB-first packing
      bitBuf |= code.toLong << bitCnt; bitCnt += 9
      while (bitCnt >= 8) { data.write((bitBuf & 0xFF).toInt); bitBuf >>= 8; bitCnt -= 8 }
    }
    putCode(clear)
    var sinceClear = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        putCode(sample(x, y) & 0xFF)
        sinceClear += 1
        if (sinceClear == 253) { putCode(clear); sinceClear = 0 }
        x += 1
      }
      y += 1
    }
    putCode(eoi)
    if (bitCnt > 0) data.write((bitBuf & 0xFF).toInt)
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) { // 255-byte sub-blocks
      val len = math.min(255, bytes.length - off)
      out.write(len); out.write(bytes, off, len); off += len
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF first-frame decode: full GENERAL LZW (variable code width up to
    * 12 bits, cScSc case, per-CLEAR dictionary reset), global or local
    * palette, 89a extensions skipped. Interlaced frames and truncated
    * streams → None. Output is palette-mapped RGB.
    */
  def decodeGif(bytes: Array[Byte]): Option[Image] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    try {
      val flags = u8(10)
      val gctSize = if ((flags & 0x80) != 0) 1 << ((flags & 7) + 1) else 0
      var p = 13
      val gct = if (gctSize > 0) { val t = bytes.slice(p, p + 3 * gctSize); p += 3 * gctSize; t }
        else Array.emptyByteArray
      while (p < bytes.length) {
        u8(p) match {
          case 0x21 => // extension: label + sub-blocks
            p += 2
            while (u8(p) != 0) p += u8(p) + 1
            p += 1
          case 0x3B => return None // trailer before any image
          case 0x2C =>
            val iw = u16le(p + 5); val ih = u16le(p + 7)
            val iflags = u8(p + 9)
            p += 10
            if ((iflags & 0x40) != 0) return None // interlaced: out of scope
            val pal = if ((iflags & 0x80) != 0) {
              val sz = 1 << ((iflags & 7) + 1)
              val t = bytes.slice(p, p + 3 * sz); p += 3 * sz; t
            } else gct
            if (pal.isEmpty) return None
            val minCode = u8(p); p += 1
            val data = new java.io.ByteArrayOutputStream()
            while (u8(p) != 0) { data.write(bytes, p + 1, u8(p)); p += u8(p) + 1 }
            val d = data.toByteArray
            // general LZW decode
            val clear = 1 << minCode; val eoi = clear + 1
            var codeSize = minCode + 1
            var nextCode = eoi + 1
            val prefix = new Array[Int](4096)
            val suffix = new Array[Byte](4096)
            for (i <- 0 until clear) { prefix(i) = -1; suffix(i) = i.toByte }
            val px = new java.io.ByteArrayOutputStream(iw * ih)
            var bitPos = 0
            def readCode(): Int = {
              if ((bitPos + codeSize + 7) / 8 > d.length) return eoi
              var v = 0; var i = 0
              while (i < codeSize) {
                val byteI = (bitPos + i) >> 3
                if (((d(byteI) >> ((bitPos + i) & 7)) & 1) != 0) v |= 1 << i
                i += 1
              }
              bitPos += codeSize
              v
            }
            def expand(code: Int): Array[Byte] = {
              var c = code
              val sb = scala.collection.mutable.ArrayBuffer[Byte]()
              while (c >= 0) { sb += suffix(c); c = prefix(c) }
              sb.reverse.toArray
            }
            var prev = -1
            var done = false
            while (!done) {
              val code = readCode()
              if (code == eoi) done = true
              else if (code == clear) { codeSize = minCode + 1; nextCode = eoi + 1; prev = -1 }
              else {
                val seq =
                  if (code < nextCode) expand(code)
                  else if (prev >= 0) { val pe = expand(prev); pe :+ pe(0) } // cScSc
                  else return None
                px.write(seq, 0, seq.length)
                if (prev >= 0 && nextCode < 4096) {
                  prefix(nextCode) = prev; suffix(nextCode) = seq(0)
                  nextCode += 1
                  if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
                }
                prev = code
              }
            }
            val idx = px.toByteArray
            if (idx.length < iw * ih) return None
            val out = new Array[Byte](iw * ih * 3)
            var i = 0
            while (i < iw * ih) {
              val pi = (idx(i) & 0xFF) * 3
              if (pi + 2 >= pal.length) return None
              out(i * 3) = pal(pi); out(i * 3 + 1) = pal(pi + 1); out(i * 3 + 2) = pal(pi + 2)
              i += 1
            }
            return Some(Image(iw, ih, 3, out))
          case _ => return None
        }
      }
      None
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Perceptual 64-bit difference hash: integer box-downsample to a 9×8
    * luma grid — pixel (x, y) maps to cell (y·8/h, x·9/w), cell value is the
    * floor mean, all integer math so any engine reproduces it — then bit
    * (r,c) set iff cell(r,c) < cell(r,c+1), packed MSB-first. Requires
    * w ≥ 9 and h ≥ 8 (every cell non-empty).
    */
  def dHash64(img: Image): Long = {
    require(img.width >= 9 && img.height >= 8, "dHash needs at least 9x8")
    // pixel (x, y) belongs to cell (y·8/h, x·9/w) — the floor-index
    // partition any SQL engine reproduces as a plain GROUP BY
    val sums = Array.ofDim[Long](8, 9)
    val counts = Array.ofDim[Int](8, 9)
    var y = 0
    while (y < img.height) {
      val r = y * 8 / img.height
      var x = 0
      while (x < img.width) {
        val c = x * 9 / img.width
        sums(r)(c) += img.luma(x, y)
        counts(r)(c) += 1
        x += 1
      }
      y += 1
    }
    val cells = Array.ofDim[Int](8, 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) { cells(r)(c) = (sums(r)(c) / counts(r)(c)).toInt; c += 1 }
      r += 1
    }
    var hash = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r)(c) < cells(r)(c + 1)) hash |= 1L << (63 - (r * 8 + c))
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Integer box resize (area downsample): source pixel (x, y) belongs to
    * output cell (x·dw/width, y·dh/height) — the dHash floor-index
    * partition, which any SQL engine reproduces as a plain GROUP BY — and
    * each output channel is the floor mean of its box. Requires dw ≤ width
    * and dh ≤ height so every cell is non-empty (the floor map is then
    * surjective). Exact integer arithmetic end to end: bit-identical on
    * every engine and partitioning.
    */
  def resizeImage(img: Image, dw: Int, dh: Int): Image = {
    require(dw >= 1 && dh >= 1 && dw <= img.width && dh <= img.height,
      s"resizeImage: target ${dw}x$dh must be within source ${img.width}x${img.height}")
    val ch = img.channels
    val sums = new Array[Long](dh * dw * ch)
    val counts = new Array[Int](dh * dw)
    var y = 0
    while (y < img.height) {
      val r = y * dh / img.height
      var x = 0
      while (x < img.width) {
        val cell = r * dw + x * dw / img.width
        counts(cell) += 1
        var k = 0
        while (k < ch) { sums(cell * ch + k) += img.channel(x, y, k); k += 1 }
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](dw * dh * ch)
    var i = 0
    while (i < dw * dh) {
      var k = 0
      while (k < ch) { out(i * ch + k) = (sums(i * ch + k) / counts(i)).toByte; k += 1 }
      i += 1
    }
    Image(dw, dh, ch, out)
  }

  private val resizeSchema = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("rw", IntegerType),
    StructField("rh", IntegerType),
    StructField("luma_hex", StringType) // dw×dh floor-luma grid, row-major
  ))

  /** Batched decode → [[resizeImage]] → per-cell readout: the thumbnail
    * stage of a multimodal pipeline, with the resized raster made
    * oracle-checkable as the hex of its dw×dh luma grid (luma AFTER the
    * channel resize — floor ITU-601 of the per-channel box means).
    * Unparseable or smaller-than-target assets → null struct.
    */
  def withResizedLuma(df: DataFrame, binCol: String, dw: Int, dh: Int): DataFrame = {
    val schema = df.schema.add("resize_meta", resizeSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val metaRow = decodeImage(bytes)
          .filter(img => img.width >= dw && img.height >= dh)
          .map { img =>
            val fmt =
              if ((bytes(0) & 0xFF) == 0x89) "png"
              else if ((bytes(0) & 0xFF) == 'G') "gif"
              else if ((bytes(0) & 0xFF) == 0xFF) "jpeg"
              else "bmp"
            val rz = resizeImage(img, dw, dh)
            val sb = new StringBuilder(dw * dh * 2)
            var y = 0
            while (y < dh) {
              var x = 0
              while (x < dw) { sb ++= f"${rz.luma(x, y)}%02x"; x += 1 }
              y += 1
            }
            Row(fmt, img.width, img.height, dw, dh, sb.toString)
          }.orNull
        Row.fromSeq(r.toSeq :+ metaRow)
      }
    }(enc)
  }

  private val pixelSchema = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", LongType),
    StructField("mean_g", LongType),
    StructField("mean_b", LongType),
    StructField("dhash_hi", LongType), // top 32 dHash bits as a non-negative long
    StructField("dhash_lo", LongType)  // bottom 32 — split keeps every engine sign-safe
  ))

  /** Batched REAL pixel decode: per-partition iteration (the codec-handle
    * shape), one decode per asset, typed `pixel_meta` struct out — floor
    * per-channel means and the dHash. Unparseable bytes → null struct.
    */
  def withDecodedPixels(df: DataFrame, binCol: String): DataFrame = {
    val schema = df.schema.add("pixel_meta", pixelSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val metaRow = decodeImage(bytes).map { img =>
          val fmt =
            if ((bytes(0) & 0xFF) == 0x89) "png"
            else if ((bytes(0) & 0xFF) == 'G') "gif"
            else if ((bytes(0) & 0xFF) == 0xFF) "jpeg"
            else "bmp"
          val n = img.width.toLong * img.height
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < img.height) {
            var x = 0
            while (x < img.width) {
              if (img.channels == 1) { val v = img.channel(x, y, 0); sr += v; sg += v; sb += v }
              else { sr += img.channel(x, y, 0); sg += img.channel(x, y, 1); sb += img.channel(x, y, 2) }
              x += 1
            }
            y += 1
          }
          val dh = if (img.width >= 9 && img.height >= 8) dHash64(img) else 0L
          Row(fmt, img.width, img.height, sr / n, sg / n, sb / n, dh >>> 32, dh & 0xFFFFFFFFL)
        }.orNull
        Row.fromSeq(r.toSeq :+ metaRow)
      }
    }(enc)
  }

  /** Deterministic synthetic asset for the oracle-checked pixel queries:
    * pixel channel c at (x, y) is `(docId·7 + x·13 + y·31 + c·101) mod 256`
    * (gray uses the c = 0 value). fmtSel: 0 = BMP24, 1 = PNG RGB,
    * 2 = PNG gray. The DuckDB oracle reproduces the FORMULA, never the
    * bytes — so a hash match proves the encode→decode round trip is exact.
    */
  def synthPixel(docId: Long, x: Int, y: Int, c: Int): Int =
    ((docId * 7 + x * 13 + y * 31 + c * 101) % 256).toInt

  def synthAsset(docId: Long, w: Int, h: Int, fmtSel: Int): Array[Byte] = fmtSel match {
    case 0 => encodeBmp24(w, h, (x, y) =>
      (synthPixel(docId, x, y, 0) << 16) | (synthPixel(docId, x, y, 1) << 8) | synthPixel(docId, x, y, 2))
    case 1 => encodePng(w, h, 3, (x, y, c) => synthPixel(docId, x, y, c))
    case 2 => encodePng(w, h, 1, (x, y, _) => synthPixel(docId, x, y, 0))
    case _ => encodeGifGray(w, h, (x, y) => synthPixel(docId, x, y, 0))
  }

  /** documents → (doc_id, asset bytes): doc_id-derived dims (9..16 × 8..14,
    * always dHash-able) and a format rotation across the three encoders.
    */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val in = docs.select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("asset", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (id % 8 + 9).toInt
        val h = (id % 7 + 8).toInt
        Row(id, synthAsset(id, w, h, (id % 4).toInt))
      }
    }(enc)
  }

  /** 9×8 gray PNGs engineered for near-dup testing: docs in the same
    * `doc_id % groups` family share a base pattern; the variant
    * (`doc_id / groups` parity) perturbs exactly ONE pixel, so family
    * members sit ≤ 1 dHash bit apart (the downsample is identity at 9×8).
    */
  def nearDupAssets(docs: DataFrame, groups: Int): DataFrame = {
    val in = docs.select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("asset", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val g = id % groups
        val v = (id / groups) % 2
        Row(id, encodePng(9, 8, 1, (x, y, _) => {
          // group-dependent slopes: different families get genuinely
          // different gradients, so chance cross-family dHash matches stay rare
          val base = ((g * g * 31 + g * 17 + x * (23 + g % 7) + y * (5 + g % 5)) % 251).toInt
          if (v == 1 && x == 0 && y == 0) (base + 128) % 251 else base
        }))
      }
    }(enc)
  }

  /** Perceptual image near-dup pairs over (doc_id, hi, lo) 32+32-bit dHash
    * halves: Manku-style 4×16-bit pigeonhole — hamming ≤ 3 guarantees at
    * least one of the four blocks is EQUAL, so candidates come from a plain
    * equi-join on (block index, block value), never an all-pairs scan —
    * then an exact popcount verify. The same block pattern as
    * Dedup.simhashPairs; scales as the banded join does.
    */
  def dHashPairs(hashed: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole only guarantees hamming <= 3")
    val blocks = hashed.select(col("doc_id"), col("hi"), col("lo"),
      posexplode(array(
        shiftrightunsigned(col("hi"), 16), col("hi").bitwiseAND(lit(0xFFFFL)),
        shiftrightunsigned(col("lo"), 16), col("lo").bitwiseAND(lit(0xFFFFL))
      )).as(Seq("b_idx", "b_val")))
    val a = blocks.select(col("doc_id").as("id_a"), col("hi").as("hi_a"),
      col("lo").as("lo_a"), col("b_idx"), col("b_val"))
    val b = blocks.select(col("doc_id").as("id_b"), col("hi").as("hi_b"),
      col("lo").as("lo_b"), col("b_idx"), col("b_val"))
    a.join(b, Seq("b_idx", "b_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
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

  /** Minimal PCM16-mono WAV encoder (RIFF + fmt + data, the decoder's
    * inverse) — fixture synthesis for the audio-feature queries. */
  def encodeWavPcm16(rate: Int, samples: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16le(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def u32le(v: Long): Unit = { u16le((v & 0xFFFF).toInt); u16le(((v >> 16) & 0xFFFF).toInt) }
    val dataLen = samples.length * 2
    out.write("RIFF".getBytes("US-ASCII")); u32le(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); u32le(16)
    u16le(1); u16le(1); u32le(rate); u32le(rate.toLong * 2); u16le(2); u16le(16)
    out.write("data".getBytes("US-ASCII")); u32le(dataLen)
    samples.foreach(s => u16le(s & 0xFFFF))
    out.toByteArray
  }

  /** PCM16-mono sample decode: RIFF walk to the data chunk, 16-bit LE
    * signed samples. None for other encodings/widths/channel counts. */
  def decodeWavSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    parseWav(bytes).filter(m => m.channels == 1 && m.bitsPerSample == 16).flatMap { m =>
      def u8(i: Int) = bytes(i) & 0xFF
      def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
      var i = 12
      while (i + 8 <= bytes.length) {
        val size = (u8(i + 4).toLong | (u8(i + 5).toLong << 8) |
          (u8(i + 6).toLong << 16) | (u8(i + 7).toLong << 24))
        if (tag(i) == "data") {
          val n = math.min(size, (bytes.length - i - 8).toLong).toInt / 2
          return Some(Array.tabulate(n) { k =>
            val lo = u8(i + 8 + 2 * k); val hi = bytes(i + 9 + 2 * k).toInt
            (hi << 8) | lo
          })
        }
        i += 8 + size.toInt + (size.toInt & 1)
      }
      None
    }
  }

  private val audioSchema = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("mean_abs", LongType),   // floor mean |s|
    StructField("sum_sq", LongType),     // Σ s² (exact; rms derives in SQL-able form)
    StructField("zero_cross", LongType), // strict sign alternations
    StructField("clip_count", LongType)  // samples at full scale ±32767/−32768
  ))

  /** REAL audio feature extraction over decoded PCM16 samples — the audio
    * twin of [[withDecodedPixels]]: integer-exact amplitude stats any
    * engine can re-derive (mean |s| floored, Σs² for RMS, strict
    * sign-change count, full-scale clip count). Null struct for
    * non-PCM16-mono payloads.
    */
  def withAudioFeatures(df: DataFrame, binCol: String): DataFrame = {
    val schema = df.schema.add("audio_meta", audioSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val metaRow = decodeWavSamples(r.getAs[Array[Byte]](binIdx)).map { s =>
          val n = s.length.toLong
          var sumAbs = 0L; var sumSq = 0L; var zc = 0L; var clip = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i)
            sumAbs += math.abs(v.toLong); sumSq += v.toLong * v
            if (v == 32767 || v == -32768) clip += 1
            if (i > 0 && ((s(i - 1) < 0 && v >= 0) || (s(i - 1) >= 0 && v < 0))) zc += 1
            i += 1
          }
          Row(n, if (n > 0) sumAbs / n else 0L, sumSq, zc, clip)
        }.orNull
        Row.fromSeq(r.toSeq :+ metaRow)
      }
    }(enc)
  }

  /** Integer box decimation of a PCM stream — the audio twin of
    * [[resizeImage]]: sample i belongs to output slot i·m/n (the floor-map
    * partition), each slot is the integer-division mean of its box.
    * Division truncates toward zero on BOTH engines (JVM `/` and DuckDB
    * `//` agree, including negative sums), so the output is bit-exact
    * cross-engine. Requires m ≤ n (every slot non-empty).
    */
  def resamplePcm(samples: Array[Int], m: Int): Array[Int] = {
    require(m >= 1 && m <= samples.length,
      s"resamplePcm: target $m must be within source ${samples.length}")
    val sums = new Array[Long](m)
    val counts = new Array[Int](m)
    var i = 0
    while (i < samples.length) {
      val j = (i.toLong * m / samples.length).toInt
      sums(j) += samples(i)
      counts(j) += 1
      i += 1
    }
    Array.tabulate(m)(j => (sums(j) / counts(j)).toInt)
  }

  private val resampleSchema = StructType(Seq(
    StructField("n_samples", LongType),
    StructField("n_out", IntegerType),
    StructField("pcm_hex", StringType) // m resampled s16 values, %04x each
  ))

  /** Batched PCM16 decode → [[resamplePcm]] → per-slot readout: the
    * fixed-length downsampling stage of an audio pipeline (waveform
    * thumbnails, cheap alignment features), with every output sample made
    * oracle-checkable as 4 hex chars of its unsigned 16-bit pattern. Null
    * struct for non-PCM16-mono or shorter-than-target payloads.
    */
  def withResampledPcm(df: DataFrame, binCol: String, m: Int): DataFrame = {
    val schema = df.schema.add("resample_meta", resampleSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val metaRow = decodeWavSamples(r.getAs[Array[Byte]](binIdx))
          .filter(_.length >= m)
          .map { s =>
            val out = resamplePcm(s, m)
            val sb = new StringBuilder(m * 4)
            out.foreach(v => sb ++= f"${v & 0xFFFF}%04x")
            Row(s.length.toLong, m, sb.toString)
          }.orNull
        Row.fromSeq(r.toSeq :+ metaRow)
      }
    }(enc)
  }

  /** Deterministic PCM16 fixture audio: doc_id-derived length and a sample
    * formula whose raw range ±35000 EXCEEDS full scale, so clamping plants
    * real clipped samples — `s_i = clamp((id·31 + i·17) mod 70001 − 35000)`.
    * The oracle reproduces the FORMULA, never the bytes (the
    * [[syntheticAssets]] discipline). */
  def syntheticWavAssets(docs: DataFrame): DataFrame = {
    val in = docs.select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("audio", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (200 + id % 50).toInt
        val samples = Array.tabulate(n) { i =>
          val v = ((id * 31 + i.toLong * 17) % 70001L - 35000L).toInt
          math.max(-32768, math.min(32767, v))
        }
        Row(id, encodeWavPcm16(16000, samples))
      }
    }(enc)
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

  /** Column-level byte features — no decode needed, stays in codegen. Only
    * HONEST byte-derived columns (the fabricated width/height stubs are
    * retired): length, checksum, and a magic-byte format sniff matching
    * [[withDecodedMeta]]'s fallback tier.
    */
  def byteFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(binCol)).cast("long"))
      .withColumn("checksum", md5(col(binCol)))
      .withColumn("format_sniff",
        when(upper(substring(hex(col(binCol)), 1, 4)) === "FFD8", "jpeg")
          .when(upper(substring(hex(col(binCol)), 1, 4)) === "8950", "png")
          .otherwise("raw"))

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

  // --- ISO-BMFF (MP4) container walk --------------------------------------

  case class Mp4Meta(nBoxes: Int, timescale: Long, durationTicks: Long,
      durationMs: Long, mdatDeclared: Long, truncated: Boolean)

  private val mp4Schema = StructType(Seq(
    StructField("n_boxes", IntegerType),
    StructField("timescale", LongType),
    StructField("duration_ticks", LongType),
    StructField("duration_ms", LongType),
    StructField("mdat_declared", LongType),
    StructField("truncated", BooleanType)
  ))

  /** ISO-BMFF top-level box walk (ISO/IEC 14496-12 §4.2, no codec): count
    * the `[size(BE32)][type(4cc)]` boxes, descend into `moov` for the
    * `mvhd` movie header (version-0 layout: timescale at +12, duration at
    * +16 past the box header), and read `mdat`'s DECLARED payload size —
    * a declared size running past the actual bytes marks the asset
    * truncated (the crawl-corpus reality this gate exists for). Foreign or
    * malformed bytes (no leading well-formed `ftyp`/`moov`/`mdat` walk, a
    * box size < 8, a 64-bit `size == 1` largesize we do not model) → None,
    * never fabricated metadata.
    */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    def u32be(i: Int): Long =
      ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
        ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 8) return None
    var i = 0
    var boxes = 0
    var sawFtyp = false
    var ts = -1L
    var dur = -1L
    var mdat = -1L
    var truncated = false
    while (i + 8 <= bytes.length) {
      val size = u32be(i)
      val t = tag(i + 4)
      if (size < 8) return None // size==1 (largesize) and size==0 unmodeled
      boxes += 1
      if (t == "ftyp" && i == 0) sawFtyp = true
      if (t == "moov") {
        // child walk, bounded by the moov box's own extent
        var j = i + 8
        val end = math.min(i + size, bytes.length.toLong).toInt
        while (j + 8 <= end) {
          val csz = u32be(j)
          if (csz < 8) return None
          if (tag(j + 4) == "mvhd" && j + 8 + 20 <= end && bytes(j + 8) == 0) {
            ts = u32be(j + 8 + 12)
            dur = u32be(j + 8 + 16)
          }
          j += csz.toInt
        }
      }
      if (t == "mdat") mdat = size - 8
      if (i + size > bytes.length) truncated = true
      i += size.toInt
    }
    if (!sawFtyp || ts <= 0 || dur < 0) None
    else Some(Mp4Meta(boxes, ts, dur, dur * 1000L / ts, math.max(mdat, 0L), truncated))
  }

  // --- per-track ISO-BMFF walk (trak → mdia/stbl tier) ---------------------

  /** One media track recovered from a `moov/trak` subtree. */
  final case class Mp4Track(trackId: Long, handler: String, codec: String,
      timescale: Long, durationTicks: Long, durationMs: Long,
      nSamples: Long, nKeyframes: Long, kfFirst: Long, kfLast: Long)

  /** Child boxes of `[start, end)` as (tag, payloadStart, boxEnd); None on a
    * malformed size (<8 — size==1 largesize unmodeled). A final box whose
    * declared size runs past `end` is clipped to `end` (truncated-crawl
    * tolerance: its siblings before it still parse).
    */
  private def childBoxes(bytes: Array[Byte], start: Int, end: Int)
      : Option[List[(String, Int, Int)]] = {
    def u32be(i: Int): Long =
      ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
        ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
    val out = List.newBuilder[(String, Int, Int)]
    var i = start
    while (i + 8 <= end) {
      val size = u32be(i)
      if (size < 8) return None
      val boxEnd = math.min(i + size, end.toLong).toInt
      out += ((new String(bytes, i + 4, 4, "US-ASCII"), i + 8, boxEnd))
      i += size.toInt
    }
    Some(out.result())
  }

  /** Per-track walk of the `moov` subtree (ISO/IEC 14496-12): for every
    * `trak`, read the v0 `tkhd` track id, the `mdia/mdhd` v0 media
    * timescale + duration, the `mdia/hdlr` handler 4cc ("vide"/"soun"/…),
    * and descend `minf/stbl` for the `stsd` first-entry codec 4cc, the
    * `stts` total sample count (Σ entry counts), and the `stss` sync-sample
    * table (first/last keyframe sample numbers). A trak missing any of
    * tkhd/mdhd/hdlr/stsd/stts — e.g. truncated mid-box — contributes NO
    * row (never fabricated); a missing `stss` means every sample is a sync
    * sample per the spec, so nKeyframes = nSamples and the table spans
    * [1, nSamples]. None when the file-level walk itself fails (no leading
    * ftyp, malformed size). Bytes after `moov` are irrelevant here, so a
    * declared-only `mdat` tail parses fine — the header-only crawl shape.
    */
  def parseMp4Tracks(bytes: Array[Byte]): Option[Seq[Mp4Track]] = {
    def u32be(i: Int): Long =
      ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
        ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
    if (bytes.length < 8) return None
    val top = childBoxes(bytes, 0, bytes.length).getOrElse(return None)
    if (top.isEmpty || top.head._1 != "ftyp") return None
    val tracks = Seq.newBuilder[Mp4Track]
    for {
      (tag, moovStart, moovEnd) <- top if tag == "moov"
      moovKids <- childBoxes(bytes, moovStart, moovEnd).toList
      (ktag, trakStart, trakEnd) <- moovKids if ktag == "trak"
      trakKids <- childBoxes(bytes, trakStart, trakEnd).toList
    } {
      def one(kids: List[(String, Int, Int)], want: String): Option[(Int, Int)] =
        kids.collectFirst { case (t, s, e) if t == want => (s, e) }
      val parsed = for {
        (tkhdS, tkhdE) <- one(trakKids, "tkhd")
        if tkhdE >= tkhdS + 16 && bytes(tkhdS) == 0 // v0 layout only
        trackId = u32be(tkhdS + 12)
        (mdiaS, mdiaE) <- one(trakKids, "mdia")
        mdiaKids <- childBoxes(bytes, mdiaS, mdiaE)
        (mdhdS, mdhdE) <- one(mdiaKids, "mdhd")
        if mdhdE >= mdhdS + 20 && bytes(mdhdS) == 0
        ts = u32be(mdhdS + 12)
        if ts > 0
        dur = u32be(mdhdS + 16)
        (hdlrS, hdlrE) <- one(mdiaKids, "hdlr")
        if hdlrE >= hdlrS + 12
        handler = new String(bytes, hdlrS + 8, 4, "US-ASCII")
        (minfS, minfE) <- one(mdiaKids, "minf")
        minfKids <- childBoxes(bytes, minfS, minfE)
        (stblS, stblE) <- one(minfKids, "stbl")
        stblKids <- childBoxes(bytes, stblS, stblE)
        (stsdS, stsdE) <- one(stblKids, "stsd")
        if stsdE >= stsdS + 16 && u32be(stsdS + 4) >= 1
        codec = new String(bytes, stsdS + 12, 4, "US-ASCII")
        (sttsS, sttsE) <- one(stblKids, "stts")
        if sttsE >= sttsS + 8
        nSamples <- {
          val n = u32be(sttsS + 4)
          if (sttsS + 8 + n * 8 > sttsE) None
          else Some((0L until n).map(k => u32be(sttsS + 8 + k.toInt * 8)).sum)
        }
      } yield {
        val sync = one(stblKids, "stss") match {
          case Some((stssS, stssE)) if stssE >= stssS + 8 =>
            val k = u32be(stssS + 4)
            if (stssS + 8 + k * 4 > stssE || k == 0) None
            else Some((k, u32be(stssS + 8), u32be(stssS + 8 + (k.toInt - 1) * 4)))
          case Some(_) => None
          // no stss box: every sample is a sync sample (14496-12 §8.6.2)
          case None => Some((nSamples, 1L, nSamples))
        }
        sync.map { case (nk, kf, kl) =>
          Mp4Track(trackId, handler, codec, ts, dur, dur * 1000L / ts,
            nSamples, nk, kf, kl)
        }
      }
      parsed.flatten.foreach(tracks += _)
    }
    Some(tracks.result())
  }

  /** One output row per recovered track — mapPartitions batch decode, scan-
    * parallel like [[withWavMeta]]; a doc whose container fails the walk
    * contributes no rows (honest, never fabricated).
    */
  def mp4Tracks(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", df.schema(idCol).dataType),
      StructField("track_id", LongType),
      StructField("handler", StringType),
      StructField("codec", StringType),
      StructField("timescale", LongType),
      StructField("duration_ms", LongType),
      StructField("n_samples", LongType),
      StructField("n_keyframes", LongType),
      StructField("kf_first", LongType),
      StructField("kf_last", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.get(idIdx)
        parseMp4Tracks(r.getAs[Array[Byte]](binIdx)).getOrElse(Seq.empty).map { t =>
          Row(id, t.trackId, t.handler, t.codec, t.timescale, t.durationMs,
            t.nSamples, t.nKeyframes, t.kfFirst, t.kfLast)
        }
      }
    }(enc)
  }

  /** Batched MP4 metadata extraction — the [[withWavMeta]] mapPartitions
    * decode shape; unparseable rows get a null `mp4_meta`. */
  def withMp4Meta(df: DataFrame, binCol: String): DataFrame = {
    val schema = df.schema.add("mp4_meta", mp4Schema)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val m = parseMp4(r.getAs[Array[Byte]](binIdx)).orNull
        val metaRow =
          if (m == null) null
          else Row(m.nBoxes, m.timescale, m.durationTicks, m.durationMs,
            m.mdatDeclared, m.truncated)
        Row.fromSeq(r.toSeq :+ metaRow)
      }
    }(enc)
  }

  // --- AVI (RIFF) MJPEG: REAL video-frame decode tier ----------------------
  //
  // MJPEG-in-AVI is the one public video format a pure-JVM engine can decode
  // end-to-end: every frame is a standalone baseline JPEG, so the container
  // walk (RIFF, same discipline as parseWav) + the [[Jpeg]] codec give real
  // per-frame pixels — closing the "video stops at container metadata" tier.

  /** Minimal RIFF/AVI MJPEG writer:
    * `RIFF('AVI ')[LIST(hdrl)[avih(56)], LIST(movi)['00dc' frame]…]`, word
    * padding per the RIFF spec. avih carries usec/frame, total frames and
    * the first frame's SOF dims — enough structure for any RIFF walker.
    */
  def encodeAviMjpeg(frames: Seq[Array[Byte]], usecPerFrame: Int = 40000): Array[Byte] = {
    require(frames.nonEmpty, "encodeAviMjpeg: no frames")
    val out = new java.io.ByteArrayOutputStream()
    def u32le(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val (w0, h0) = parseDims(frames.head).map(d => (d._2, d._3)).getOrElse((0, 0))
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlList = 12 + 8 + 56  // LIST hdr + avih chunk
    val moviList = 12 + moviBody
    cc("RIFF"); u32le(4 + hdrlList + moviList); cc("AVI ")
    cc("LIST"); u32le(4 + 8 + 56); cc("hdrl")
    cc("avih"); u32le(56)
    u32le(usecPerFrame); u32le(0); u32le(0); u32le(0)      // usec/frame, maxbps, padding, flags
    u32le(frames.size); u32le(0); u32le(1); u32le(0)       // totalFrames, initial, streams, bufSize
    u32le(w0); u32le(h0); u32le(0); u32le(0); u32le(0); u32le(0) // dims + reserved[4]
    cc("LIST"); u32le(4 + moviBody); cc("movi")
    frames.foreach { f =>
      cc("00dc"); u32le(f.length); out.write(f)
      if ((f.length & 1) == 1) out.write(0)                // RIFF word padding
    }
    out.toByteArray
  }

  /** Frame table of an AVI's movi LIST: (offset, length) per `..dc`/`..db`
    * chunk, in stream order. RIFF walk with word padding; a chunk whose
    * declared size runs past the bytes is dropped (truncated-crawl
    * tolerance — frames before it survive). None for non-AVI bytes.
    */
  def parseAviFrames(bytes: Array[Byte]): Option[Seq[(Int, Int)]] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def u32le(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val frames = Seq.newBuilder[(Int, Int)]
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val size = u32le(i + 4)
      if (id == "LIST" && i + 12 <= bytes.length && tag(i + 8) == "movi") {
        var j = i + 12
        val end = math.min(i + 8 + size, bytes.length.toLong).toInt
        while (j + 8 <= end) {
          val cid = tag(j)
          val csz = u32le(j + 4)
          if (cid.endsWith("dc") || cid.endsWith("db")) {
            if (j + 8 + csz <= end) frames += ((j + 8, csz.toInt))
          }
          j += 8 + csz.toInt + (csz.toInt & 1)
        }
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    Some(frames.result())
  }

  /** One row per video frame with REAL decode: dims from each frame's JPEG
    * SOF header ([[parseDims]]) and mean luma + dHash from the full
    * [[Jpeg]] pixel decode — the mapPartitions batch shape, scan-parallel,
    * no shuffle. A frame whose bytes don't decode lands NULL pixel columns
    * (dims may still parse); a doc that isn't AVI contributes no rows.
    */
  def aviFrames(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", df.schema(idCol).dataType),
      StructField("frame_idx", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", LongType),
      StructField("dhash_hi", LongType),
      StructField("dhash_lo", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.get(idIdx)
        val bytes = r.getAs[Array[Byte]](binIdx)
        val table = parseAviFrames(bytes).getOrElse(Seq.empty)
        table.zipWithIndex.map { case ((off, len), fi) =>
          val fb = java.util.Arrays.copyOfRange(bytes, off, off + len)
          val dims = parseDims(fb)
          val img = Jpeg.decode(fb)
          val luma = img.map { im =>
            var s = 0L
            var y = 0
            while (y < im.height) {
              var x = 0
              while (x < im.width) { s += im.luma(x, y); x += 1 }
              y += 1
            }
            Long.box(s / (im.width.toLong * im.height))
          }.orNull
          val dh = img.filter(im => im.width >= 9 && im.height >= 8).map(dHash64)
          Row(id, fi, table.size,
            dims.map(d => Int.box(d._2)).orNull, dims.map(d => Int.box(d._3)).orNull,
            luma,
            dh.map(h => Long.box(h >>> 32)).orNull,
            dh.map(h => Long.box(h & 0xFFFFFFFFL)).orNull)
        }
      }
    }(enc)
  }

  /** documents → (doc_id, avi bytes): 2..5 MJPEG frames per doc, frame f
    * sized (docId%8 + f%3 + 9) × (docId%7 + f%2 + 8) with [[synthPixel]]
    * gray content shifted by 17·f — dims/counts are doc_id-formula-
    * derivable for the oracle while the PIXELS exercise the real JPEG
    * encode→container→extract→decode loop (lossy, so pixel values are
    * spec-pinned by error bounds, not oracle hashes).
    */
  def syntheticAviAssets(docs: DataFrame): DataFrame = {
    // min-parallelism guard (Dedup.parallelize): per-row JPEG encode x
    // n_frames + AVI mux is the heaviest codec path — a one-row-group scan
    // runs it on ONE task (measured 2.1 -> 0.9 s; the cheaper PNG/BMP
    // builders measured SLOWER under the guard, the repartition round-trip
    // beats their codec cost, so they stay scan-partitioned)
    val in = Dedup.parallelize(docs.select(col("doc_id")))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("video", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val nf = (id % 4 + 2).toInt
        val frames = (0 until nf).map { f =>
          val w = (id % 8 + f % 3 + 9).toInt
          val h = (id % 7 + f % 2 + 8).toInt
          Jpeg.encodeGray(w, h, 80, (x, y) => synthPixel(id + 17L * f, x, y, 0))
        }
        Row(id, encodeAviMjpeg(frames))
      }
    }(enc)
  }
}
