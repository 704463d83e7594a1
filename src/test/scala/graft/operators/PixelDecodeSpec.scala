package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real pixel decode: BMP24 and baseline PNG (inflate + unfilter) round
  * trips, dHash invariants, and the pigeonhole near-dup join verified
  * against brute force.
  */
class PixelDecodeSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("pixel-decode-spec")
    .getOrCreate()

  private def px(x: Int, y: Int, c: Int): Int = (x * 13 + y * 31 + c * 101) % 256

  test("BMP24 encode→decode round trip recovers every pixel, incl. row padding widths") {
    for (w <- Seq(1, 3, 4, 9, 16); h <- Seq(1, 2, 8, 11)) {
      val bytes = Multimodal.encodeBmp24(w, h,
        (x, y) => (px(x, y, 0) << 16) | (px(x, y, 1) << 8) | px(x, y, 2))
      val img = Multimodal.decodeBmp24(bytes).get
      assert(img.width == w && img.height == h && img.channels == 3)
      for (x <- 0 until w; y <- 0 until h; c <- 0 until 3)
        assert(img.channel(x, y, c) == px(x, y, c), s"($w x $h) at ($x,$y,$c)")
    }
  }

  test("PNG round trip exercises all five filter types (encoder cycles per row)") {
    for (channels <- Seq(1, 3); w <- Seq(1, 2, 9, 16); h <- Seq(6, 8, 14)) {
      // h >= 6 guarantees rows with filters 0..4 all occur
      val bytes = Multimodal.encodePng(w, h, channels, px)
      val img = Multimodal.decodePng(bytes).get
      assert(img.width == w && img.height == h && img.channels == channels)
      for (x <- 0 until w; y <- 0 until h; c <- 0 until channels)
        assert(img.channel(x, y, c) == px(x, y, c),
          s"($w x $h x $channels) at ($x,$y,$c) filter ${y % 5}")
    }
  }

  test("decode rejects truncated and foreign bytes instead of fabricating pixels") {
    val good = Multimodal.encodePng(9, 8, 1, px)
    assert(Multimodal.decodePng(good.take(40)).isEmpty)   // truncated IDAT
    assert(Multimodal.decodePng("plain text".getBytes).isEmpty)
    assert(Multimodal.decodeBmp24("BMshort".getBytes).isEmpty)
    // 32-bit BMPs are out of the uncompressed-24 contract
    val bmp = Multimodal.encodeBmp24(4, 4, (_, _) => 0)
    bmp(28) = 32 // patch bit count
    assert(Multimodal.decodeBmp24(bmp).isEmpty)
  }

  test("resizeImage: identity at same dims; hand-computed box means; gray luma identity") {
    // 4x2 RGB, distinct channel values
    val src = Multimodal.Image(4, 2, 3,
      (for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
        yield px(x, y, c).toByte).toArray)
    // identity: same dims reproduce every pixel
    val same = Multimodal.resizeImage(src, 4, 2)
    for (x <- 0 until 4; y <- 0 until 2; c <- 0 until 3)
      assert(same.channel(x, y, c) == src.channel(x, y, c))
    // 2x1: cell (0,0) = floor mean of the 2x2 left block, per channel
    val half = Multimodal.resizeImage(src, 2, 1)
    assert(half.width == 2 && half.height == 1 && half.channels == 3)
    for (cx <- 0 until 2; c <- 0 until 3) {
      val exp = (for (x <- cx * 2 until cx * 2 + 2; y <- 0 until 2)
        yield px(x, y, c)).sum / 4
      assert(half.channel(cx, 0, c) == exp, s"cell $cx channel $c")
    }
    // 1x1 collapses to the global floor mean
    val one = Multimodal.resizeImage(src, 1, 1)
    for (c <- 0 until 3)
      assert(one.channel(0, 0, c) ==
        (for (x <- 0 until 4; y <- 0 until 2) yield px(x, y, c)).sum / 8)
    // non-divisible partition: 3 -> 2 puts 2 columns in cell 0, 1 in cell 1
    // (x*2/3 = 0,0,1) — the floor map, not rounding
    val g3 = Multimodal.Image(3, 1, 1, Array[Byte](10, 20, 90))
    val g2 = Multimodal.resizeImage(g3, 2, 1)
    assert(g2.channel(0, 0, 0) == 15 && g2.channel(1, 0, 0) == 90)
    // gray: luma of the resized image IS the resized value
    assert(g2.luma(0, 0) == 15)
    // target larger than source must be refused, not upsampled silently
    assertThrows[IllegalArgumentException](Multimodal.resizeImage(g3, 4, 1))
  }

  test("resize/resample fuzz: agree with a naive per-cell reference on random dims") {
    val rnd = new scala.util.Random(20260816)
    for (_ <- 0 until 120) {
      val (w, h) = (1 + rnd.nextInt(24), 1 + rnd.nextInt(20))
      val ch = Seq(1, 3, 4)(rnd.nextInt(3))
      val data = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val img = Multimodal.Image(w, h, ch, data)
      val (dw, dh) = (1 + rnd.nextInt(w), 1 + rnd.nextInt(h))
      val rz = Multimodal.resizeImage(img, dw, dh)
      for (cx <- 0 until dw; cy <- 0 until dh; c <- 0 until ch) {
        val box = for {
          x <- 0 until w if x * dw / w == cx
          y <- 0 until h if y * dh / h == cy
        } yield img.channel(x, y, c).toLong
        assert(rz.channel(cx, cy, c) == (box.sum / box.size).toInt,
          s"${w}x$h/$ch -> ${dw}x$dh cell ($cx,$cy,$c)")
      }
      val n = 1 + rnd.nextInt(40)
      val s = Array.fill(n)(rnd.nextInt(65536) - 32768)
      val m = 1 + rnd.nextInt(n)
      val out = Multimodal.resamplePcm(s, m)
      for (j <- 0 until m) {
        val box = (0 until n).filter(i => i.toLong * m / n == j).map(s(_).toLong)
        assert(out(j) == (box.sum / box.size).toInt, s"pcm $n->$m slot $j")
      }
    }
  }

  test("resize/resample invariants: outputs bounded by input range; constant input is a fixed point") {
    // constant image resizes to the same constant at any target
    val const = Multimodal.Image(6, 6, 3, Array.fill(6 * 6 * 3)(77.toByte))
    for ((dw, dh) <- Seq((6, 6), (3, 2), (1, 1))) {
      val r = Multimodal.resizeImage(const, dw, dh)
      for (x <- 0 until dw; y <- 0 until dh; c <- 0 until 3)
        assert(r.channel(x, y, c) == 77)
    }
    // box means are bounded by the input range (no overshoot — a box
    // filter, unlike bicubic, cannot ring)
    val img = Multimodal.Image(5, 3, 1,
      Array.tabulate(15)(i => ((i * 37 + 11) % 256).toByte))
    val vals = (0 until 5).flatMap(x => (0 until 3).map(y => img.channel(x, y, 0)))
    val rz = Multimodal.resizeImage(img, 2, 2)
    for (x <- 0 until 2; y <- 0 until 2)
      assert(rz.channel(x, y, 0) >= vals.min && rz.channel(x, y, 0) <= vals.max)
    // same for PCM, with negatives in range
    val s = Array.tabulate(17)(i => (i * 997 % 30001) - 15000)
    val out = Multimodal.resamplePcm(s, 5)
    assert(out.forall(v => v >= s.min && v <= s.max))
    assert(Multimodal.resamplePcm(Array.fill(9)(-123), 4).toSeq == Seq.fill(4)(-123))
  }

  test("resamplePcm: identity, hand-computed box means, and NEGATIVE-sum truncation toward zero") {
    val s = Array(10, 20, -7, -8)
    // identity
    assert(Multimodal.resamplePcm(s, 4).toSeq == s.toSeq)
    // 2 slots of 2: (10+20)/2 = 15; (-7-8)/2 = -15/2 = -7 (truncation
    // toward zero — DuckDB's // agrees; floor would give -8)
    assert(Multimodal.resamplePcm(s, 2).toSeq == Seq(15, -7))
    // 1 slot: 15/4 = 3 (truncating)
    assert(Multimodal.resamplePcm(s, 1).toSeq == Seq(3))
    // non-divisible: 3 samples -> 2 slots puts i=0,1 in slot 0 (i*2/3 = 0,0,1)
    assert(Multimodal.resamplePcm(Array(1, 5, 9), 2).toSeq == Seq(3, 9))
    assertThrows[IllegalArgumentException](Multimodal.resamplePcm(Array(1), 2))
  }

  test("dHash: identical images collide, one-pixel perturbation flips at most one bit") {
    val a = Multimodal.decodePng(Multimodal.encodePng(9, 8, 1, (x, y, _) => (x * 20 + y) % 200)).get
    val b = Multimodal.decodePng(Multimodal.encodePng(9, 8, 1, (x, y, _) => (x * 20 + y) % 200)).get
    assert(Multimodal.dHash64(a) == Multimodal.dHash64(b))
    val c = Multimodal.decodePng(Multimodal.encodePng(9, 8, 1,
      (x, y, _) => if (x == 0 && y == 0) 255 else (x * 20 + y) % 200)).get
    assert(java.lang.Long.bitCount(Multimodal.dHash64(a) ^ Multimodal.dHash64(c)) <= 1)
    // dHash is resolution-tolerant by construction: same gradient at 2× size
    val big = Multimodal.decodePng(Multimodal.encodePng(18, 16, 1,
      (x, y, _) => ((x / 2) * 20 + (y / 2)) % 200)).get
    assert(Multimodal.dHash64(big) == Multimodal.dHash64(a))
  }

  test("dHashPairs pigeonhole join == brute-force all-pairs at hamming <= 3") {
    import spark.implicits._
    val docs = spark.range(0, 240).select(col("id").as("doc_id"))
    val hashed = Multimodal
      .withDecodedPixels(Multimodal.nearDupAssets(docs, 37), "asset")
      .select(col("doc_id"),
        col("pixel_meta.dhash_hi").as("hi"), col("pixel_meta.dhash_lo").as("lo"))
    val fast = Multimodal.dHashPairs(hashed, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val local = hashed.as[(Long, Long, Long)].collect()
    val brute = (for {
      (ia, hiA, loA) <- local; (ib, hiB, loB) <- local if ia < ib
      d = java.lang.Long.bitCount(hiA ^ hiB) + java.lang.Long.bitCount(loA ^ loB)
      if d <= 3
    } yield (ia, ib, d)).toSet
    assert(fast == brute)
    assert(brute.nonEmpty, "engineered families must actually produce near-dups")
  }

  test("withDecodedPixels yields null meta for undecodable rows, stats for real ones") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.encodeBmp24(9, 8, (_, _) => 0x808080)),
      (2L, "not an image".getBytes)
    ).toDF("doc_id", "asset")
    val out = Multimodal.withDecodedPixels(df, "asset")
      .select(col("doc_id"), col("pixel_meta")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) == false && out(2L) == true)
    val m = Multimodal.withDecodedPixels(df.where(col("doc_id") === 1L), "asset")
      .select(col("pixel_meta.mean_r"), col("pixel_meta.format")).collect()(0)
    assert(m.getLong(0) == 0x80 && m.getString(1) == "bmp")
  }

  test("PCM16 WAV encode→decode round trip recovers every sample incl. negatives") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345, 255, -256)
    val back = Multimodal.decodeWavSamples(
      Multimodal.encodeWavPcm16(16000, samples)).get
    assert(back.toSeq == samples.toSeq)
    // non-PCM16 payloads refuse rather than fabricate
    assert(Multimodal.decodeWavSamples("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeWavSamples(
      Multimodal.encodeBmp24(9, 8, (_, _) => 0)).isEmpty)
  }

  test("GIF gray encode→decode round trip recovers every pixel") {
    for ((w, h) <- Seq((9, 8), (16, 14), (300, 2))) { // 300*2=600 codes spans clears
      val img = Multimodal.decodeGif(
        Multimodal.encodeGifGray(w, h, (x, y) => (x * 13 + y * 31) % 256)).get
      assert(img.width == w && img.height == h && img.channels == 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        assert(img.channel(x, y, c) == (x * 13 + y * 31) % 256)
    }
  }

  test("GIF decoder handles REAL compressed LZW (dictionary growth + cScSc)") {
    // a genuine GIF-LZW compressor (greedy longest-match dictionary,
    // growing code width, 12-bit cap) written HERE so the repo decoder is
    // tested against streams its own literal-code encoder never produces;
    // the all-runs pattern forces composite codes and the cScSc case
    def compress(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def u16le(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      out.write("GIF89a".getBytes("US-ASCII")); u16le(w); u16le(h)
      out.write(0xF7); out.write(0); out.write(0)
      for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
      out.write(0x2C); u16le(0); u16le(0); u16le(w); u16le(h); out.write(0)
      out.write(8)
      val clear = 256; val eoi = 257
      var dict = scala.collection.mutable.HashMap[Seq[Byte], Int]()
      var nextCode = 258; var codeSize = 9
      var bitBuf = 0L; var bitCnt = 0
      val data = new java.io.ByteArrayOutputStream()
      def put(code: Int): Unit = {
        bitBuf |= code.toLong << bitCnt; bitCnt += codeSize
        while (bitCnt >= 8) { data.write((bitBuf & 0xFF).toInt); bitBuf >>= 8; bitCnt -= 8 }
      }
      put(clear)
      var cur: Seq[Byte] = Seq.empty
      px.foreach { b =>
        val ext = cur :+ b
        if (ext.length == 1 || dict.contains(ext)) cur = ext
        else {
          put(if (cur.length == 1) cur.head & 0xFF else dict(cur))
          if (nextCode < 4096) {
            dict(ext) = nextCode
            // width grows when nextCode reaches the current code range —
            // mirror of the decoder's growth rule
            if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
            nextCode += 1
          }
          cur = Seq(b)
        }
      }
      if (cur.nonEmpty) put(if (cur.length == 1) cur.head & 0xFF else dict(cur))
      put(eoi)
      if (bitCnt > 0) data.write((bitBuf & 0xFF).toInt)
      val bytes = data.toByteArray
      var off = 0
      while (off < bytes.length) {
        val len = math.min(255, bytes.length - off)
        out.write(len); out.write(bytes, off, len); off += len
      }
      out.write(0); out.write(0x3B)
      out.toByteArray
    }
    val w = 64; val h = 48
    // long runs (cScSc trigger) + structure
    val px = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      (if (y % 3 == 0) 7 else (x / 8 * 16 + y % 5)).toByte
    }
    val img = Multimodal.decodeGif(compress(w, h, px)).get
    assert(img.width == w && img.height == h)
    for (i <- 0 until w * h)
      assert(img.channel(i % w, i / w, 0) == (px(i) & 0xFF),
        s"pixel $i: ${img.channel(i % w, i / w, 0)} != ${px(i) & 0xFF}")
  }
}
