package graft.operators

/** Pure-JVM baseline JPEG (ISO/IEC 10918-1) — the last image format in
  * [[Multimodal.parseDims]]'s family to gain REAL pixel decode (BMP, PNG,
  * GIF are exact; JPEG is lossy by nature, so its contract is a bounded
  * round-trip error, spec-pinned rather than oracle-hashed).
  *
  * Decoder ([[decode]]): general baseline path — DQT (8-bit tables), SOF0
  * (1 or 3 components, sampling factors ≤ 4), DHT (canonical Huffman built
  * generically from the stream's DHT segments — any valid table set),
  * DRI/RSTn restart handling, byte-unstuffed entropy decode (DC category +
  * EXTEND, AC run/size with ZRL and EOB), dequant, separable double-
  * precision IDCT, nearest-neighbor chroma upsample, JFIF YCbCr→RGB.
  *
  * Encoder ([[encodeGray]]/[[encodeRgb]]): quality-scaled Annex-K quant
  * tables (the libjpeg 5000/q · 200−2q law), forward DCT, and SIMPLE
  * fixed-length canonical Huffman tables written into DHT (all 12 DC
  * categories at 4 bits, all AC run/size symbols at 8) — poorer
  * compression than the standard tables but fully spec-valid, and it keeps
  * the encoder small while the decoder still exercises the general
  * canonical-table machinery. Optional 4:2:0 subsampling (box-mean chroma)
  * exercises the decoder's multi-block MCU + upsample path.
  */
object Jpeg {

  // Annex K base quantization tables, natural (row-major) order
  private val QLum = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  private val QChr = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Zigzag order: zigzag(i) = natural index of the i-th coefficient. */
  private val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(t => math.max(1, math.min(255, (t * scale + 50) / 100)))
  }

  private val CosT = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Forward DCT-II of a level-shifted 8×8 block (double). */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) { s += block(x * 8 + y) * CosT(x)(u) * CosT(y)(v); y += 1 }
          x += 1
        }
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        out(u * 8 + v) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse DCT of a dequantized 8×8 block. */
  private def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
            val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
            s += cu * cv * coef(u * 8 + v) * CosT(x)(u) * CosT(y)(v)
            v += 1
          }
          u += 1
        }
        out(x * 8 + y) = 0.25 * s
        y += 1
      }
      x += 1
    }
    out
  }

  // ------------------------------------------------------------- encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((bits >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xFF) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { // pad with 1s (spec)
      buf = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      out.write(buf)
      if (buf == 0xFF) out.write(0x00)
      buf = 0; cnt = 0
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** Simple fixed-length canonical DC table: 12 categories, all 4 bits.
    * Canonical assignment → symbol s gets code s. */
  private def putDc(bw: BitWriter, diff: Int): Unit = {
    val cat = category(diff)
    bw.put(cat, 4)
    if (cat > 0) {
      val bits = if (diff >= 0) diff else diff + (1 << cat) - 1
      bw.put(bits, cat)
    }
  }

  /** AC symbols all 8 bits, canonical over ASCENDING symbol value — code
    * of symbol s is its RANK among the emitted symbol set. The DHT lists
    * symbols in that order, so decoder and encoder agree. */
  private val AcSymbols: Array[Int] = {
    val syms = scala.collection.mutable.ArrayBuffer[Int]()
    syms += 0x00 // EOB
    for (r <- 0 to 15; s <- 1 to 10) syms += ((r << 4) | s)
    syms += 0xF0 // ZRL
    syms.toArray.sorted
  }
  private val AcRank: Map[Int, Int] = AcSymbols.zipWithIndex.toMap

  private def putAc(bw: BitWriter, sym: Int, extra: Int, extraBits: Int): Unit = {
    bw.put(AcRank(sym), 8)
    if (extraBits > 0) bw.put(extra, extraBits)
  }

  private def encodeBlock(bw: BitWriter, px: Array[Double], q: Array[Int],
      dcPred: Int): Int = {
    val coef = fdct(px)
    val zz = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val n = Zigzag(i)
      // clamp to the 8-bit baseline coefficient range so every magnitude
      // fits the emitted Huffman tables (AC size <= 10, DC cat <= 11)
      val v = math.round(coef(n) / q(n)).toInt
      zz(i) = math.max(-1023, math.min(1023, v))
      i += 1
    }
    putDc(bw, zz(0) - dcPred)
    var run = 0
    var k = 1
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run >= 16) { putAc(bw, 0xF0, 0, 0); run -= 16 }
        val cat = category(zz(k))
        val bits = if (zz(k) >= 0) zz(k) else zz(k) + (1 << cat) - 1
        putAc(bw, (run << 4) | cat, bits, cat)
        run = 0
      }
      k += 1
    }
    if (run > 0) putAc(bw, 0x00, 0, 0)
    zz(0)
  }

  private def writeDht(out: java.io.ByteArrayOutputStream, tc: Int, th: Int,
      counts: Array[Int], symbols: Array[Int]): Unit = {
    val len = 2 + 1 + 16 + symbols.length
    out.write(0xFF); out.write(0xC4)
    out.write(len >> 8); out.write(len & 0xFF)
    out.write((tc << 4) | th)
    for (l <- 1 to 16) out.write(counts(l - 1))
    symbols.foreach(out.write)
  }

  /** Baseline JPEG bytes for an 8-bit image. `sample(x, y, c)` returns the
    * channel value (c ignored when gray). RGB uses JFIF YCbCr; `sub420`
    * emits 2×2-subsampled chroma (RGB only). */
  def encode(w: Int, h: Int, gray: Boolean, quality: Int, sub420: Boolean,
      sample: (Int, Int, Int) => Int, restartEvery: Int = 0): Array[Byte] = {
    val qL = scaledQuant(QLum, quality)
    val qC = scaledQuant(QChr, quality)
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xFF)
      payload.foreach(out.write)
    }
    marker(0xD8) // SOI
    seg(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) // APP0
    seg(0xDB, 0 +: Zigzag.map(qL(_))) // DQT 0 in zigzag order
    if (!gray) seg(0xDB, 1 +: Zigzag.map(qC(_)))
    val comps = if (gray) 1 else 3
    val hY = if (sub420 && !gray) 2 else 1
    // SOF0
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, comps) ++
      (if (gray) Array(1, 0x11, 0)
       else Array(1, (hY << 4) | hY, 0, 2, 0x11, 1, 3, 0x11, 1)))
    // DHT: fixed-length canonical tables (see class doc)
    val dcCounts = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val acCounts = Array(0, 0, 0, 0, 0, 0, 0, AcSymbols.length, 0, 0, 0, 0, 0, 0, 0, 0)
    writeDht(out, 0, 0, dcCounts, (0 to 11).toArray)
    writeDht(out, 1, 0, acCounts, AcSymbols)
    if (!gray) { writeDht(out, 0, 1, dcCounts, (0 to 11).toArray)
      writeDht(out, 1, 1, acCounts, AcSymbols) }
    if (restartEvery > 0)
      seg(0xDD, Array(restartEvery >> 8, restartEvery & 0xFF)) // DRI
    // SOS
    seg(0xDA, Array(comps) ++
      (if (gray) Array(1, 0x00) else Array(1, 0x00, 2, 0x11, 3, 0x11)) ++
      Array(0, 63, 0))
    val bw = new BitWriter(out)
    // planes in YCbCr (or gray)
    def ycc(x: Int, y: Int): (Double, Double, Double) = {
      val r = sample(x, y, 0); val g = sample(x, y, 1); val b = sample(x, y, 2)
      (0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    }
    def blockOf(plane: (Int, Int) => Double, bx: Int, by: Int, pw: Int, ph: Int): Array[Double] =
      Array.tabulate(64) { i =>
        val x = math.min(bx * 8 + (i % 8), pw - 1)
        val y = math.min(by * 8 + (i / 8), ph - 1)
        plane(x, y) - 128.0
      }
    var rstIdx = 0
    var mcuCount = 0
    def maybeRestart(resetDc: () => Unit): Unit = {
      if (restartEvery > 0 && mcuCount > 0 && mcuCount % restartEvery == 0) {
        bw.flush()
        out.write(0xFF); out.write(0xD0 + (rstIdx % 8))
        rstIdx += 1
        resetDc()
      }
    }
    if (gray) {
      var dc = 0
      for (by <- 0 until (h + 7) / 8; bx <- 0 until (w + 7) / 8) {
        maybeRestart(() => dc = 0)
        dc = encodeBlock(bw, blockOf((x, y) => sample(x, y, 0), bx, by, w, h), qL, dc)
        mcuCount += 1
      }
    } else if (!sub420) {
      // 4:4:4 — MCU is one block per component, interleaved Y Cb Cr
      var dcY = 0; var dcCb = 0; var dcCr = 0
      for (by <- 0 until (h + 7) / 8; bx <- 0 until (w + 7) / 8) {
        dcY = encodeBlock(bw, blockOf((x, y) => ycc(x, y)._1, bx, by, w, h), qL, dcY)
        dcCb = encodeBlock(bw, blockOf((x, y) => ycc(x, y)._2, bx, by, w, h), qC, dcCb)
        dcCr = encodeBlock(bw, blockOf((x, y) => ycc(x, y)._3, bx, by, w, h), qC, dcCr)
      }
    } else {
      // 4:2:0 — MCU = 4 Y blocks + 1 Cb + 1 Cr over a 16×16 tile
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      def cbAt(cx: Int, cy: Int, idx: Int): Double = {
        var s = 0.0; var n = 0
        for (dy <- 0 until 2; dx <- 0 until 2) {
          val x = cx * 2 + dx; val y = cy * 2 + dy
          if (x < w && y < h) { s += (if (idx == 0) ycc(x, y)._2 else ycc(x, y)._3); n += 1 }
        }
        s / n
      }
      var dcY = 0; var dcCb = 0; var dcCr = 0
      for (my <- 0 until (h + 15) / 16; mx <- 0 until (w + 15) / 16) {
        for (sy <- 0 until 2; sx <- 0 until 2)
          dcY = encodeBlock(bw,
            blockOf((x, y) => ycc(x, y)._1, mx * 2 + sx, my * 2 + sy, w, h), qL, dcY)
        dcCb = encodeBlock(bw, blockOf(cbAt(_, _, 0), mx, my, cw, ch), qC, dcCb)
        dcCr = encodeBlock(bw, blockOf(cbAt(_, _, 1), mx, my, cw, ch), qC, dcCr)
      }
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  def encodeGray(w: Int, h: Int, quality: Int, sample: (Int, Int) => Int): Array[Byte] =
    encode(w, h, gray = true, quality, sub420 = false, (x, y, _) => sample(x, y))

  def encodeRgb(w: Int, h: Int, quality: Int, sub420: Boolean,
      sample: (Int, Int, Int) => Int): Array[Byte] =
    encode(w, h, gray = false, quality, sub420, sample)

  // ------------------------------------------------------------- decoder

  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    // canonical codes: (length, code) -> symbol
    val maxLen = 16
    private val codeMap = {
      val m = scala.collection.mutable.HashMap[(Int, Int), Int]()
      var code = 0
      var k = 0
      for (l <- 1 to 16) {
        var i = 0
        while (i < counts(l - 1)) { m((l, code)) = symbols(k); code += 1; k += 1; i += 1 }
        code <<= 1
      }
      m
    }
    def lookup(len: Int, code: Int): Option[Int] = codeMap.get((len, code))
  }

  private final class BitReader(data: Array[Byte]) {
    private var pos = 0
    private var buf = 0
    private var cnt = 0
    var markerHit = false
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) { markerHit = true; return 0 }
        var b = data(pos) & 0xFF; pos += 1
        if (b == 0xFF) {
          if (pos < data.length && (data(pos) & 0xFF) == 0x00) pos += 1
          else { markerHit = true; b = 0 } // real marker: stop
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
    def align(): Unit = cnt = 0
    /** consume a RSTn marker at the current byte position, if present */
    def restart(): Boolean = {
      align()
      if (pos + 1 < data.length && (data(pos) & 0xFF) == 0xFF &&
        ((data(pos + 1) & 0xFF) >= 0xD0) && ((data(pos + 1) & 0xFF) <= 0xD7)) {
        pos += 2; markerHit = false; true
      } else false
    }
  }

  private def decodeHuff(br: BitReader, h: Huff): Int = {
    var code = 0
    var len = 0
    while (len < 16) {
      code = (code << 1) | br.bit()
      len += 1
      h.lookup(len, code) match {
        case Some(s) => return s
        case None => ()
      }
      if (br.markerHit) return -1
    }
    -1
  }

  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v

  /** Baseline JPEG → [[Multimodal.Image]] (gray for 1 component, RGB for
    * 3). None for progressive/arithmetic/12-bit/truncated streams. */
  def decode(bytes: Array[Byte]): Option[Multimodal.Image] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    try {
      val quant = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var w = 0; var h = 0
      var comps: Array[(Int, Int, Int, Int)] = null // (id, hSamp, vSamp, quantId)
      var restartInterval = 0
      var p = 2
      while (p + 3 < bytes.length) {
        if (u8(p) != 0xFF) return None
        val m = u8(p + 1)
        if (m == 0xD9) return None // EOI before SOS
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) p += 2
        else {
          val len = u16(p + 2)
          m match {
            case 0xDB =>
              var q = p + 4
              while (q < p + 2 + len) {
                val pq = u8(q) >> 4; val tq = u8(q) & 15
                if (pq != 0) return None // 16-bit tables: out of scope
                val t = new Array[Int](64)
                for (i <- 0 until 64) t(Zigzag(i)) = u8(q + 1 + i)
                quant(tq) = t
                q += 65
              }
            case 0xC4 =>
              var q = p + 4
              while (q < p + 2 + len) {
                val tc = u8(q) >> 4; val th = u8(q) & 15
                val counts = Array.tabulate(16)(i => u8(q + 1 + i))
                val n = counts.sum
                val syms = Array.tabulate(n)(i => u8(q + 17 + i))
                val t = new Huff(counts, syms)
                if (tc == 0) dcTabs(th) = t else acTabs(th) = t
                q += 17 + n
              }
            case 0xC0 =>
              h = u16(p + 5); w = u16(p + 7)
              if (u8(p + 4) != 8) return None
              val nc = u8(p + 9)
              if (nc != 1 && nc != 3) return None
              comps = Array.tabulate(nc) { i =>
                val o = p + 10 + i * 3
                (u8(o), u8(o + 1) >> 4, u8(o + 1) & 15, u8(o + 2))
              }
            case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
                 0xCB | 0xCD | 0xCE | 0xCF =>
              return None // only baseline sequential SOF0
            case 0xDD => restartInterval = u16(p + 4)
            case 0xDA =>
              if (comps == null || w == 0) return None
              val ns = u8(p + 4)
              if (ns != comps.length) return None // interleaved scans only
              val scan = Array.tabulate(ns) { i =>
                val o = p + 5 + i * 2
                (u8(o), u8(o + 1) >> 4, u8(o + 1) & 15) // (compId, dcTab, acTab)
              }
              val dataStart = p + 2 + len
              // entropy data runs to the next non-RST marker (EOI)
              val br = new BitReader(bytes.drop(dataStart))
              val hMax = comps.map(_._2).max; val vMax = comps.map(_._3).max
              val mcuW = hMax * 8; val mcuH = vMax * 8
              val mcusX = (w + mcuW - 1) / mcuW
              val mcusY = (h + mcuH - 1) / mcuH
              // per-component plane at sampling resolution
              val planes = comps.map { case (_, hs, vs, _) =>
                new Array[Double](mcusX * hs * 8 * mcusY * vs * 8)
              }
              val dcPred = new Array[Int](comps.length)
              var mcu = 0
              var my = 0
              while (my < mcusY) {
                var mx = 0
                while (mx < mcusX) {
                  if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                    if (br.restart()) java.util.Arrays.fill(dcPred, 0)
                  }
                  var ci = 0
                  while (ci < comps.length) {
                    val (cid, hs, vs, tq) = comps(ci)
                    val (_, dcT, acT) = scan.find(_._1 == cid).getOrElse(return None)
                    val qt = quant(tq); val dh = dcTabs(dcT); val ah = acTabs(acT)
                    if (qt == null || dh == null || ah == null) return None
                    var sy = 0
                    while (sy < vs) {
                      var sx = 0
                      while (sx < hs) {
                        val zz = new Array[Int](64)
                        val s = decodeHuff(br, dh)
                        if (s < 0) return None
                        dcPred(ci) += extend(br.bits(s), s)
                        zz(0) = dcPred(ci)
                        var k = 1
                        var eob = false
                        while (k < 64 && !eob) {
                          val rs = decodeHuff(br, ah)
                          if (rs < 0) return None
                          if (rs == 0x00) eob = true
                          else if (rs == 0xF0) k += 16
                          else {
                            k += rs >> 4
                            if (k > 63) return None
                            zz(k) = extend(br.bits(rs & 15), rs & 15)
                            k += 1
                          }
                        }
                        val coef = new Array[Double](64)
                        for (i <- 0 until 64) coef(Zigzag(i)) = zz(i).toDouble * qt(Zigzag(i))
                        val px = idct(coef)
                        val pw = mcusX * hs * 8
                        val bx0 = (mx * hs + sx) * 8; val by0 = (my * vs + sy) * 8
                        for (yy <- 0 until 8; xx <- 0 until 8)
                          planes(ci)((by0 + yy) * pw + bx0 + xx) = px(yy * 8 + xx) + 128.0
                        sx += 1
                      }
                      sy += 1
                    }
                    ci += 1
                  }
                  mcu += 1
                  mx += 1
                }
                my += 1
              }
              def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
              if (comps.length == 1) {
                val pw = mcusX * comps(0)._2 * 8
                val out = new Array[Byte](w * h)
                for (y <- 0 until h; x <- 0 until w)
                  out(y * w + x) = clamp(planes(0)(y * pw + x)).toByte
                return Some(Multimodal.Image(w, h, 1, out))
              } else {
                val out = new Array[Byte](w * h * 3)
                for (y <- 0 until h; x <- 0 until w) {
                  def at(ci: Int): Double = {
                    val (_, hs, vs, _) = comps(ci)
                    val pw = mcusX * hs * 8
                    planes(ci)((y * vs / vMax) * pw + (x * hs / hMax))
                  }
                  val yv = at(0); val cb = at(1) - 128.0; val cr = at(2) - 128.0
                  val i = (y * w + x) * 3
                  out(i) = clamp(yv + 1.402 * cr).toByte
                  out(i + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr).toByte
                  out(i + 2) = clamp(yv + 1.772 * cb).toByte
                }
                return Some(Multimodal.Image(w, h, 3, out))
              }
            case _ => ()
          }
          p += 2 + len
        }
      }
      None
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }
}
