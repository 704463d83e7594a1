package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Baseline JPEG codec: bounded round-trip error (it's lossy — the
  * contract is fidelity bounds, not hashes), format coverage in the
  * decode chain, deterministic output.
  */
class JpegSpec extends AnyFunSuite {

  private def smoothGray(x: Int, y: Int): Int = (x * 3 + y * 2) % 200 + 20
  private def smoothRgb(x: Int, y: Int, c: Int): Int =
    math.min(255, (x * 2 + y + c * 40) % 180 + 30)

  test("gray round trip at q90: bounded error on smooth content") {
    val (w, h) = (40, 32)
    val img = Jpeg.decode(Jpeg.encodeGray(w, h, 90, smoothGray)).get
    assert(img.width == w && img.height == h && img.channels == 1)
    val errs = for (y <- 0 until h; x <- 0 until w)
      yield math.abs(img.channel(x, y, 0) - smoothGray(x, y))
    assert(errs.max <= 16, s"max err ${errs.max}")
    assert(errs.sum.toDouble / errs.size <= 4.0, s"mean err ${errs.sum.toDouble / errs.size}")
  }

  test("RGB 4:4:4 round trip at q90: bounded per-channel error") {
    val (w, h) = (24, 24)
    val img = Jpeg.decode(Jpeg.encodeRgb(w, h, 90, sub420 = false, smoothRgb)).get
    assert(img.width == w && img.height == h && img.channels == 3)
    val errs = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      yield math.abs(img.channel(x, y, c) - smoothRgb(x, y, c))
    assert(errs.max <= 24, s"max err ${errs.max}")
    assert(errs.sum.toDouble / errs.size <= 5.0, s"mean err ${errs.sum.toDouble / errs.size}")
  }

  test("4:2:0 subsampled round trip: multi-block MCU + upsample path, luma holds") {
    val (w, h) = (33, 18) // non-multiples of 16: edge MCUs partially covered
    val bytes = Jpeg.encodeRgb(w, h, 90, sub420 = true, smoothRgb)
    val img = Jpeg.decode(bytes).get
    assert(img.width == w && img.height == h && img.channels == 3)
    def lumaRef(x: Int, y: Int) =
      (299 * smoothRgb(x, y, 0) + 587 * smoothRgb(x, y, 1) + 114 * smoothRgb(x, y, 2)) / 1000
    val lerrs = for (y <- 0 until h; x <- 0 until w)
      yield math.abs(img.luma(x, y) - lumaRef(x, y))
    assert(lerrs.max <= 24, s"max luma err ${lerrs.max}")
    // chroma is subsampled: still bounded, just looser
    val cerrs = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      yield math.abs(img.channel(x, y, c) - smoothRgb(x, y, c))
    assert(cerrs.max <= 64, s"max chroma-path err ${cerrs.max}")
  }

  test("decode is deterministic and rejects non-JPEG / truncated bytes") {
    val bytes = Jpeg.encodeGray(16, 16, 85, smoothGray)
    val a = Jpeg.decode(bytes).get
    val b = Jpeg.decode(bytes).get
    assert(a.data.toSeq == b.data.toSeq)
    assert(Jpeg.decode(bytes.take(bytes.length / 2)).isEmpty)
    assert(Jpeg.decode("GIF87a-not-a-jpeg".getBytes).isEmpty)
    assert(Jpeg.decode(Multimodal.encodeBmp24(9, 8, (_, _) => 0x808080)).isEmpty)
  }

  test("withDecodedPixels reports jpeg format and sane stats through the chain") {
    val spark = graft.Sessions.builder("local[2]", 2).appName("jpeg-spec").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val bytes = Jpeg.encodeRgb(16, 12, 90, sub420 = false, (_, _, c) => 60 + c * 50)
    val df = Seq((1L, bytes)).toDF("doc_id", "asset")
    val m = Multimodal.withDecodedPixels(df, "asset")
      .select(col("pixel_meta.format"), col("pixel_meta.width"),
        col("pixel_meta.height"), col("pixel_meta.mean_r"),
        col("pixel_meta.mean_g"), col("pixel_meta.mean_b")).collect().head
    assert(m.getString(0) == "jpeg" && m.getInt(1) == 16 && m.getInt(2) == 12)
    // flat color survives the lossy trip within a few counts
    assert(math.abs(m.getLong(3) - 60) <= 4)
    assert(math.abs(m.getLong(4) - 110) <= 4)
    assert(math.abs(m.getLong(5) - 160) <= 4)
  }

  test("restart markers: DRI + RSTn stream decodes pixel-identically to plain") {
    val (w, h) = (40, 24) // 15 MCUs -> several restart boundaries at 4
    val plain = Jpeg.decode(Jpeg.encodeGray(w, h, 90, smoothGray)).get
    val rst = Jpeg.decode(Jpeg.encode(w, h, gray = true, 90, sub420 = false,
      (x, y, _) => smoothGray(x, y), restartEvery = 4)).get
    assert(rst.width == w && rst.height == h)
    assert(rst.data.toSeq == plain.data.toSeq,
      "restart-segmented stream must reconstruct the same pixels")
  }
}
