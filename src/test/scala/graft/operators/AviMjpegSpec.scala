package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-AVI: the real video-frame decode tier. Pins the RIFF writer/
  * walker round trip, word padding, truncation tolerance, and the LOSSY
  * half of the board's `avi_frames` query — per-frame pixels through the
  * pure-JVM [[Jpeg]] codec within quality-80 error bounds (the exact
  * discipline JpegSpec applies to still images).
  */
class AviMjpegSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("avi-mjpeg-spec")
    .getOrCreate()

  private def grayFrame(seed: Long, w: Int, h: Int): Array[Byte] =
    Jpeg.encodeGray(w, h, 80, (x, y) => Multimodal.synthPixel(seed, x, y, 0))

  test("writer/walker round trip: every frame back at its exact bytes") {
    val frames = Seq(grayFrame(1, 16, 12), grayFrame(2, 9, 8), grayFrame(3, 11, 10))
    val avi = Multimodal.encodeAviMjpeg(frames)
    val table = Multimodal.parseAviFrames(avi).get
    assert(table.size == 3)
    table.zip(frames).foreach { case ((off, len), orig) =>
      assert(len == orig.length)
      assert(java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(avi, off, off + len), orig))
    }
  }

  test("odd-length frames are word-padded; offsets stay aligned") {
    // force an odd JPEG length by trying seeds (encoder output length varies)
    val odd = (0 until 50).iterator.map(s => grayFrame(s, 10, 9))
      .find(_.length % 2 == 1)
      .getOrElse(fail("no odd-length frame among 50 seeds"))
    val even = grayFrame(999, 12, 8)
    val avi = Multimodal.encodeAviMjpeg(Seq(odd, even, odd))
    val table = Multimodal.parseAviFrames(avi).get
    assert(table.size == 3)
    assert(table.map(_._2) == Seq(odd.length, even.length, odd.length))
    val second = java.util.Arrays.copyOfRange(avi, table(1)._1, table(1)._1 + table(1)._2)
    assert(java.util.Arrays.equals(second, even))
  }

  test("truncated movi keeps the intact prefix frames; foreign bytes refuse") {
    val frames = Seq(grayFrame(5, 14, 10), grayFrame(6, 14, 10), grayFrame(7, 14, 10))
    val avi = Multimodal.encodeAviMjpeg(frames)
    val cut = avi.take(avi.length - frames.last.length / 2)
    val table = Multimodal.parseAviFrames(cut).get
    assert(table.size == 2, "frame whose extent runs past the cut must drop")
    assert(Multimodal.parseAviFrames("RIFFxxxxWAVE0000".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseAviFrames("not a container at all".getBytes).isEmpty)
  }

  test("aviFrames: real decode — dims exact, mean luma within JPEG bounds") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Seq(4L, 11L, 30L).toDF("doc_id")
    val rows = Multimodal.aviFrames(
        Multimodal.syntheticAviAssets(docs), "doc_id", "video")
      .orderBy("doc_id", "frame_idx")
      .as[(Long, Int, Int, Option[Int], Option[Int], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(rows.map(r => (r._1, r._2)).distinct.size == rows.size)
    rows.foreach { case (id, f, nf, w, h, luma, dhHi, dhLo) =>
      assert(nf == (id % 4 + 2).toInt)
      // dims come from the SOF header: exact
      assert(w.contains((id % 8 + f % 3 + 9).toInt))
      assert(h.contains((id % 7 + f % 2 + 8).toInt))
      // pixels come from the lossy decode: mean luma within quality-80
      // bounds of the formula's exact mean (JpegSpec's discipline)
      val (ww, hh) = (w.get, h.get)
      val exact = (for (y <- 0 until hh; x <- 0 until ww)
        yield Multimodal.synthPixel(id + 17L * f, x, y, 0)).sum / (ww * hh)
      assert(luma.isDefined && math.abs(luma.get - exact) <= 24,
        s"doc $id frame $f: decoded mean ${luma} vs exact $exact")
      assert(dhHi.isDefined && dhLo.isDefined, "9x8+ frames must dHash")
    }
    // frame counts: 4%4+2=2, 11%4+2=5, 30%4+2=4 frames
    assert(rows.count(_._1 == 4L) == 2 && rows.count(_._1 == 11L) == 5 &&
      rows.count(_._1 == 30L) == 4)
  }
}
