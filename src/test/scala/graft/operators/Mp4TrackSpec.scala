package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Per-track ISO-BMFF walk: full two-track parse, the no-stss
  * every-sample-is-sync rule, and the truncation/malformation tiers the
  * crawl reality demands (a damaged trak contributes no row — never
  * fabricated — while intact siblings still parse).
  */
class Mp4TrackSpec extends AnyFunSuite {

  private def hx(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def be32(v: Long): String = f"$v%08x"

  /** Mirror of SparkEntry.trakHex's fixed 272-byte layout. */
  private def trak(tid: Int, handler4cc: String, codec4cc: String,
      ts: Int, dur: Int, ns: Int, k2: Int, withStss: Boolean = true): String = {
    def cc(s: String) = s.getBytes("US-ASCII").map("%02x".format(_)).mkString
    val stss =
      if (withStss) "0000001c737473730000000000000003" + "00000001" + be32(k2) + be32(ns)
      else ""
    // without stss the stbl/minf/mdia/trak sizes shrink by 28
    val d = if (withStss) 0 else 28
    be32(272 - d) + "7472616b" +
      "0000005c746b6864000000000000000000000000" + be32(tid) + "00000000" +
      be32(dur) + "00000000000000000000000000000000" +
      "000100000000000000000000000000000001000000000000000000000000000040000000" +
      "0280000001e00000" +
      be32(172 - d) + "6d646961" +
      "000000206d646864000000000000000000000000" + be32(ts) + be32(dur) + "55c40000" +
      "0000002068646c720000000000000000" + cc(handler4cc) + "000000000000000000000000" +
      be32(100 - d) + "6d696e66" +
      be32(92 - d) + "7374626c" +
      "0000002073747364000000000000000100000010" + cc(codec4cc) + "0000000000000001" +
      "00000018737474730000000000000001" + be32(ns) + "00000200" +
      stss
  }

  private def file(traks: String*): Array[Byte] = {
    val moovPayload = // mvhd (constant) + traks
      "0000006c6d766864000000000000000000000000" +
        "000003e8" + "00002710" + "00010000" + "01000000" + "0000000000000000" +
        "000100000000000000000000000000000001000000000000000000000000000040000000" +
        "000000000000000000000000000000000000000000000000" + "00000002" +
        traks.mkString
    hx("000000106674797069736f6d00000000" +
      be32(8 + moovPayload.length / 2) + "6d6f6f76" + moovPayload +
      "00000010" + "6d646174") // declared-only mdat (8-byte payload)
  }

  test("two-track walk recovers every field") {
    val bytes = file(
      trak(1, "vide", "avc1", ts = 3000, dur = 6600, ns = 120, k2 = 7),
      trak(2, "soun", "mp4a", ts = 48000, dur = 7500, ns = 350, k2 = 12))
    val ts = Multimodal.parseMp4Tracks(bytes).get
    assert(ts.size == 2)
    val v = ts.head
    assert(v == Multimodal.Mp4Track(1, "vide", "avc1", 3000, 6600,
      6600L * 1000 / 3000, 120, 3, 1, 120))
    val a = ts(1)
    assert(a == Multimodal.Mp4Track(2, "soun", "mp4a", 48000, 7500,
      7500L * 1000 / 48000, 350, 3, 1, 350))
  }

  test("missing stss means every sample is a sync sample (14496-12 §8.6.2)") {
    val bytes = file(trak(1, "vide", "hev1", 1000, 2000, 60, 5, withStss = false))
    val ts = Multimodal.parseMp4Tracks(bytes).get
    assert(ts.size == 1)
    assert(ts.head.nKeyframes == 60 && ts.head.kfFirst == 1 && ts.head.kfLast == 60)
  }

  test("truncated second trak drops only that track") {
    val t1 = trak(1, "vide", "avc1", 3000, 6600, 120, 7)
    val t2 = trak(2, "soun", "mp4a", 48000, 7500, 350, 12)
    val whole = file(t1, t2)
    // cut mid-way through trak2's stbl: trak1 still parses, trak2 yields
    // no row (its stts/stss extents run past the cut)
    val cut = whole.take(whole.length - 60)
    val ts = Multimodal.parseMp4Tracks(cut).get
    assert(ts.size == 1 && ts.head.trackId == 1)
  }

  test("malformed size and foreign bytes refuse, not fabricate") {
    // no leading ftyp
    assert(Multimodal.parseMp4Tracks("0123456789abcdef0123".getBytes).isEmpty)
    // box size < 8 inside the walk
    val bad = hx("000000106674797069736f6d00000000" + "00000002" + "6d6f6f76")
    assert(Multimodal.parseMp4Tracks(bad).isEmpty)
    // well-formed walk but no moov → zero tracks, not None
    val noMoov = hx("000000106674797069736f6d00000000" + "000000106d646174" + "0011223344556677")
    assert(Multimodal.parseMp4Tracks(noMoov).contains(Seq.empty))
  }

  test("tkhd/mdhd version-1 layouts are skipped, never misread") {
    // flip the mdhd version byte to 1: the 64-bit layout is unmodeled, so
    // the trak must contribute no row rather than a garbage timescale
    val good = file(trak(1, "vide", "avc1", 3000, 6600, 120, 7))
    val mdhdVersionOff = 16 + 8 + 108 + 8 + 92 + 8 + 8 // ftyp+moovhdr+mvhd+trakhdr+tkhd+mdiahdr+mdhdhdr
    val bent = good.clone()
    bent(mdhdVersionOff) = 1
    assert(Multimodal.parseMp4Tracks(bent).get.isEmpty)
  }
}
