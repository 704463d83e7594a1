package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-7 session-3 batch 2: BH-FDR drift battery, NB reliability/ECE,
  * difference-in-differences, format sniffing.
  */
class FdrReliabilitySpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("fdr-reliability-spec")
    .getOrCreate()
  private lazy val sf = "/root/testdata/sf0.001"

  /** The operators' salted-md5 parity, recomputed driver-side so tests can
    * PLANT effects per arm/half. */
  private def md5Parity(salt: String, id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$id".getBytes("UTF-8"))
    val hex = f"${d(0) & 0xff}%02x"
    Integer.parseInt(hex, 16) % 2
  }

  // ---------------------------------------------------------------- BH-FDR

  test("bh_fdr: planted shift rejected, null group retained, prefix property") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rows = (1L to 400L).map { i =>
      val h = md5Parity("ks", i)
      // group "shift": halves 100 apart (d = 1); group "null": CONSTANT
      // value — the two halves' ECDFs coincide exactly (d = 0, p = 1)
      val g = if (i <= 200) "shift" else "null"
      val v = if (g == "shift") (if (h == 0) (i % 7).toDouble else 100.0 + (i % 7))
              else 1.0
      (i, g, v)
    }
    val out = Drift.ksDriftFdr(rows.toDF("id", "g", "v"), "g", "id", "v")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("p_value"), r.getAs[Boolean]("rejected"))).toMap
    assert(out("shift")._1 < 0.001 && out("shift")._2, out.toString)
    assert(out("null")._1 > 0.5 && !out("null")._2, out.toString)
  }

  test("bh_fdr: rejections form a rank prefix and thresholds are monotone") {
    val out = Drift.ksDriftFdr(graft.Tables.events(spark, sf),
        "event_type", "event_id", "value")
      .orderBy("rank").collect()
    val ranks = out.map(_.getAs[Int]("rank")).toSeq
    assert(ranks == (1 to out.length))
    val th = out.map(_.getAs[Double]("bh_thresh")).toSeq
    assert(th.zip(th.tail).forall { case (a, b) => a <= b })
    val rejected = out.map(_.getAs[Boolean]("rejected")).toSeq
    // rejected must be a prefix: no true after the first false
    assert(!rejected.dropWhile(identity).contains(true))
  }

  // ------------------------------------------------------------------ ECE

  test("ece_reliability: bins partition the held-out split, conf in range") {
    val docs = graft.Tables.documents(spark, sf)
    val out = Classify.nbReliability(docs, "doc_id", "text", "source")
      .collect()
    assert(out.nonEmpty)
    val eces = out.map(_.getAs[Double]("ece")).toSet
    assert(eces.size == 1 && eces.head >= 0.0 && eces.head <= 1.0)
    out.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val conf = r.getAs[Double]("avg_conf")
      assert(conf >= bin / 10.0 - 1e-6 && conf <= (bin + 1) / 10.0 + 1e-6 ||
        bin == 9 && conf <= 1.0 + 1e-6, s"bin $bin conf $conf")
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
    }
    val heldOut = docs.where(col("doc_id") % 5 === 0).count()
    assert(out.map(_.getAs[Long]("n")).sum == heldOut,
      "bins must partition the held-out docs")
  }

  // ---------------------------------------------------------------- DiD

  test("diff_in_diff recovers a planted treatment-arm post-period lift") {
    import spark.implicits._
    def ts(d: Int) = new Timestamp(1705000000000L + d * 86400000L)
    val split = 1705363200000L
    val rows = (1L to 300L).flatMap { u =>
      val arm = md5Parity("arm", u)
      val base = (u % 5).toDouble
      // both arms share a pre->post common shock (+3); arm 1 adds +10
      Seq((u, ts(0), base + 1.0), (u, ts(2), base + 2.0),
        (u, ts(10), base + 4.0 + (if (arm == 1) 10.0 else 0.0)),
        (u, ts(12), base + 5.0 + (if (arm == 1) 10.0 else 0.0)))
    }
    val out = Cuped.diffInDiff(rows.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", splitMs = split).collect().head
    val did = out.getAs[Double]("did")
    assert(math.abs(did - 20.0) < 1e-6, s"did $did (two +10 post events)")
    assert(math.abs(out.getAs[Double]("t")) > 50.0,
      "noiseless planted effect must be overwhelmingly significant")
  }

  // --------------------------------------------------------------- sniff

  test("format sniff recovers every deterministic wrapper exactly") {
    val docs = graft.Tables.documents(spark, sf)
    val out = FormatSniff.sniff(
        FormatSniff.withWrapped(docs, "doc_id", "text", "lang", "n_chars"),
        "doc_id", "raw")
      .collect()
    val expect = Map(0 -> "json", 1 -> "xml", 2 -> "csv", 3 -> "markdown", 4 -> "plain")
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == expect((id % 5).toInt),
        s"doc $id sniffed ${r.getString(1)}")
    }
    assert(out.length == docs.count())
  }
}
