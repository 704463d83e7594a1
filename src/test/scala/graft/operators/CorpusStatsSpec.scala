package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Vocabulary coverage, shard mix entropy, duplication inflation. */
class CorpusStatsSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("corpus-stats-spec")
    .getOrCreate()

  test("vocab coverage: template source covers everything with few types") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val template = (1L to 50L).map(i => (i, "tmpl", "same words every time"))
    val diverse = (101L to 150L).map(i => (i, "div",
      s"uniq${i}a uniq${i}b uniq${i}c uniq${i}d"))
    val docs = (template ++ diverse).toDF("doc_id", "source", "text")
    val out = TextAnalysis.vocabCoverage(docs, "source", "text", Seq(3, 100))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // template: 4 types; top-3 covers 3/4 of mass, top-100 all of it
    assert(out("tmpl") == ((4L, 0.75, 1.0)))
    // diverse: 200 uniform types — top-3 covers 3/200, top-100 half
    assert(out("div") == ((200L, 0.015, 0.5)))
  }

  test("shard mix entropy: single-source shard scores 0, even 2-way mix ln 2") {
    import spark.implicits._
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("doc_id", "shard")
    val sources = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"), (6L, "b"))
      .toDF("doc_id", "source")
    val out = Sharding.shardMixEntropy(assign, sources, "doc_id", "source")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(0L) == ((1L, 2L, 0.0)))
    val ln2 = BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(out(1L)._1 == 2L && math.abs(out(1L)._3 - ln2.toDouble) < 2e-6)
  }

  test("dup inflation: hand-computed cluster keep-one arithmetic") {
    import spark.implicits._
    // cluster {1,2,3} labeled 1; docs 4,5 unclustered
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster_id")
    val toks = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 5L), (5L, 5L))
      .toDF("doc_id", "tok")
    val r = Audit.dupInflation(clusters, toks, "doc_id", "tok").head()
    // total 70; removable = (10+20+30) - 10 = 50; inflation = 70/20 = 3.5
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((70L, 50L, 3.5)))
  }

  test("contrastive triplets: negatives never collide with anchor/positive") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (50L, 60L)).toDF("id_a", "id_b")
    val out = Contrastive.triplets(pairs, docs, "doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.length == 3)
    out.foreach { case (a, p, n) =>
      assert(n != a && n != p && (1L to 100L).contains(n))
    }
    // determinism: identical invocation, identical triplets
    val again = Contrastive.triplets(pairs, docs, "doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.toSet == again.toSet)
  }

  test("jm logprob: hand-computed interpolation on a two-doc corpus") {
    import spark.implicits._
    // corpus bigrams: "a b" ×2 (doc1), "a c" ×1 (doc2) → c1(a)=3, T=3,
    // cdot2(b)=2, cdot2(c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.jmLogprob(docs, "doc_id", "text", lambda = 0.7)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    def nll(c12: Double, c1: Double, cdot2: Double, t: Double): Double =
      BigDecimal(-math.log(0.7 * c12 / c1 + (1 - 0.7) * cdot2 / t))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == nll(2, 3, 2, 3) && out(2L) == out(1L))
    assert(out(3L) == nll(1, 3, 1, 3))
  }

  test("ab conversion: hand-built arms, pooled z sign and magnitude") {
    import spark.implicits._
    // find user ids for each md5-arm, then plant conversions only in arm 0
    val armOf: Long => Int = u => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arm:$u".getBytes("UTF-8"))
      (md(0) & 0xff) % 2
    }
    val users = (1L to 40L)
    val ev = users.flatMap { u =>
      val conv = armOf(u) == 0 // arm 0 always converts, arm 1 never
      Seq((u, if (conv) "purchase" else "view"))
    }.toDF("user_id", "event_type")
    val r = EventSeq.abConversion(ev, "user_id", "event_type", "purchase").head()
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb == 40 && ca == na && cb == 0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 0.0)
    assert(r.getDouble(6) > 3.0, s"planted total separation should be significant, z=${r.getDouble(6)}")
  }

  test("dup inflation: no clusters means inflation exactly 1") {
    import spark.implicits._
    val clusters = Seq.empty[(Long, Long)].toDF("id", "cluster_id")
    val toks = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "tok")
    val r = Audit.dupInflation(clusters, toks, "doc_id", "tok").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((30L, 0L, 1.0)))
  }
}
