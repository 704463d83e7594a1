package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AhoCorasickExpr

class DictTagSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("dict-tag-spec")
    .getOrCreate()

  /** naive per-position probe — the oracle's form, used as ground truth */
  private def naive(text: String, term: String): Long =
    (0 to text.length - term.length).count(i => text.startsWith(term, i)).toLong

  private def acCounts(text: String, terms: Seq[String]): Seq[Long] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(text).toDF("t")
      .select(AhoCorasickExpr.counts(col("t"), terms).as("c"))
      .as[Seq[Long]].head()
  }

  test("overlapping self-matches are counted ('aa' in 'aaaa' is 3)") {
    spark.sparkContext.setLogLevel("WARN")
    assert(acCounts("aaaa", Seq("aa", "aaa")) == Seq(3L, 2L))
  }

  test("nested and suffix terms fire independently (classic he/she/his/hers)") {
    val terms = Seq("he", "she", "his", "hers")
    val text = "ushers say she held his hershey"
    assert(acCounts(text, terms) == terms.map(naive(text, _)))
    // 'ushers' contains she+he+hers; 'hershey' contains he+hers+she? no —
    // spot-check one value by hand: "he" at ushers(2), she(5), held(?) no —
    // held starts 'he'; his no; hershey 'he'. naive() is the arbiter above,
    // this pin just guards the harness itself
    assert(acCounts(text, Seq("he")).head == naive(text, "he"))
  }

  test("matches crossing fail transitions are found (abab over ab/bab)") {
    val text = "ababab"
    assert(acCounts(text, Seq("ab", "bab", "abab")) ==
      Seq(naive(text, "ab"), naive(text, "bab"), naive(text, "abab")))
  }

  test("AC equals naive counting on pseudo-random texts and dictionaries") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    (0 until 25).foreach { _ =>
      val text = Seq.fill(200)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val terms = Seq.fill(8)(
        Seq.fill(1 + rnd.nextInt(4))(alphabet(rnd.nextInt(alphabet.length))).mkString
      ).distinct
      assert(acCounts(text, terms) == terms.map(naive(text, _)),
        s"mismatch for terms=$terms")
    }
  }

  test("tagCounts emits only positive counts with term strings attached") {
    import org.apache.spark.sql.functions._
    val df = spark.createDataFrame(Seq(
      (1L, "the table scan beats the index scan"),
      (2L, "no keywords here"))).toDF("doc_id", "text")
    val out = DictTag.tagCounts(df, "doc_id", "text", Seq("scan", "table scan", "INDEX"))
      .orderBy("doc_id", "term").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "index", 1L), (1L, "scan", 2L), (1L, "table scan", 1L)))
  }
}
