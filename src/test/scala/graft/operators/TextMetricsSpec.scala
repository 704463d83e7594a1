package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextMetricsSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("text-metrics-spec")
    .getOrCreate()

  test("gopher rules: each rule trips independently; clean doc keeps") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Seq(
      // clean: 11 words incl. two stop words, mean len in range, no symbols
      (1L, "the quick brown fox jumps over a lazy sleeping dog tonight"),
      // too short
      (2L, "the tiny a doc"),
      // no stop words
      (3L, "quick brown foxes jump over lazy sleeping dogs tonight quietly swiftly"),
      // symbol-heavy
      (4L, "the %%% $$$ ### @@@ a %%% $$$ ### @@@ %%%")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select("doc_id", "keep", "r_wordcount", "r_stopwords", "r_symbols")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    assert(out(0) == ((1L, true, true, true, true)), s"clean doc: ${out(0)}")
    assert(!out(1)._3, s"short doc word-count rule: ${out(1)}")
    assert(!out(2)._4, s"stopless doc rule: ${out(2)}")
    assert(!out(3)._5, s"symbol doc rule: ${out(3)}")
    assert(out.drop(1).forall(!_._2), s"dirty docs must not keep: $out")
  }

  test("ngram diversity: all-repeat group near 0, all-unique group = 1") {
    import spark.implicits._
    val docs = Seq(
      ("rep", "a b c a b c a b c a b c"),  // 10 trigrams, 3 distinct
      ("uniq", "q w e r t y u i o p")      //  8 trigrams, all distinct
    ).toDF("source", "text")
    val out = TextAnalysis.ngramDiversity(docs, "source", "text", 3)
      .select("source", "total_ngrams", "distinct_ngrams", "diversity")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(("rep", 10L, 3L, 0.3), ("uniq", 8L, 8L, 1.0)), s"$out")
  }

  test("ngram novelty: first doc fully novel, verbatim repeat fully stale") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),          // trigrams {a b c, b c d} — all first here
      (2L, "a b c d"),          // same trigrams — novelty 0
      (3L, "a b c x y z")       // {a b c(seen), b c x, c x y, x y z} — 3/4
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3)
      .select("doc_id", "n_distinct", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0),
      (3L, 4L, 3L, 0.75)), s"$out")
  }

  test("tokenizer fertility: letter runs cost ceil(len/4) pieces per word") {
    import spark.implicits._
    // "internationalization" = 20 letters → 5 pieces for 1 word → fertility 5
    // "a b c d" → 4 words × 1 piece → fertility 1
    val docs = Seq(("hi", "internationalization"), ("lo", "a b c d"))
      .toDF("lang", "text")
    val out = TextAnalysis.tokenizerFertility(docs, "lang", "text")
      .select("lang", "n_words", "n_bpe", "fertility")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out == Seq(("hi", 1L, 5L, 5.0), ("lo", 4L, 4L, 1.0)), s"$out")
  }

  test("ppl buckets: quartiles partition docs, token mass conserved") {
    import spark.implicits._
    // 8 docs with distinct rarity profiles → 2 per quartile
    val vocabDocs = (1 to 8).map { i =>
      // doc i repeats common word 'x' (8-i) times and i distinct rare words
      val rare = (1 to i).map(j => s"rare_${i}_$j")
      (i.toLong, (Seq.fill(9 - i)("x") ++ rare).mkString(" "))
    }
    val docs = vocabDocs.toDF("doc_id", "text")
    val out = TextAnalysis.pplBuckets(docs, "doc_id", "text")
      .select("bucket", "n_docs", "n_tokens")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq("q1", "q2", "q3", "q4"), s"$out")
    assert(out.map(_._2).sum == 8L, s"docs conserved: $out")
    assert(out.map(_._3).sum == vocabDocs.map(_._2.split(" ").length.toLong).sum,
      s"token mass conserved: $out")
  }

  test("hard negatives: same-label refs excluded, ranked by cosine, anchors absent") {
    import spark.implicits._
    val rows = Seq(
      // anchor 0 with label 0, axis-aligned
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      // same-label near-identical ref: must be EXCLUDED
      (10L, Seq(0.99f, 0.1f, 0f, 0f), 0),
      // different-label close ref: the hardest negative
      (11L, Seq(0.9f, 0.3f, 0f, 0f), 1),
      // different-label orthogonal ref: ranked below
      (12L, Seq(0f, 1f, 0f, 0f), 1),
      // another anchor: never appears as a negative
      (1L, Seq(0f, 0f, 1f, 0f), 2))
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    val out = Similarity.hardNegatives(rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", isAnchor = col("vec_id") < 10, k = 2)
      .select("anchor_id", "rank", "neg_id", "neg_label")
      .as[(Long, Long, Long, Int)].collect().toSeq.sorted
    assert(!out.exists(r => labelOf(r._1) == r._4), s"same-label ref leaked: $out")
    assert(!out.exists(r => r._3 == 0L || r._3 == 1L), s"anchor as negative: $out")
    assert(out.contains((0L, 1L, 11L, 1)), s"hardest negative first: $out")
    assert(out.contains((0L, 2L, 12L, 1)), s"orthogonal second: $out")
  }

  test("yuleK: all-distinct tokens score 0, pure repetition scores high") {
    import spark.implicits._
    // rich: 100 distinct words once each → Σm²V = N → K = 0
    val rich = ("rich", (1 to 100).map(i => s"w$i").mkString(" "))
    // loop: one word 100 times → K = 1e4·(100² − 100)/100² = 9900
    val loop = ("loop", Seq.fill(100)("w").mkString(" "))
    val out = TextAnalysis.yuleK(Seq(rich, loop).toDF("source", "text"),
      "source", "text").collect().map(r => r.getString(0) -> r).toMap
    assert(out("rich").getAs[Double]("yule_k") == 0.0)
    assert(out("loop").getAs[Double]("yule_k") == 9900.0)
    assert(out("rich").getAs[Long]("v_types") == 100L)
  }

  test("logoddsKeyness: planted half-exclusive term tops; shared words don't") {
    import spark.implicits._
    def md5Half(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"half:$id".getBytes("UTF-8"))
      Integer.parseInt(f"${d(0)}%02x", 16) % 2
    }
    // every doc shares "common filler"; half-0 docs also say "alpha"
    // (many times), half-1 docs "beta"; one rare word appears ONCE in
    // half 0 — raw log-odds would rank it high, the prior shrinks it
    val docs = (1L to 200L).map { id =>
      val marker = if (md5Half(id) == 0) "alpha alpha alpha" else "beta beta beta"
      val rare = if (id == 2L) " rareword" else ""
      (id, s"common filler $marker$rare")
    }.toDF("doc_id", "text")
    val out = TextAnalysis.logoddsKeyness(docs, "doc_id", "text", topN = 5)
      .collect()
    val terms = out.map(_.getAs[String]("term")).toSeq
    assert(terms.take(2).toSet == Set("alpha", "beta"), s"top=$terms")
    val alpha = out.find(_.getAs[String]("term") == "alpha").get
    val beta = out.find(_.getAs[String]("term") == "beta").get
    assert(alpha.getAs[Double]("z") > 5 && beta.getAs[Double]("z") < -5)
    assert(alpha.getAs[Long]("y2") == 0L)
    // the singleton is half-exclusive too, but the prior shrinks its z
    // to noise level — raw log-odds would put it beside alpha/beta
    val rare = out.find(_.getAs[String]("term") == "rareword").get
    assert(math.abs(rare.getAs[Double]("z")) < 1.0,
      s"rare z=${rare.getAs[Double]("z")}")
  }

  test("termBurstiness: clumped term ranks burstier than scattered term") {
    import spark.implicits._
    // "clump" appears 40 times inside 2 docs; "spread" once in each of 40
    val docs = ((1 to 2).map(i =>
      (i.toLong, Seq.fill(20)("clump").mkString(" "))) ++
      (3 to 42).map(i => (i.toLong, "spread filler")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.termBurstiness(docs, "doc_id", "text",
      minCf = 20, topN = 5).collect()
    assert(out.head.getAs[String]("term") == "clump")
    val clump = out.head
    assert(clump.getAs[Long]("df") == 2L && clump.getAs[Long]("cf") == 40L)
    assert(clump.getAs[Double]("burstiness") < 0.1)
    val spread = out.find(_.getAs[String]("term") == "spread").get
    assert(spread.getAs[Double]("burstiness") > 0.9)
  }
}
