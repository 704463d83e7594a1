package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The auto-law PQ build ([[Similarity.pqCodebooksAuto]]) and its IVF-PQ
  * composition ([[Similarity.ivfPqTopKIndexed]]): the codebook-size law,
  * bit-equivalence of the unsampled auto build with the proven fixed
  * [[Similarity.pqCodebooks]], and the composed probe's contract — ADC
  * ranking restricted to exactly the probed cells' rows.
  */
class PqAutoSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("pq-auto-spec")
    .getOrCreate()

  private def emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("autoCodebookSize: 39-points-per-centroid law, power-of-two, byte cap, floor") {
    import Similarity.autoCodebookSize
    // the exact values the verify corpus and the bench corpus resolve to
    assert(autoCodebookSize(167) == 4)    // verify corpus sample (mod 3 of 500)
    assert(autoCodebookSize(500) == 8)    // unsampled verify corpus
    assert(autoCodebookSize(2000) == 32)  // bench corpus
    assert(autoCodebookSize(9984) == 256 && autoCodebookSize(1L << 40) == 256,
      "byte cap: a code must fit 8 bits")
    assert(autoCodebookSize(0) == 4 && autoCodebookSize(100) == 4, "floor")
    // power of two, monotone, and never below 39 points per centroid
    // above the floor
    val pts = Seq(0L, 155L, 156L, 311L, 312L, 1247L, 1248L, 9983L, 9984L, 1L << 30)
    pts.sliding(2).foreach { case Seq(a, b) =>
      assert(autoCodebookSize(a) <= autoCodebookSize(b), s"not monotone at $a")
    }
    pts.foreach { n =>
      val k = autoCodebookSize(n)
      assert((k & (k - 1)) == 0, s"k=$k not a power of two")
      assert(k == 4 || 39L * k <= n, s"k=$k starves training at n=$n")
    }
  }

  test("unsampled auto build is bit-identical to the fixed build at the law's k") {
    spark.sparkContext.setLogLevel("WARN")
    // sampleBudget >= n ⇒ mod 1 ⇒ train = corpus, seeds = first k ids
    // renumbered 0..k−1 — on the dense fixture ids that IS pqCodebooks'
    // seeding, so the only difference left is the code path
    val k = Similarity.autoCodebookSize(500)
    val auto = Similarity.pqCodebooksAuto(emb, "vec_id", "embedding",
      subDim = 8, sampleBudget = 1 << 16, iters = 1)
    val fixed = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      numSub = 8, k = k, iters = 1)
    assert(auto.length == fixed.length)
    auto.zip(fixed).zipWithIndex.foreach { case ((a, f), m) =>
      assert(a.length == k && a.map(_._1).sameElements(f.map(_._1)),
        s"subspace $m code ids drifted")
      a.zip(f).foreach { case ((cid, av), (_, fv)) =>
        assert(av == fv, s"subspace $m codeword $cid drifted")
      }
    }
  }

  test("sampled build: board-scale law values, deterministic") {
    val books = Similarity.pqCodebooksAuto(emb, "vec_id", "embedding",
      subDim = 8, sampleBudget = 200, iters = 1)
    assert(books.length == 8, "numSub = dim/subDim = 64/8")
    assert(books.forall(_.length == 4),
      "k = autoCodebookSize(167) = 4 at the verify sample")
    assert(books.forall(_.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L)),
      "codes renumbered dense 0..k−1")
    val again = Similarity.pqCodebooksAuto(emb, "vec_id", "embedding",
      subDim = 8, sampleBudget = 200, iters = 1)
    books.zip(again).foreach { case (a, b) =>
      a.zip(b).foreach { case ((ca, va), (cb, vb)) =>
        assert(ca == cb && va == vb, "build not bit-reproducible")
      }
    }
  }

  test("IVF-PQ probe: ADC ranking over exactly the probed cells' code rows") {
    import spark.implicits._
    val (cents, index) = Similarity.ivfTrainedAuto(emb, "vec_id", "embedding",
      kmeansIters = 1, sampleBudget = 200)
    val books = Similarity.pqCodebooksAuto(emb, "vec_id", "embedding",
      subDim = 8, sampleBudget = 200, iters = 1)
    val codes = Similarity.pqEncode(index, "vec_id", "embedding", books,
      carry = Seq("cluster"))
    val nProbe = Similarity.autoProbeCount(cents.length)
    val got = Similarity.ivfPqTopKIndexed(cents, books, codes, emb,
        "vec_id", "embedding", 0L, 10, nProbe)
      .as[(Long, Double)].collect().toSeq

    // reference: full-corpus ADC ranking (the proven pqTopKIndexed path)
    // restricted to the probe set computed by the pinned driver replica —
    // composition must change WHICH rows are scanned, never how they rank
    val qv = emb.where(col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].head()
    val probeSet = Similarity.nearestCentroidsDriver(cents, qv, nProbe).toSet
    val probedIds = index.where(col("cluster").isin(probeSet.toSeq: _*))
      .select("vec_id").as[Long].collect().toSet
    val fullAdc = Similarity.pqTopKIndexed(books,
        Similarity.pqEncode(emb, "vec_id", "embedding", books), emb,
        "vec_id", "embedding", 0L, k = 500)
      .as[(Long, Double)].collect().toSeq
    val expected = fullAdc.filter(r => probedIds.contains(r._1)).take(10)
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("exact rerank: the refine rung reorders the ADC pool by exact cosine, never leaves it") {
    import spark.implicits._
    val (cents, index) = Similarity.ivfTrainedAuto(emb, "vec_id", "embedding",
      kmeansIters = 1, sampleBudget = 200)
    val books = Similarity.pqCodebooksAuto(emb, "vec_id", "embedding",
      subDim = 8, sampleBudget = 200, iters = 1)
    val codes = Similarity.pqEncode(index, "vec_id", "embedding", books,
      carry = Seq("cluster"))
    val nProbe = Similarity.autoProbeCount(cents.length)
    val pool = Similarity.ivfPqTopKIndexed(cents, books, codes, emb,
        "vec_id", "embedding", 0L, 50, nProbe)
      .as[(Long, Double)].collect().map(_._1).toSet
    val got = Similarity.ivfPqTopKRerank(cents, books, codes, emb,
        "vec_id", "embedding", 0L, 10, nProbe, rerank = 50)
      .as[(Long, Double)].collect().toSeq
    assert(got.forall(r => pool.contains(r._1)),
      "rerank returned an id outside the ADC pool")
    // reference: exact cosine over exactly the pool ids, same tie-break
    val qv = emb.where(col("vec_id") === 0L).select("embedding")
    val expected = emb.where(col("vec_id").isin(pool.toSeq: _*))
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        qv.select(col("embedding").as("qv"))))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
      .as[(Long, Double)].collect().toSeq
    assert(got == expected, s"got=$got expected=$expected")
  }
}
