package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** LOF + DBSCAN semantics on hand-built angular geometries.
  *
  * The fixtures use 2-d vectors, so every sign-band beyond dim 2 evaluates
  * to 0 for every row (try_element_at past the end → null → otherwise 0) and
  * the LSH candidate graph is COMPLETE — the tests exercise exact LOF/DBSCAN
  * semantics, not candidate recall.
  */
class DensitySpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("density-spec")
    .getOrCreate()

  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("lofOutliers: an isolated vector scores above the tight cluster") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // four near-collinear vectors + one 60 degrees away
    val df = Seq(
      (0L, vec(0)), (1L, vec(3)), (2L, vec(6)), (3L, vec(9)),
      (9L, vec(60))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lofOutliers(df, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(0L, 1L, 2L, 3L, 9L)) // every id scored, ordered
    assert(out.forall(_._2 == 2L)) // complete graph: k neighbors realized
    val lofs = out.map(r => r._1 -> r._4).toMap
    val inlierMax = Seq(0L, 1L, 2L, 3L).map(lofs).max
    assert(lofs(9L) > 1.2, s"outlier lof ${lofs(9L)}")
    assert(lofs(9L) > inlierMax * 1.2,
      s"outlier ${lofs(9L)} should exceed inliers (max $inlierMax)")
    assert(Seq(0L, 1L, 2L, 3L).map(lofs).forall(l => l > 0.5 && l < 1.3))
  }

  test("dbscanClusters: chain geometry — core bridges two borders; far point is noise") {
    import spark.implicits._
    // 0 and 2 are each within eps of only 1 (25 deg steps; eps=0.1 ≈ 25.8 deg);
    // with minPts=3 only 1 is core, 0/2 attach as borders, 3 is unreachable
    val df = Seq(
      (0L, vec(0)), (1L, vec(25)), (2L, vec(50)), (3L, vec(130))
    ).toDF("vec_id", "embedding")
    val out = Similarity.dbscanClusters(df, "vec_id", "embedding",
        eps = 0.1, minPts = 3)
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(out == Seq(
      (0L, "border", Some(1L)),
      (1L, "core", Some(1L)),
      (2L, "border", Some(1L)),
      (3L, "noise", None)))
  }

  test("dbscanClusters: two separated pairs form two clusters; midpoint alone is noise") {
    import spark.implicits._
    val df = Seq(
      (0L, vec(0)), (1L, vec(10)),
      (2L, vec(90)), (3L, vec(100)),
      (7L, vec(45))
    ).toDF("vec_id", "embedding")
    val out = Similarity.dbscanClusters(df, "vec_id", "embedding",
        eps = 0.034, minPts = 2) // eps ≈ 1-cos(15°): pairs link, nothing else
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(out == Seq(
      (0L, "core", Some(0L)),
      (1L, "core", Some(0L)),
      (2L, "core", Some(2L)),
      (3L, "core", Some(2L)),
      (7L, "noise", None)))
  }

  /** The cohort-coverage diagnostic must separate the two regimes the
    * round-8 measurement exposed: on a corpus with REAL neighborhood
    * structure (planted clusters — the shape crawl/near-dup embeddings
    * have), the board's banding sees ≥90% of true neighborhoods; on
    * isotropic noise at a loose eps (where the only "neighbors" are the
    * random cosine tail), NO sublinear cohort can reach 0.9 — sign-LSH
    * coverage sits at its uniform closed form (~0.43 at 4 bands of 4) and
    * the diagnostic must say so rather than flatter the operators.
    */
  test("cohortCoverage: >=0.9 on planted clusters; exposes starvation on isotropic noise") {
    import spark.implicits._
    val dim = 64
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    // deterministic pseudo-noise: splitmix-ish per-coordinate hash
    def noise(seed: Long): Array[Double] = Array.tabulate(dim) { i =>
      val h = (seed + i) * 6364136223846793005L + 1442695040888963407L
      val m = (h ^ (h >>> 31)) * -7046029254386353131L
      ((m >>> 33).toDouble / (1L << 31).toDouble) - 0.5
    }
    // planted: 10 well-separated centers, 30 members each at ~10 degrees
    val planted = for {
      g <- 0 until 10; m <- 0 until 30
    } yield {
      val c = noise(g * 7919L + 1)
      val e = noise(g * 104729L + m * 31L + 7)
      (g * 30L + m, unit(c.zip(e).map { case (a, b) => a + 0.15 * b }))
    }
    val dfP = planted.toDF("vec_id", "embedding")
    val qP = (0 until 10).map(_ * 30L)
    val covP = Similarity.cohortCoverage(dfP, "vec_id", "embedding", qP,
        k = 5, eps = 0.3)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(covP("knn") >= 0.9, s"planted knn coverage ${covP("knn")}")
    assert(covP("eps") >= 0.9, s"planted eps coverage ${covP("eps")}")
    // isotropic: 1000 independent directions, eps in the random tail
    val iso = (0 until 1000).map(i => (i.toLong, unit(noise(i * 2654435761L + 13))))
    val dfI = iso.toDF("vec_id", "embedding")
    val qI = (0 until 20).map(i => (i * 97L) % 1000)
    val covI = Similarity.cohortCoverage(dfI, "vec_id", "embedding", qI,
        k = 5, eps = 0.68)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(covI("eps") < 0.8, s"isotropic eps coverage ${covI("eps")} — " +
      "should sit near the 0.43 uniform closed form, not look healthy")
  }
}
