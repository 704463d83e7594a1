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

  test("autoBandWidth: the log2(n) law, floors, and cap") {
    import Similarity.autoBandWidth
    // nBands·n/2^r ≤ budget ⇒ r = ceil(log2(nBands·n/budget))
    assert(autoBandWidth(1000L, 4, 64) == 6)      // 4000/64 = 62.5 → 6
    assert(autoBandWidth(1000000L, 4, 64) == 16)  // 62500 → 16
    assert(autoBandWidth(1000000000000L, 4, 64) == 36)
    assert(autoBandWidth(0L) == 4 && autoBandWidth(10L) == 4) // floor
    assert(autoBandWidth(Long.MaxValue, 64, 1) == 62)         // cap
    val widths = Seq(1L, 1000L, 100000L, 10000000L).map(autoBandWidth(_))
    assert(widths == widths.sorted, "width must be monotone in n")
  }

  /** Shared fixtures for the auto-width tests: deterministic isotropic
    * noise and planted clusters at 64-d (same construction as the
    * coverage test above). */
  private val autoDim = 64
  private def unitV(v: Array[Double]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }
  private def noiseV(seed: Long): Array[Double] = Array.tabulate(autoDim) { i =>
    val h = (seed + i) * 6364136223846793005L + 1442695040888963407L
    val m = (h ^ (h >>> 31)) * -7046029254386353131L
    ((m >>> 33).toDouble / (1L << 31).toDouble) - 0.5
  }

  test("planeBands + autoBandWidth: candidate volume per row stays bounded as n grows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // isotropic corpora at 500 and 2000 rows: fixed-width banding would
    // grow candidates/row 4x; auto width (5 bits -> 7 bits) holds it flat
    def candidatesPerRow(n: Int): Double = {
      val df = (0 until n).map(i => (i.toLong, unitV(noiseV(i * 2654435761L + 13))))
        .toDF("vec_id", "embedding")
      val r = Similarity.autoBandWidth(n.toLong, 4, 64)
      val bands = Similarity.planeBands(df, "vec_id", "embedding", 4, r, autoDim)
      val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") =!= col("b.vec_id")).count()
      cand.toDouble / n
    }
    val c500 = candidatesPerRow(500)
    val c2000 = candidatesPerRow(2000)
    assert(c500 <= 3 * 64, s"candidates/row at 500 = $c500")
    assert(c2000 <= 3 * 64, s"candidates/row at 2000 = $c2000")
    assert(c2000 <= 2.0 * c500 + 8,
      s"4x rows must NOT ~4x the per-row volume: $c500 -> $c2000")
  }

  test("scale gate: candidates/row bounded at 50k vectors (100x the verify corpus), width from the law") {
    import org.apache.spark.sql.functions._
    // the CI-run anchor behind the board swap (round-9 verdict item): at
    // 100x the verify corpus the served banding must stay budget-bounded.
    // Spark-side deterministic vectors (xxhash64-derived), dim 64 like the
    // fixture corpus (at dim 16 the 12 hyperplanes are correlated enough to
    // run ~4x the uniform collision rate — the law's budget is calibrated
    // for the high-dim regime density work actually runs in).
    val n = 50000L
    val dim = 64
    val spark2 = spark
    val emb = spark2.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(concat_ws(":", col("id"), i)), lit(1000L))
          .cast("float") / 1000.0f - 0.5f)).as("embedding"))
      .localCheckpoint()
    val r = Similarity.autoBandWidth(n, 4, 64)
    assert(r == 12, s"law drifted: autoBandWidth(50000) = $r")
    val bands = Similarity.planeBands(emb, "vec_id", "embedding", 4, r, dim)
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.vec_id") =!= col("b.vec_id")).count()
    val perRow = cand.toDouble / n
    // uniform expectation 4n/2^12 ~= 49; allow structure/quantization slack.
    // the FIXED 16-bit/4-per-band width at this n would sit at 4n/16 =
    // 12,500 candidates/row — the 0.25*n^2 wall the board swap retired.
    assert(perRow <= 2.5 * 64, s"candidates/row at 50k = $perRow")
  }

  test("auto density operators: planted clusters — coverage >=0.9, LOF flags the stray, DBSCAN finds the 10 groups") {
    import spark.implicits._
    // 10 centers x 30 members (same geometry the fixed-width coverage test
    // uses) plus one isolated stray
    val planted = (for { g <- 0 until 10; m <- 0 until 30 } yield {
      val c = noiseV(g * 7919L + 1)
      val e = noiseV(g * 104729L + m * 31L + 7)
      (g * 30L + m, unitV(c.zip(e).map { case (a, b) => a + 0.15 * b }))
    }) :+ (999L, unitV(noiseV(31337L)))
    val df = planted.toDF("vec_id", "embedding")
    val qs = (0 until 10).map(_ * 30L)
    val cov = Similarity.cohortCoverageAuto(df, "vec_id", "embedding", qs,
        k = 5, eps = 0.3)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(cov("knn") >= 0.9, s"auto knn coverage ${cov("knn")}")
    assert(cov("eps") >= 0.9, s"auto eps coverage ${cov("eps")}")
    val lof = Similarity.lofOutliersAuto(df, "vec_id", "embedding", k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the stray may drop out entirely (empty cohort) or score high; a
    // cluster member must not look like an outlier
    val memberMax = (0 until 300).flatMap(i => lof.get(i.toLong)).max
    assert(lof.get(999L).forall(_ > memberMax),
      s"stray ${lof.get(999L)} vs member max $memberMax")
    val db = Similarity.dbscanClustersAuto(df, "vec_id", "embedding",
        eps = 0.3, minPts = 5)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val clusters = db.filter(_._2 != "noise").flatMap(_._3).distinct
    assert(clusters.length == 10, s"expected 10 clusters, got ${clusters.length}")
    val strayRow = db.find(_._1 == 999L).get
    assert(strayRow._2 == "noise", s"stray must be noise: $strayRow")
    // every member of group 0 lands in one cluster
    val g0 = db.filter(r => r._1 < 30L).flatMap(_._3).distinct
    assert(g0.length == 1, s"group 0 split across clusters: $g0")
  }

  test("cosineNearDupPairsAuto: recovers exactly the brute-force pairs on a near-dup corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 40 base directions, each with one near-identical twin (0.02 noise:
    // cos ≈ 0.999) plus 120 unrelated directions — true pairs = the twins
    val twins = (0 until 40).flatMap { g =>
      val base = noiseV(g * 7919L + 3)
      val e = noiseV(g * 104729L + 11)
      Seq((g * 2L, unitV(base)),
        (g * 2L + 1, unitV(base.zip(e).map { case (a, b) => a + 0.02 * b })))
    }
    val loners = (0 until 120).map(i => (1000L + i, unitV(noiseV(i * 2654435761L + 99))))
    val df = (twins ++ loners).toDF("vec_id", "embedding")
    val auto = Similarity.cosineNearDupPairsAuto(df, "vec_id", "embedding",
        threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute truth: exact cosine over all pairs (test-only n² is fine at 200)
    val brute = df.as("x").join(df.as("y"),
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id"), col("y.vec_id"),
        Similarity.cosine(col("x.embedding"), col("y.embedding")).as("c"))
      .where(col("c") >= 0.9)
      .select("x.vec_id", "y.vec_id").as[(Long, Long)].collect().toSet
    assert(brute == (0 until 40).map(g => (g * 2L, g * 2L + 1)).toSet,
      s"fixture must plant exactly the twins: $brute")
    assert(auto == brute, s"auto pairs ${auto.size} vs brute ${brute.size}")
  }

  test("auto density operators are partitioning-invariant (1 vs 16 input partitions)") {
    import spark.implicits._
    val planted = (for { g <- 0 until 6; m <- 0 until 20 } yield {
      val c = noiseV(g * 7919L + 1)
      val e = noiseV(g * 104729L + m * 31L + 7)
      (g * 20L + m, unitV(c.zip(e).map { case (a, b) => a + 0.15 * b }))
    }).toDF("vec_id", "embedding")
    def run(parts: Int) =
      Similarity.lofOutliersAuto(planted.repartition(parts),
        "vec_id", "embedding", k = 5).collect().toSeq
    assert(run(1) == run(16),
      "LOF-auto output must not depend on the input partitioning")
  }
}
