package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-7 batch: grid Kendall tau-b, Dunning bigram LLR,
  * Gumbel block maxima, local clustering coefficient.
  */
class GraphExtremesSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("graph-extremes-spec")
    .getOrCreate()

  test("kendallTauGrid: monotone hits +1, reversed -1, independence near 0") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val up = (1 to 10).map(i => (i * 100L, i * 20L)).toDF("x", "y")
    val r1 = Correlation.kendallTauGrid(up, col("x"), col("y"), 100L, 20L)
      .collect()(0)
    assert(r1.getAs[Double]("tau_b") == 1.0)
    assert(r1.getAs[Long]("concordant") == 45L && r1.getAs[Long]("discordant") == 0L)
    val down = (1 to 10).map(i => (i * 100L, (11 - i) * 20L)).toDF("x", "y")
    val r2 = Correlation.kendallTauGrid(down, col("x"), col("y"), 100L, 20L)
      .collect()(0)
    assert(r2.getAs[Double]("tau_b") == -1.0)
    // independent 2x2 checkerboard: equal concordant/discordant mass
    val flat = Seq((0L, 0L), (0L, 100L), (200L, 0L), (200L, 100L))
      .toDF("x", "y")
    val r3 = Correlation.kendallTauGrid(flat, col("x"), col("y"), 100L, 20L)
      .collect()(0)
    assert(r3.getAs[Double]("tau_b") == 0.0)
  }

  test("kendallTauGrid: hand-computed tie correction") {
    import spark.implicits._
    // grid cells: (0,0):2  (1,1):1 — n=3, C=2, D=0,
    // tie_x = 2·1 = 2 = tie_y; tau = 2·2/sqrt((6−2)(6−2)) = 1
    val df = Seq((0L, 0L), (0L, 0L), (100L, 20L)).toDF("x", "y")
    val r = Correlation.kendallTauGrid(df, col("x"), col("y"), 100L, 20L)
      .collect()(0)
    assert(r.getAs[Long]("concordant") == 2L)
    assert(r.getAs[Double]("tau_b") == 1.0)
  }

  test("collocationLlr: the planted rigid bigram tops the board") {
    import spark.implicits._
    // "strong pair" always adjacent; filler ROTATES so no filler bigram
    // is rigid (a fixed filler would be exactly as collocated)
    val docs = (1 to 30).map { i =>
      val base = Seq("a", "b", "c", "d")
      val filler = (base.drop(i % 4) ++ base.take(i % 4)).mkString(" ")
      (i.toLong, s"strong pair $filler strong pair $filler")
    }.toDF("doc_id", "text")
    val top = TextAnalysis.collocationLlr(docs, "doc_id", "text", topN = 5)
      .collect()
    assert(top.head.getString(0) == "strong" && top.head.getString(1) == "pair")
    assert(top.head.getAs[Double]("g2") > top.last.getAs[Double]("g2"))
  }

  test("extremeValue: constant series degenerates to its level") {
    import spark.implicits._
    val MsPerDay = 86400000L
    val rows = (0 until 28).flatMap { d =>
      (0 until 10).map(i => ("flat", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val r = Temporal.extremeValue(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()(0)
    assert(r.getAs[Long]("n_blocks") == 4L)
    assert(r.getAs[Double]("block_mean") == 10.0)
    assert(r.getAs[Double]("block_std") == 0.0)
    assert(r.getAs[Double]("gumbel_mu") == 10.0)
    assert(r.getAs[Double]("return_level_52") == 10.0)
  }

  test("extremeValue: return level sits above the block mean for spiky series") {
    import spark.implicits._
    val MsPerDay = 86400000L
    // weekly peak grows: week w peak day has 10+5w events, others 5
    val rows = (0 until 28).flatMap { d =>
      val n = if (d % 7 == 3) 10 + 5 * (d / 7) else 5
      (0 until n).map(i => ("spiky", new java.sql.Timestamp(d * MsPerDay + i)))
    }
    val r = Temporal.extremeValue(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()(0)
    assert(r.getAs[Double]("return_level_52") > r.getAs[Double]("block_mean"))
    assert(r.getAs[Double]("gumbel_beta") > 0.0)
  }

  test("localClustering: triangle 1.0, path 0, pendant dilutes its hub") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    val rt = Graph.localClustering(tri).as[(Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    (1L to 3L).foreach { n =>
      assert(rt(n) == ((n, 2L, 1L, 1.0)), rt(n)) }
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val rp = Graph.localClustering(path).as[(Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(rp(2L) == ((2L, 2L, 0L, 0.0)))
    assert(rp(1L)._4 == 0.0 && rp(1L)._2 == 1L)
    // K3 + pendant on node 1: deg(1)=3, tri(1)=1 → 2/(3·2)
    val k3p = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("id_a", "id_b")
    val rk = Graph.localClustering(k3p).as[(Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(rk(1L)._2 == 3L && rk(1L)._3 == 1L)
    assert(math.abs(rk(1L)._4 - 1.0 / 3.0) < 1e-6)
    assert(rk(2L)._4 == 1.0 && rk(4L)._4 == 0.0)
  }

  test("kcore: pendant chain peels off K4, cycle survives 2 dies at 3") {
    import spark.implicits._
    // K4 on 1-4 with a pendant chain 4-5-6: the chain must peel in TWO
    // rounds (6 first, then 5), leaving K4 as both the 2- and 3-core
    val k4chain = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val rc = Graph.kcore(k4chain).as[(Int, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(rc(2) == ((2, 4L, 6L)), rc(2))
    assert(rc(3) == ((3, 4L, 6L)), rc(3))
    // a 5-cycle: entirely its own 2-core, empty 3-core
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
      .toDF("id_a", "id_b")
    val ry = Graph.kcore(cyc).as[(Int, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(ry(2) == ((2, 5L, 5L)) && ry(3) == ((3, 0L, 0L)))
    // fixed-round peel has CONVERGED on the fixture family: one more
    // round changes nothing (the oracle's bit-identity precondition)
    val r9 = Graph.kcore(k4chain, rounds = 9).as[(Int, Long, Long)]
      .collect().toSet
    assert(r9 == rc.values.toSet)
  }

  test("kcore: duplicate ks replicate rows without corrupting degree counts") {
    import spark.implicits._
    // the fused tagged relation must dedupe tags before peeling (a
    // duplicated tag would DOUBLE its group's degree counts and let nodes
    // survive peels they shouldn't); the literal spine still emits the
    // sequential form's duplicate output rows for duplicate input ks
    val k4chain = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val dup = Graph.kcore(k4chain, ks = Seq(2, 2, 3)).as[(Int, Long, Long)]
      .collect().toSeq.sorted
    assert(dup == Seq((2, 4L, 6L), (2, 4L, 6L), (3, 4L, 6L)), dup)
  }
}
