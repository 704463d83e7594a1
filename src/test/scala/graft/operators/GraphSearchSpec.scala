package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Triangle census + PRF expansion (round-5 session-4). */
class GraphSearchSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("graph-search-spec")
    .getOrCreate()

  test("triangles: K4 has 4 triangles, 3Δ/wedges matches by hand") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // K4 on {1,2,3,4}: C(4,3)=4 triangles; every deg=3 → wedges=4·C(3,2)=12;
    // clustering = 3·4/12 = 1.0
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
      .toDF("id_a", "id_b")
    val r = Graph.triangles(k4).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((4L, 12L, 1.0)))
  }

  test("triangles: path graph has zero triangles but open wedges") {
    import spark.implicits._
    // 1-2-3-4 path: 0 triangles, wedges = C(2,2)? degs = 1,2,2,1 → 1+1 = 2
    val path = Seq((1L,2L),(2L,3L),(3L,4L)).toDF("id_a", "id_b")
    val r = Graph.triangles(path).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((0L, 2L, 0.0)))
  }

  test("triangles: hub star + one closing edge counts exactly once") {
    import spark.implicits._
    // star 0-{1..20} plus edge (1,2): one triangle (0,1,2); the hub's
    // degree-20 fan must not blow the wedge join (degree ordering sends
    // every star edge leaf→hub, so the hub's out-degree is ~0)
    val star = (1L to 20L).map(i => (0L, i)) :+ ((1L, 2L))
    val r = Graph.triangles(star.toDF("id_a", "id_b")).head()
    assert(r.getLong(0) == 1L)
    // duplicate / reversed input edges collapse
    val dup = star ++ Seq((2L, 1L), (5L, 0L))
    assert(Graph.triangles(dup.toDF("id_a", "id_b")).head().getLong(0) == 1L)
  }

  test("prf expansion: surfaces feedback-set terms, excludes query terms") {
    import spark.implicits._
    val rel = (1L to 10L).map(i =>
      (i, s"spark window join catalyst$i tungsten shuffle expansion signal"))
    val noise = (11L to 60L).map(i =>
      (i, s"unrelated filler body$i padding$i text$i lorem ipsum"))
    val docs = (rel ++ noise).toDF("doc_id", "text")
    val out = Search.prfExpand(docs, "doc_id", "text",
        Seq("spark", "window", "join"), nDocs = 10, nTerms = 5)
      .as[(String, Double)].collect()
    val terms = out.map(_._1).toSet
    // feedback docs are exactly the 10 relevant ones; their repeated
    // non-query terms dominate (high ftf, low-ish df only in feedback)
    assert(terms.intersect(Set("tungsten", "shuffle", "expansion", "signal")).size >= 4,
      s"expected feedback terms, got ${terms.mkString(",")}")
    assert(terms.intersect(Set("spark", "window", "join")).isEmpty)
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.reverse.toSeq)
  }

  test("two-hop reach: path graph a-b-c-d counts neighbors-of-neighbors") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Graph.twoHopReach(pairs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_1hop"), r.getAs[Long]("n_2hop"))).toMap
    assert(out(1L) == (1L, 2L)) // b; b,c
    assert(out(2L) == (2L, 3L)) // a,c; a,c,d
    assert(out(3L) == (2L, 3L))
    assert(out(4L) == (1L, 2L))
  }

  test("assortativity: perfect star scores -1, regular triangle scores 0") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val rStar = Graph.assortativity(star).collect().head
    assert(rStar.getAs[Long]("n_edges") == 3L)
    assert(rStar.getAs[Double]("assortativity") == -1.0)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    assert(Graph.assortativity(tri).collect().head
      .getAs[Double]("assortativity") == 0.0)
  }
}
