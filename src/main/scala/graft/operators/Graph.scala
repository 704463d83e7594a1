package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over a pair list — content-centrality for a dedup/curation
  * pipeline: run over the near-dup candidate graph, a document's rank
  * measures how central it is to a mass of copied content (the signal
  * web-scale corpora use to pick canonical representatives and to spot
  * template farms; CommonCrawl publishes exactly this kind of host-graph
  * centrality for curation).
  *
  * Power iteration as repeated relational algebra — Pregel without Pregel
  * (the [[Dedup.nearDupClusters]] pattern): each round is one join of the
  * edge list with the current rank vector, one round(·/deg·d) projection,
  * and one dst-keyed aggregation; the rank vector is localCheckpoint'ed
  * per round (superseded checkpoint blocks eagerly released) so the plan
  * stays linear in iterations. At 100 TB the edge list is hash-partitioned
  * on src and the rank vector co-partitions with it — each iteration is
  * ONE shuffle of the (much smaller) rank vector, never of the edges.
  *
  * Cross-engine exactness: per-edge contributions are computed in double
  * from identical operands, rounded to 12 decimals, and accumulated as
  * DECIMAL — order-independent sums, bit-equal ranks in any engine (the
  * [[Dsir]] round-then-DECIMAL convention). Nodes are the pair endpoints
  * (every node has degree >= 1, so no dangling-mass term); rank mass is
  * normalized over the graph's own node count.
  */
object Graph {

  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1,
      s"pageRank: need iters >= 1 and 0 < damping < 1, got $iters/$damping")
    val base = 1.0 - damping
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nStat = deg.agg(count(lit(1)).as("_pr_n"))
    var pr = deg
      .crossJoin(broadcast(nStat))
      .select(col("src").as("id"), col("deg"), col("_pr_n"),
        round(lit(1.0) / col("_pr_n"), 12).cast("decimal(28,12)").as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.select(col("id").as("src"), col("deg").as("_pr_d"), col("pr")), "src")
        .select(col("dst"),
          round(col("pr").cast("double") / col("_pr_d") * damping, 12)
            .cast("decimal(28,12)").as("_pr_c"))
        .groupBy("dst").agg(sum(col("_pr_c")).as("_pr_in"))
      val next = pr
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), col("deg"), col("_pr_n"),
          (round(lit(base) / col("_pr_n"), 12).cast("decimal(28,12)") +
            coalesce(col("_pr_in"), lit(0).cast("decimal(38,12)"))).as("pr"))
        .localCheckpoint()
      Dedup.releaseCheckpoint(pr)
      pr = next
    }
    pr.select(col("id"), col("deg"), col("pr").cast("double").as("pagerank"))
  }

  /** Unrolled-iteration DuckDB mirror: `edgePairsCtes` must be a CTE chain
    * whose FINAL relation is `ep(id_a, id_b)`. Every pr_i is doubly
    * referenced, so each step is `AS MATERIALIZED` (DuckDB's default
    * inlining re-evaluates a doubly-referenced chain exponentially — the
    * BPE lesson).
    */
  def pageRankSql(edgePairsCtes: String, idOut: String,
      iters: Int = 5, damping: Double = 0.85): String = {
    val base = 1.0 - damping
    val steps = (1 to iters).map { i =>
      s"""pr$i AS MATERIALIZED (
           SELECT d.id, d.deg, d.n,
             CAST(round($base / d.n, 12) AS DECIMAL(28,12))
               + COALESCE(s.c, CAST(0 AS DECIMAL(38,12))) AS pr
           FROM pr${i - 1} d LEFT JOIN (
             SELECT e.dst AS id,
               SUM(CAST(round(CAST(p.pr AS DOUBLE) / p.deg * $damping, 12)
                 AS DECIMAL(28,12))) AS c
             FROM e JOIN pr${i - 1} p ON e.src = p.id GROUP BY e.dst) s
           ON s.id = d.id)"""
    }.mkString(",\n         ")
    s"""WITH $edgePairsCtes,
         e AS (SELECT id_a AS src, id_b AS dst FROM ep
               UNION SELECT id_b, id_a FROM ep),
         dg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
         nn AS (SELECT COUNT(*) AS n FROM dg),
         pr0 AS MATERIALIZED (SELECT src AS id, deg, n,
             CAST(round(1.0 / n, 12) AS DECIMAL(28,12)) AS pr
           FROM dg CROSS JOIN nn),
         $steps
       SELECT id AS $idOut, deg, CAST(pr AS DOUBLE) AS pagerank
       FROM pr$iters ORDER BY id"""
  }

  /** Triangle count + global clustering coefficient over a pair list —
    * the cluster-density readout of a near-dup graph: a high triangle
    * count relative to wedges means duplicates form tight cliques (true
    * copy clusters); low means chains/stars (transitive false positives a
    * Jaccard threshold lets through). Schank–Wagner node-iterator with
    * DEGREE ORDERING, relationally:
    *
    *   1. orient every undirected edge from its lower-(deg, id) endpoint
    *      to the higher — out-degree is then bounded by O(√E) regardless
    *      of hubs (a hot node's unbounded degree becomes IN-degree, which
    *      no join fans out on);
    *   2. wedges = oriented ⋈ oriented on src, (deg, id)-ordering the two
    *      tips so each triangle forms exactly ONE wedge at its minimum
    *      vertex;
    *   3. close each wedge against the canonical (a<b) edge set — a
    *      semi-join; every triangle is counted exactly once.
    *
    * Open-wedge total Σ C(deg,2) folds from the degree relation. Output is
    * ONE row: (n_triangles, n_wedges, clustering = 3Δ / wedges, round(6)).
    * All counts integer-exact; the single division is one IEEE op.
    */
  def triangles(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    // canonicalize to a<b BEFORE distinct so reversed duplicates collapse
    val e = pairs.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddst"))
    val w1 = o.select(col("src"), col("dst").as("y"), col("ddst").as("dy"))
    val w2 = o.select(col("src"), col("dst").as("z"), col("ddst").as("dz"))
    val wedges = w1.join(w2, "src")
      .where(col("dy") < col("dz") || (col("dy") === col("dz") && col("y") < col("z")))
      .select(least(col("y"), col("z")).as("a"), greatest(col("y"), col("z")).as("b"))
    val tri = wedges.join(e, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val wtot = deg.agg((sum(col("deg") * (col("deg") - 1)) / 2).cast("long").as("n_wedges"))
    tri.crossJoin(wtot).select(
      col("n_triangles"), col("n_wedges"),
      when(col("n_wedges") > 0,
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
        .otherwise(lit(0.0)).as("clustering"))
  }

  /** Per-node 1-hop and ≤2-hop reach over the undirected pair graph — the
    * "blast radius" of a near-dup family: how many documents are one
    * rewrite away vs two. Ranks hub documents whose removal most shrinks
    * transitive duplication, which cluster size alone (a symmetric count
    * for every member) cannot.
    *
    * Shape: edges canonicalize + distinct once; the 2-hop relation is ONE
    * self-join through the shared midpoint (fan-out Σ deg² — bounded on
    * candidate-bounded dup graphs, and the [[Skew]] salting applies to the
    * mid key if a hub ever dominates), then distinct + count per node.
    */
  def twoHopReach(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val e = pairs.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    val nb = e.select(col("a").as("x"), col("b").as("y"))
      .unionByName(e.select(col("b").as("x"), col("a").as("y")))
    val oneHop = nb.groupBy("x").agg(count(lit(1)).as("n_1hop"))
    val two = nb.select(col("x"), col("y").as("m"))
      .join(nb.select(col("x").as("m"), col("y")), "m")
      .where(col("x") =!= col("y"))
      .select("x", "y")
      .unionByName(nb)
      .distinct()
      .groupBy("x").agg(count(lit(1)).as("n_2hop"))
    oneHop.join(two, "x")
      .select(col("x").as("id"), col("n_1hop"), col("n_2hop"))
  }

  /** DuckDB mirror of [[twoHopReach]]. */
  def twoHopReachSql(edgePairsCtes: String): String =
    s"""WITH $edgePairsCtes,
         ed AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
                FROM ep WHERE id_a <> id_b),
         nb AS (SELECT a AS x, b AS y FROM ed UNION ALL SELECT b, a FROM ed),
         h1 AS (SELECT x, COUNT(*) AS n_1hop FROM nb GROUP BY x),
         h2 AS (SELECT x, COUNT(*) AS n_2hop FROM (
             SELECT DISTINCT x, y FROM (
               SELECT n1.x, n2.y FROM nb n1 JOIN nb n2 ON n1.y = n2.x
               WHERE n1.x <> n2.y
               UNION ALL SELECT x, y FROM nb)) GROUP BY x)
       SELECT h1.x AS id, n_1hop, n_2hop
       FROM h1 JOIN h2 ON h1.x = h2.x"""

  /** k-core summary of the near-dup graph (Seidman 1983): repeatedly
    * peel nodes of degree < k; what survives is the maximal subgraph of
    * minimum degree k — the dense template families that near-dup PAIR
    * counts understate (a hub with 50 leaves has 50 pairs but an empty
    * 2-core; a 10-clique has 45 pairs and IS its 2-core). The 2-/3-core
    * sizes say how much of the dup mass is clique-like boilerplate versus
    * star-shaped single-source fan-out — the former dedups to one doc per
    * family, the latter wants the hub cut.
    *
    * Peeling runs a FIXED `rounds` iterations in both engines (the
    * fixpoint is order-independent, and a fixed unroll keeps the oracle
    * bit-identical even if a pathological graph hasn't converged; the
    * spec pins convergence at `rounds` on the fixture family). Each round
    * is a degree agg + two semi-joins over the surviving edge relation —
    * cluster-bounded, lineage cut per round.
    */
  def kcore(pairs: DataFrame, ks: Seq[Int] = Seq(2, 3),
      rounds: Int = 8): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "kcore: bad k list")
    val spark = pairs.sparkSession
    val e0 = pairs.select(
        least(col("id_a").cast("long"), col("id_b").cast("long")).as("a"),
        greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    // the per-k peels are independent — FUSE them: one (k, edge)-tagged
    // relation runs every k's round in the SAME degree agg + semi-join job
    // (the tag keys the groups, each tag tests its own threshold), so a
    // |ks|-core summary costs `rounds` checkpointed jobs, not |ks|·rounds.
    // Per-tag groups are disjoint, so every k's fold sees exactly the rows
    // the sequential peel fed it — results are bit-identical. Tags must be
    // DISTINCT (a duplicate k would double its tag group's degree counts);
    // a duplicated input k still gets its duplicate output row via the
    // literal spine join below, matching the sequential form.
    var e = e0
      .select(explode(typedlit(ks.distinct)).as("kk"), col("a"), col("b"))
      .localCheckpoint()
    // early exit on fixpoint: peeling only ever REMOVES rows, so an
    // unchanged tagged-edge count means the relation is unchanged and
    // every remaining round is the identity — the result is bit-equal to
    // the fixed unroll (the oracle keeps the fixed spelling; the count is
    // one cheap job over the just-checkpointed blocks, the rounds it
    // skips are a degree agg + two semi-joins each)
    var remaining = e.count()
    var converged = false
    var r = 0
    while (r < rounds && !converged) {
      val deg = e.select(col("kk"), col("a").as("n"))
        .unionByName(e.select(col("kk"), col("b").as("n")))
        .groupBy("kk", "n").agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= col("kk")).select("kk", "n")
      val next = e
        .join(keep.select(col("kk"), col("n").as("a")), Seq("kk", "a"), "left_semi")
        .join(keep.select(col("kk"), col("n").as("b")), Seq("kk", "b"), "left_semi")
        .select("kk", "a", "b").localCheckpoint()
      Dedup.releaseCheckpoint(e)
      e = next
      val c = e.count()
      converged = c == remaining
      remaining = c
      r += 1
    }
    val nodes = e.select(col("kk"), col("a").as("n"))
      .unionByName(e.select(col("kk"), col("b").as("n"))).distinct()
      .groupBy("kk").agg(count(lit(1)).as("n_core"))
    val edges = e.groupBy("kk").agg(count(lit(1)).as("n_edges"))
    // literal k spine: a k whose core emptied must still emit its 0-row
    // (grouped aggs drop empty groups; the sequential form's global aggs
    // always emitted one row per k)
    import spark.implicits._
    ks.toDF("kk")
      .join(nodes, Seq("kk"), "left")
      .join(edges, Seq("kk"), "left")
      .select(col("kk").as("k"),
        coalesce(col("n_core"), lit(0L)).as("n_core"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"))
      .orderBy("k")
  }

  /** DuckDB mirror of [[kcore]] — the peel unrolled as a CTE chain per k
    * (same fixed round count as the Spark side). Every round's CTEs are
    * MATERIALIZED: each references its predecessor three times, so the
    * default inlining would re-expand the upstream near-dup pipeline
    * 3^rounds times (observed as a file-handle explosion at rounds=8).
    */
  def kcoreSql(edgePairsCtes: String, ks: Seq[Int] = Seq(2, 3),
      rounds: Int = 8): String = {
    val chains = ks.map { k =>
      val steps = (1 to rounds).map { r =>
        val prev = if (r == 1) "e0" else s"e_k${k}_r${r - 1}"
        s"""d_k${k}_r$r AS MATERIALIZED (SELECT n, COUNT(*) AS deg FROM (
             SELECT a AS n FROM $prev UNION ALL SELECT b FROM $prev)
           GROUP BY n),
         e_k${k}_r$r AS MATERIALIZED (SELECT a, b FROM $prev
           WHERE a IN (SELECT n FROM d_k${k}_r$r WHERE deg >= $k)
             AND b IN (SELECT n FROM d_k${k}_r$r WHERE deg >= $k))"""
      }.mkString(",\n         ")
      steps
    }.mkString(",\n         ")
    val finals = ks.map { k =>
      val last = s"e_k${k}_r$rounds"
      s"""SELECT $k AS k,
           (SELECT COUNT(*) FROM (SELECT a AS n FROM $last
              UNION SELECT b FROM $last)) AS n_core,
           (SELECT COUNT(*) FROM $last) AS n_edges"""
    }.mkString(" UNION ALL ")
    s"""WITH $edgePairsCtes,
       e0 AS MATERIALIZED (SELECT DISTINCT least(id_a, id_b) AS a,
              greatest(id_a, id_b) AS b
              FROM ep WHERE id_a <> id_b),
       $chains
       SELECT k, CAST(n_core AS BIGINT) AS n_core,
         CAST(n_edges AS BIGINT) AS n_edges
       FROM ($finals) ORDER BY k"""
  }

  /** Degree assortativity (Newman, PRL 2002): Pearson correlation of
    * endpoint degrees over both orientations of every edge. Positive =
    * hubs link hubs (one giant tangle of templates), negative = hubs link
    * leaves (star-shaped boilerplate families) — the two regimes want
    * different dedup strategies (cut the hub vs keep one leaf).
    *
    * Integer degree sums (BIGINT, exact) → one fixed double shape; with
    * both orientations the marginals coincide, so
    * r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²). Variance floor 1e-12 for
    * regular graphs (every degree equal ⇒ r undefined ⇒ 0).
    */
  def assortativity(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val e = pairs.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val or2 = e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(col("da").as("x"), col("db").as("y"))
    val both = or2.unionByName(or2.select(col("y").as("x"), col("x").as("y")))
    val s = both.agg(count(lit(1)).as("m"),
      sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    def d(c: Column) = c.cast("double")
    s.select((col("m") / 2).cast("long").as("n_edges"),
      round((d(col("m")) * d(col("sxy")) - d(col("sx")) * d(col("sx"))) /
        greatest(d(col("m")) * d(col("sxx")) - d(col("sx")) * d(col("sx")),
          lit(1e-12)), 6).as("assortativity"))
  }

  /** DuckDB mirror of [[assortativity]]. */
  def assortativitySql(edgePairsCtes: String): String =
    s"""WITH $edgePairsCtes,
         ed AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
                FROM ep WHERE id_a <> id_b),
         dg AS (SELECT n, COUNT(*) AS deg FROM (
                 SELECT a AS n FROM ed UNION ALL SELECT b FROM ed) GROUP BY n),
         o2 AS (SELECT da.deg AS x, db.deg AS y FROM ed
                JOIN dg da ON da.n = ed.a JOIN dg db ON db.n = ed.b),
         bo AS (SELECT x, y FROM o2 UNION ALL SELECT y, x FROM o2),
         s AS (SELECT COUNT(*) AS m, CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy FROM bo)
       SELECT CAST(m // 2 AS BIGINT) AS n_edges,
         round((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / greatest(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE),
               1e-12), 6) AS assortativity
       FROM s"""

  /** DuckDB mirror of [[triangles]] — id-ordered closure (x<y<z with all
    * three edges present), which counts the same set orientation-free.
    */
  def trianglesSql(edgePairsCtes: String): String =
    s"""WITH $edgePairsCtes,
         ed AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
                FROM ep WHERE id_a <> id_b),
         t AS (SELECT COUNT(*) AS n_triangles
               FROM ed e1 JOIN ed e2 ON e2.a = e1.a AND e2.b > e1.b
               JOIN ed e3 ON e3.a = e1.b AND e3.b = e2.b),
         dg AS (SELECT n, COUNT(*) AS deg FROM (
                 SELECT a AS n FROM ed UNION ALL SELECT b FROM ed) GROUP BY n),
         wd AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM dg)
       SELECT n_triangles, n_wedges,
         CASE WHEN n_wedges > 0
           THEN round(3.0 * n_triangles / n_wedges, 6) ELSE 0.0 END AS clustering
       FROM t CROSS JOIN wd"""

  /** LOCAL clustering coefficient per node (Watts-Strogatz 1998):
    * c_i = 2·tri_i / (deg_i(deg_i − 1)) — which near-dup documents sit in
    * CLIQUE-LIKE template families (c → 1, safe to collapse to one
    * representative) vs in bridge positions between families (c → 0,
    * where collapsing merges distinct content). The global [[triangles]]
    * census averages this away.
    *
    * Shape: triangles enumerate once per triangle via the oriented
    * (a < b < c on id) wedge join — Σdeg² fan-out like [[triangles]],
    * never all-pairs — then explode to their three corners and count per
    * node. Degree-1 nodes report coefficient 0 (no wedge to close).
    */
  def localClustering(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val e = pairs.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("a"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // id-oriented enumeration: wedge (x<y), (x<z), y<z closed by (y,z)
    val w1 = e.select(col("a").as("x"), col("b").as("y"))
    val w2 = e.select(col("a").as("x"), col("b").as("z"))
    val tris = w1.join(w2, "x").where(col("y") < col("z"))
      .join(e.select(col("a").as("y"), col("b").as("z")), Seq("y", "z"), "left_semi")
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("tri"))
    def d(c: Column) = c.cast("double")
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("id"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          round(lit(2.0) * d(coalesce(col("tri"), lit(0L))) /
            (d(col("deg")) * (d(col("deg")) - lit(1.0))), 6))
          .otherwise(lit(0.0)).as("local_cc"))
      .orderBy("id")
  }

  /** DuckDB mirror of [[localClustering]]. */
  def localClusteringSql(edgePairsCtes: String): String =
    s"""WITH $edgePairsCtes,
         ed AS (SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
                FROM ep WHERE id_a <> id_b),
         tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM ed e1 JOIN ed e2 ON e2.a = e1.a AND e2.b > e1.b
               JOIN ed e3 ON e3.a = e1.b AND e3.b = e2.b),
         pn AS (SELECT n, COUNT(*) AS tri FROM (
                 SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
                 UNION ALL SELECT z FROM tri) GROUP BY n),
         dg AS (SELECT n, COUNT(*) AS deg FROM (
                 SELECT a AS n FROM ed UNION ALL SELECT b FROM ed) GROUP BY n)
       SELECT dg.n AS id, CAST(deg AS BIGINT) AS deg,
         CAST(COALESCE(tri, 0) AS BIGINT) AS n_triangles,
         CASE WHEN deg >= 2
           THEN round(2.0 * CAST(COALESCE(tri, 0) AS DOUBLE)
             / (CAST(deg AS DOUBLE) * (CAST(deg AS DOUBLE) - 1.0)), 6)
           ELSE 0.0 END AS local_cc
       FROM dg LEFT JOIN pn ON dg.n = pn.n
       ORDER BY id"""
}
