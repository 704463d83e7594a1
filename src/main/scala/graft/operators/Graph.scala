package graft.operators

import org.apache.spark.sql.DataFrame
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
}
