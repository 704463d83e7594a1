package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed second-moment statistics over embedding columns: the exact
  * d×d covariance matrix, and PCA projection onto its dominant eigenvector —
  * the whitening/decorrelation step embedding pipelines run before
  * quantization ([[Quantize]]) or dimensionality truncation (`mrl_truncate`),
  * and the diagnostic that tells you how much of the corpus variance a
  * low-rank view keeps.
  *
  * Scale shape: covariance is distributed Gram accumulation with the
  * products kept OUT of the row stream — each task folds its vectors into
  * ONE packed d(d+1)/2+d-cell exact-DECIMAL buffer (a typed [[Aggregator]]
  * over the flat product array), so the shuffle moves one buffer per
  * partition instead of d² rows per vector (the earlier posexplode form was
  * the round-5 board's worst 10× smoke ratio on exactly that fan-out). The
  * eigen-step then runs on the driver over the d×d result (bounded —
  * dim-sized, not corpus-sized), exactly like the k-means centroid and BPE
  * merge-table driver states.
  */
object Pca {

  /** The packed exact-moment fold: input is each vector's flat
    * [upper-triangle products ++ raw coordinates] double array; the buffer
    * holds one java BigDecimal per cell at scale 12. Each double is
    * decimalized EXACTLY the way Spark's `cast("decimal(28,12)")` does it —
    * shortest-decimal string repr (`BigDecimal.valueOf`), then HALF_UP to
    * scale 12 — so the fold is bit-compatible with the declarative
    * `sum(cast(...))` it replaces (and with the DuckDB oracle that was
    * hash-green against that form). Addition at equal scale is exact, hence
    * associative — the result is partitioning-independent.
    */
  private final class MomentAgg(nCells: Int)
      extends Aggregator[Array[Double], MomentAgg.State, MomentAgg.Result] {
    import MomentAgg._
    def zero: State = State(0L, null)
    private def dec(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x).setScale(12, java.math.RoundingMode.HALF_UP)
    def reduce(b: State, a: Array[Double]): State = {
      if (b.sums == null) b.sums = Array.fill(nCells)(java.math.BigDecimal.ZERO)
      var k = 0
      while (k < nCells) { b.sums(k) = b.sums(k).add(dec(a(k))); k += 1 }
      b.n += 1L
      b
    }
    def merge(x: State, y: State): State =
      if (x.sums == null) y
      else if (y.sums == null) x
      else {
        var k = 0
        while (k < nCells) { x.sums(k) = x.sums(k).add(y.sums(k)); k += 1 }
        x.n += y.n
        x
      }
    def finish(b: State): Result = {
      val s = if (b.sums == null) Array.fill(nCells)(java.math.BigDecimal.ZERO)
        else b.sums
      // plain strings (no exponent) survive the cast back to DECIMAL(28,12)
      Result(b.n, s.map(_.toPlainString).toSeq)
    }
    def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    def outputEncoder: Encoder[Result] = Encoders.product[Result]
  }
  private object MomentAgg {
    final case class State(var n: Long, var sums: Array[java.math.BigDecimal])
    final case class Result(n: Long, sums: Seq[String])
  }

  /** One-row relation (n, sums[d(d+1)/2 + d]) of exact decimal moment sums:
    * upper-triangle cross products first, per-dimension value sums last.
    */
  private def moments(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val v = col(vecCol)
    // flat double array per vector — products are computed in codegen'd
    // array expressions; only the SUMMATION is the Aggregator
    val prods = flatten(transform(sequence(lit(1), lit(dim)), i =>
      transform(sequence(i, lit(dim)), j =>
        element_at(v, i).cast("double") * element_at(v, j).cast("double"))))
    val packed = concat(prods, transform(v, x => x.cast("double")))
    val spark = emb.sparkSession
    import spark.implicits._
    val ds = Dedup.parallelize(emb).select(packed.as("arr")).as[Array[Double]]
    ds.select(new MomentAgg(dim * (dim + 1) / 2 + dim).toColumn).toDF("n", "sums")
  }

  /** Exact covariance matrix of `vecCol` (upper triangle, 1-based (i,j),
    * i ≤ j). Per-cell products are decimalized at scale 12 before exact
    * summation inside [[MomentAgg]] — associative, so the result is
    * identical under any partitioning and matches the DuckDB mirror
    * bit-for-bit; means divide once in double. The (i,j) labels are a pure
    * function of the flatten position, rejoined AFTER the fold via a
    * broadcast d(d+1)/2-row lookup — they never ride the data.
    */
  def covMatrix(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val nProd = dim * (dim + 1) / 2
    val posToIj = {
      val spark = emb.sparkSession
      import spark.implicits._
      (for { i <- 1 to dim; j <- i to dim } yield (i, j)).zipWithIndex
        .map { case ((i, j), pos) => (pos, i, j) }
        .toDF("pos", "i", "j")
    }
    val cells = moments(emb, vecCol, dim)
      .select(col("n"), posexplode(col("sums")).as(Seq("pos", "s")))
    val sums = cells.where(col("pos") < nProd)
      // (38,12): the fold's exact sum can exceed DECIMAL(28,12)'s 16 integer
      // digits on a large corpus; 38 matches DuckDB's widened SUM type, so
      // both engines null out (or not) at the same magnitude
      .select(col("pos"), col("s").cast("decimal(38,12)").as("sxy"), col("n"))
      .join(broadcast(posToIj), "pos")
    val means = cells.where(col("pos") >= nProd)
      .select((col("pos") - nProd + 1).as("d"),
        (col("s").cast("decimal(38,12)").cast("double") / col("n")).as("m"))
    sums
      .join(broadcast(means.select(col("d").as("i"), col("m").as("mi"))), "i")
      .join(broadcast(means.select(col("d").as("j"), col("m").as("mj"))), "j")
      .select(col("i").cast("int").as("i"), col("j").cast("int").as("j"),
        // + 0.0 normalizes IEEE signed zero: DuckDB's round keeps -0.0,
        // Spark's BigDecimal round does not — and -0.0 + 0.0 = +0.0
        (round(col("sxy").cast("double") / col("n") - col("mi") * col("mj"), 6)
          + lit(0.0)).as("cov"))
      .orderBy("i", "j")
  }

  /** [[covMatrix]]'s DuckDB mirror as a CTE chain ending in
    * `cov(i, j, cov)` (unordered) — shared by the covariance oracle and the
    * [[pcaProjectSql]] power iteration.
    */
  def covMatrixSqlCtes(tbl: String, vecCol: String, dim: Int): String =
    s"""idx AS (SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j
           FROM range(1, ${dim + 1}) a(i) JOIN range(1, ${dim + 1}) b(j) ON b.j >= a.i),
       s AS (SELECT i, j,
               SUM(CAST(CAST($vecCol[i] AS DOUBLE) * CAST($vecCol[j] AS DOUBLE)
                 AS DECIMAL(28,12))) AS sxy,
               COUNT(*) AS n
             FROM $tbl CROSS JOIN idx GROUP BY 1, 2),
       m AS (SELECT CAST(d.d AS INT) AS d,
               CAST(SUM(CAST(CAST($vecCol[d.d] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*) AS m
             FROM $tbl CROSS JOIN range(1, ${dim + 1}) d(d) GROUP BY 1),
       cov AS (SELECT s.i, s.j,
           round(CAST(sxy AS DOUBLE) / n - mi.m * mj.m, 6) + 0.0 AS cov
         FROM s JOIN m mi ON mi.d = s.i JOIN m mj ON mj.d = s.j)"""

  /** DuckDB mirror of [[covMatrix]]. */
  def covMatrixSql(tbl: String, vecCol: String, dim: Int): String =
    s"""WITH ${covMatrixSqlCtes(tbl, vecCol, dim)}
       SELECT i, j, cov FROM cov ORDER BY i, j"""

  /** Dominant principal component by deterministic power iteration over the
    * [[covMatrix]] result (collected — d×d is bounded, dim-sized driver
    * state), then the corpus projected onto it.
    *
    * Oracle-checkable ([[pcaProjectSql]] replays the identical fixed-count
    * iteration as a DuckDB recursive CTE over the hash-identical `cov`
    * relation): both engines start from e₁, apply the same normalized
    * matrix-vector map 100 times in plain double arithmetic, and the map is
    * a CONTRACTION toward the dominant eigenvector (complement shrinks by
    * λ₂/λ₁ per step), so per-step float-summation-order ulps are damped
    * instead of amplified — the engines land within ~1e-12 of each other,
    * far inside the round(4) the output carries. Sign convention: the
    * component's first |coordinate| > 1e-12 is positive, so the output is
    * unique. Iteration count is fixed (no data-dependent convergence test)
    * for determinism.
    */
  def pcaProject(emb: DataFrame, idCol: String,
      vecCol: String, dim: Int, iters: Int = 100): DataFrame = {
    val cells = covMatrix(emb, vecCol, dim).collect()
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j, x) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      c(i)(j) = x; c(j)(i) = x
    }
    var v = Array.tabulate(dim)(d => if (d == 0) 1.0 else 0.0)
    for (_ <- 0 until iters) {
      val u = Array.tabulate(dim)(j => (0 until dim).map(i => c(i)(j) * v(i)).sum)
      val norm = math.sqrt(u.map(x => x * x).sum)
      v = if (norm == 0.0) v else u.map(_ / norm)
    }
    // sign convention: first coordinate with |x| > 1e-12 is positive
    val flip = v.find(math.abs(_) > 1e-12).exists(_ < 0)
    if (flip) v = v.map(-_)
    val eigenvalue = {
      val cv = Array.tabulate(dim)(j => (0 until dim).map(i => c(i)(j) * v(i)).sum)
      (0 until dim).map(i => cv(i) * v(i)).sum
    }
    val litV = array(v.map(x => lit(x)): _*)
    // HALF_UP like round(x, 4) in both engines (math.rint was HALF_EVEN —
    // un-mirrorable in DuckDB, whose round is half-away-from-zero)
    val eigRounded = java.math.BigDecimal.valueOf(eigenvalue)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    emb.select(col(idCol),
        lit(eigRounded).as("eigenvalue"),
        round(aggregate(
          zip_with(col(vecCol), litV, (x, w) => x.cast("double") * w),
          lit(0.0).cast("double"), (acc, t) => acc + t), 4).as("score"))
      .orderBy(idCol)
  }

  /** DuckDB mirror of [[pcaProject]]: the SAME fixed-count power iteration,
    * as a recursive CTE carrying the unit vector as a LIST(DOUBLE). The
    * matrix rides as one nested-list row (`mat[i][j]`, full symmetric form
    * mirrored from the upper triangle); each step is the identical
    * u_j = Σ_i C[i][j]·v[i], normalize, with left-to-right double sums in
    * both engines; convergence damping absorbs the ulps (see
    * [[pcaProject]]).
    */
  def pcaProjectSql(tbl: String, idCol: String, vecCol: String, dim: Int,
      iters: Int = 100): String = {
    val d1 = dim + 1
    // one-element-list lambda binds u (the unnormalized C·v) so norm and
    // division reuse it — a LATERAL would be natural, but DuckDB lambdas
    // cannot close over LATERAL-correlated columns; plain cross-join
    // columns (mat.mm, it.v) they can. Seeds are CAST to DOUBLE — bare
    // `1.0` is DECIMAL in DuckDB and would run the iteration in decimal.
    s"""WITH RECURSIVE ${covMatrixSqlCtes(tbl, vecCol, dim)},
       fullm AS (SELECT i, j, cov FROM cov
         UNION ALL SELECT j AS i, i AS j, cov FROM cov WHERE i <> j),
       mat AS (SELECT list(r ORDER BY i) AS mm FROM (
           SELECT i, list(cov ORDER BY j) AS r FROM fullm GROUP BY i)),
       it(k, v) AS (
         SELECT 0 AS k,
           list_transform(range(1, $d1),
             d -> CAST(CASE WHEN d = 1 THEN 1 ELSE 0 END AS DOUBLE)) AS v
         UNION ALL
         SELECT k + 1,
           list_transform(
             [list_transform(range(1, $d1), j ->
                list_sum(list_transform(range(1, $d1), i -> mm[i][j] * v[i])))],
             u -> CASE WHEN sqrt(list_sum(list_transform(u, y -> y * y))) = 0 THEN u
                  ELSE list_transform(u,
                    x -> x / sqrt(list_sum(list_transform(u, y -> y * y)))) END)[1]
         FROM it, mat WHERE k < $iters),
       vfin AS (SELECT v FROM it WHERE k = $iters),
       signed AS (SELECT CASE WHEN (list_filter(v, x -> abs(x) > 1e-12))[1] < 0
           THEN list_transform(v, x -> -x) ELSE v END AS v FROM vfin),
       eig AS (SELECT v,
           round(list_sum(list_transform(range(1, $d1), i -> cv[i] * v[i])), 4)
             AS eigenvalue
         FROM (SELECT v, list_transform(range(1, $d1), j ->
               list_sum(list_transform(range(1, $d1), i -> mm[i][j] * v[i]))) AS cv
             FROM signed, mat))
       SELECT $idCol, eigenvalue,
         round(list_sum(list_transform(list_zip($vecCol, eig.v),
           p -> CAST(p[1] AS DOUBLE) * p[2])), 4) + 0.0 AS score
       FROM $tbl, eig
       ORDER BY $idCol"""
  }
}
