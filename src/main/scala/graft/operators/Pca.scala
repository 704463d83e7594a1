package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed second-moment statistics over embedding columns: the exact
  * d×d covariance matrix, and PCA projection onto its dominant eigenvector —
  * the whitening/decorrelation step embedding pipelines run before
  * quantization ([[Quantize]]) or dimensionality truncation (`mrl_truncate`),
  * and the diagnostic that tells you how much of the corpus variance a
  * low-rank view keeps.
  *
  * Scale shape: covariance is the textbook distributed Gram accumulation —
  * every vector emits its d(d+1)/2 upper-triangle products INSIDE the scan
  * projection (no join, no per-row state), and the only shuffle is the
  * (i,j)-keyed aggregation, which map-side partial aggregation collapses to
  * at most d(d+1)/2 rows PER PARTITION regardless of corpus size. The
  * eigen-step then runs on the driver over the d×d result (bounded —
  * dim-sized, not corpus-sized), exactly like the k-means centroid and BPE
  * merge-table driver states.
  */
object Pca {

  /** Exact covariance matrix of `vecCol` (upper triangle, 1-based (i,j),
    * i ≤ j). Per-cell products are cast to DECIMAL(28,12) before summation —
    * exact and associative, so the result is identical under any
    * partitioning and matches the DuckDB mirror bit-for-bit; means divide
    * once in double.
    */
  def covMatrix(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val v = col(vecCol)
    // a FLAT double array, not an array of (i, j, xy) structs: the struct
    // form allocated d(d+1)/2 InternalRows per input row and smoked 4.8×
    // at 10× scale on allocation/GC alone; the (i, j) labels are a pure
    // function of the flatten position, so they rejoin AFTER the agg via a
    // broadcast d(d+1)/2-row lookup instead of riding every product
    val prods = flatten(transform(sequence(lit(1), lit(dim)), i =>
      transform(sequence(i, lit(dim)), j =>
        element_at(v, i).cast("double") * element_at(v, j).cast("double"))))
    val posToIj = {
      val spark = emb.sparkSession
      import spark.implicits._
      (for { i <- 1 to dim; j <- i to dim } yield (i, j)).zipWithIndex
        .map { case ((i, j), pos) => (pos, i, j) }
        .toDF("pos", "i", "j")
    }
    val sums = Dedup.parallelize(emb)
      .select(posexplode(prods).as(Seq("pos", "xy")))
      .groupBy("pos")
      .agg(sum(col("xy").cast("decimal(28,12)")).as("sxy"), count(lit(1)).as("n"))
      .join(broadcast(posToIj), "pos")
    val means = Dedup.parallelize(emb)
      .select(posexplode(v).as(Seq("d0", "x")))
      .groupBy((col("d0") + 1).as("d"))
      .agg((sum(col("x").cast("double").cast("decimal(28,12)")).cast("double") /
        count(lit(1))).as("m"))
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

  /** DuckDB mirror of [[covMatrix]]. */
  def covMatrixSql(tbl: String, vecCol: String, dim: Int): String =
    s"""WITH idx AS (SELECT CAST(a.i AS INT) AS i, CAST(b.j AS INT) AS j
           FROM range(1, ${dim + 1}) a(i) JOIN range(1, ${dim + 1}) b(j) ON b.j >= a.i),
       s AS (SELECT i, j,
               SUM(CAST(CAST($vecCol[i] AS DOUBLE) * CAST($vecCol[j] AS DOUBLE)
                 AS DECIMAL(28,12))) AS sxy,
               COUNT(*) AS n
             FROM $tbl CROSS JOIN idx GROUP BY 1, 2),
       m AS (SELECT CAST(d.d AS INT) AS d,
               CAST(SUM(CAST(CAST($vecCol[d.d] AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(*) AS m
             FROM $tbl CROSS JOIN range(1, ${dim + 1}) d(d) GROUP BY 1)
       SELECT s.i, s.j,
         round(CAST(sxy AS DOUBLE) / n - mi.m * mj.m, 6) + 0.0 AS cov
       FROM s JOIN m mi ON mi.d = s.i JOIN m mj ON mj.d = s.j
       ORDER BY s.i, s.j"""

  /** Dominant principal component by deterministic power iteration over the
    * [[covMatrix]] result (collected — d×d is bounded, dim-sized driver
    * state), then the corpus projected onto it.
    *
    * No DuckDB oracle: an eigen-decomposition is not expressible in
    * portable SQL — the covariance relation feeding it IS oracle-checked
    * (`cov_matrix`), and the spec pins the eigen-residual ‖Cv − λv‖ and the
    * projection arithmetic instead. Sign convention: the component's first
    * nonzero coordinate is positive, so the output is unique. Iteration
    * count is fixed (no data-dependent convergence test) for determinism.
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
    emb.select(col(idCol),
        lit(math.rint(eigenvalue * 1e4) / 1e4).as("eigenvalue"),
        round(aggregate(
          zip_with(col(vecCol), litV, (x, w) => x.cast("double") * w),
          lit(0.0).cast("double"), (acc, t) => acc + t), 4).as("score"))
      .orderBy(idCol)
  }
}
