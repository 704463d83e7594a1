package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers:
  *   - brute-force cosine top-k: broadcast the query vector, one scan,
  *     `TakeOrderedAndProject` top-k — the exact baseline. 100 TB shape:
  *     embarrassingly parallel scan, no shuffle beyond the final top-k merge.
  *   - LSH-bucketed ANN (random hyperplane signs): computes a b-bit signature
  *     per vector, joins on signature buckets, ranks within buckets — probes
  *     only matching buckets instead of the full corpus.
  *
  * All arithmetic is float→double elementwise then left-fold sum, matching
  * the DuckDB oracle's `list_transform`/`list_sum` evaluation exactly.
  */
object Similarity {

  /** dot(a,b) in double precision via zip_with + aggregate (codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** One-pass JVM expression, bit-identical to `dot/(norm*norm)` in HOF form
    * (see [[graft.functions.CosineExpr]]).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineExpr.cosine(a, b)

  /** HOF Column form — kept as the equivalence reference for the fast path. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against the vector with id `queryId`.
    * Output: (vec_id, label, sim) ordered by sim desc, vec_id asc.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int): DataFrame = {
    val q = emb
      .where(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"))
    emb
      .crossJoin(broadcast(q))
      .withColumn("sim", round(cosine(col(vecCol), col("query_vec")), 4))
      .orderBy(col("sim").desc, col(idCol))
      .select(col(idCol), col("sim"))
      .limit(k)
  }

  /** Random-hyperplane LSH signature: b seeded hyperplanes generated
    * driver-side and embedded as array LITERALS (constant-folded, zero
    * per-row construction cost). sign(dot(v,h)) per plane → b-bit signature.
    * At scale the bucket join is hash-partitioned on the signature.
    */
  def lshSignature(vec: Column, bits: Int, dim: Int, seed: Int = 42): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits)(Array.fill(dim)(rnd.nextBoolean()))
    val bitCols = (0 until bits).map { p =>
      // ±1 hyperplane ⇒ the dot product is a signed sum — built from plain
      // element_at adds/subtracts, which stay inside whole-stage codegen
      // (an interpreted zip_with/aggregate dot cost ~2.5ms/row)
      val terms = (0 until dim).map { d =>
        // try_element_at + 0-default: vectors shorter than `dim` contribute
        // nothing instead of ANSI-throwing
        val e = coalesce(try_element_at(vec, lit(d + 1)).cast("double"), lit(0.0))
        if (planes(p)(d)) e else -e
      }
      val dotp = terms.reduce(_ + _)
      when(dotp >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  /** Embedding-cosine near-duplicate PAIRS: bucket by the sign pattern of
    * the first `signDims` coordinates (a deterministic coordinate-hyperplane
    * LSH that a SQL oracle can replicate exactly), join within buckets, keep
    * pairs with cosine ≥ threshold. At scale the join is hash-partitioned on
    * the bucket — never all-pairs.
    */
  def cosineNearDupPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      signDims: Int = 4
  ): DataFrame = {
    val bucket = (0 until signDims)
      .map(d => when(try_element_at(col(vecCol), lit(d + 1)) >= 0, 1 << d).otherwise(0))
      .reduce(_ + _)
    val sig = emb.select(col(idCol), col(vecCol), bucket.as("bucket"))
    val a = sig.as("a")
    val b = sig.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"),
        col(s"b.$idCol").as("id_b"),
        round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** ANN top-k: restrict ranking to vectors sharing the query's LSH bucket;
    * a sparse bucket returns fewer than k rows (recall/latency trade-off —
    * at real scale multi-probe or band-OR widens the candidate set).
    */
  def annTopK(emb: DataFrame, idCol: String, vecCol: String, queryId: Long, k: Int,
      bits: Int = 8, dim: Int = 64): DataFrame = {
    val sigs = emb.withColumn("lsh_sig", lshSignature(col(vecCol), bits, dim))
    val q = sigs
      .where(col(idCol) === queryId)
      .select(col(vecCol).as("query_vec"), col("lsh_sig").as("query_sig"))
    val bucket = sigs
      .crossJoin(broadcast(q))
      .where(col("lsh_sig") === col("query_sig"))
    bucket
      .withColumn("sim", round(cosine(col(vecCol), col("query_vec")), 4))
      .orderBy(col("sim").desc, col(idCol))
      .select(col(idCol), col("sim"))
      .limit(k)
  }
}
