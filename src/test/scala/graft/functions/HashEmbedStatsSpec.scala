package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[HashEmbedExpr]] bit-equal to the relational form it replaced in
  * TextAnalysis.hashEmbed (explode → md5-bucket → (doc, bucket) count agg →
  * per-doc map + L2-norm fold) — including the absence semantics (null text
  * emits no row; empty text yields ONE empty-string token, like the
  * explode) and the exact rounding point (round(c/norm, 6) per slot).
  */
class HashEmbedStatsSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("hashembed-spec")
    .getOrCreate()

  private val texts = Seq(
    "a b a b a",
    "x",
    "",                              // one empty token after split
    "  MiXeD Case   spacing ",
    "aaaa bbbb aaaa",
    "tab\tand\nnewline\rchars",
    "unicode héllo wörld héllo 日本",
    "the the the the",              // single bucket → weight exactly 1.0
    null.asInstanceOf[String],       // absent from both outputs
    "z y x w v u t s r q p")

  private def docs = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("hashEmbed ≡ former relational explode+bucket-count+map fold") {
    val dim = 64
    val relational = {
      val id = col("doc_id")
      val counts = docs
        .select(id, explode(split(trim(lower(col("text"))), "\\s+")).as("_he_t"))
        .select(id,
          (conv(substring(md5(col("_he_t")), 1, 15), 16, 10).cast("long") %
            dim).cast("int").as("_he_b"))
        .groupBy(id, col("_he_b")).agg(count(lit(1)).as("_he_c"))
      counts.groupBy(id)
        .agg(
          map_from_entries(collect_list(struct(col("_he_b"), col("_he_c")))).as("_he_m"),
          sqrt(sum(col("_he_c") * col("_he_c")).cast("double")).as("_he_n"))
        .select(id,
          transform(sequence(lit(0), lit(dim - 1)),
            i => round(coalesce(element_at(col("_he_m"), i), lit(0L)).cast("double") /
              col("_he_n"), 6)).as("embedding"))
    }
    val got = graft.operators.TextAnalysis.hashEmbed(docs, "doc_id", "text", dim)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val want = relational
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(got == want)
    assert(!got.exists(_._1 == 8L), "null-text doc must stay absent")
    assert(got.exists(_._1 == 2L), "empty-text doc must still embed (one empty token)")
    // the single-repeated-token doc L2-normalizes to exactly 1.0 in its slot
    val single = got.find(_._1 == 7L).get._2
    assert(single.count(_ == 1.0) == 1 && single.count(_ == 0.0) == dim - 1)
  }

  test("hash_embed board query: no keyed exchange, fold evaluated once per row") {
    // parquet-backed input — a LocalRelation would be const-folded at
    // optimization time and hide the expression from the plan
    val dir = java.nio.file.Files.createTempDirectory("he_plan").toString
    try {
      docs.write.mode("overwrite").parquet(dir)
      val pq = spark.read.parquet(dir)
      val emb = graft.operators.TextAnalysis.hashEmbed(pq, "doc_id", "text")
        .select(col("doc_id"), posexplode(col("embedding")).as(Seq("dim", "w")))
        .where(col("w") =!= 0.0)
      val plan = emb.queryExecution.executedPlan.toString
      // the fold happens row-locally: no aggregation/join exchange anywhere
      assert(!plan.contains("Exchange hashpartitioning"),
        s"row-local hashEmbed still shuffles:\n$plan")
      // and it is evaluated ONCE per row — the posexplode's inferred
      // size/null filters must not re-evaluate it below the Generate
      // (the 2d0d327 lesson)
      val n = "hashembedexpr".r.findAllIn(plan.toLowerCase).length
      assert(n == 1, s"hash_embed fold must appear exactly once, got $n:\n$plan")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("hash_embed is codegen'd (no CodegenFallback) and agrees on a real scan") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    // round-12: doGenCode replaced the interpreted fallback — pin it
    assert(!HashEmbedExpr(Literal("a"), 8).isInstanceOf[CodegenFallback])
    val scan = spark.range(0, 40).select(
      concat_ws(" ", lit("w"), (col("id") % 5).cast("string"),
        lit("w x"), (col("id") % 3).cast("string")).as("text"))
    val viaCodegen = scan
      .select(graft.functions.HashEmbedExpr.hashEmbed(col("text"), 8).as("e"))
      .collect().map(_.getSeq[Double](0).toList)
    import org.apache.spark.unsafe.types.UTF8String
    val viaEval = scan.collect().map(_.getString(0)).map { t =>
      HashEmbedExpr(Literal(UTF8String.fromString(t),
          org.apache.spark.sql.types.StringType), 8).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toList
    }
    assert(viaCodegen.toList == viaEval.toList)
  }
}
