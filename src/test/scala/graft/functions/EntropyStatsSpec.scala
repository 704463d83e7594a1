package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[TokenEntropyStatsExpr]] / [[CharEntropyStatsExpr]] bit-equal to
  * the relational forms they replaced in TextAnalysis (explode → per-(doc,
  * item) count → rounded-DECIMAL entropy fold) — including the absence
  * semantics: docs whose explode produced zero rows must stay absent.
  */
class EntropyStatsSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("entropystats-spec")
    .getOrCreate()

  private val texts = Seq(
    "a b a b a",
    "x",
    "",                              // one empty token after split
    "  MiXeD Case   spacing ",
    "aaaa bbbb aaaa",
    "tab\tand\nnewline\rchars",      // '.' never matches \n or \r
    "unicode héllo wörld héllo 日本",
    "the the the the",
    null.asInstanceOf[String],       // absent from both outputs
    "z y x w v u t s r q p")

  private def docs = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("tokenEntropy ≡ former relational explode+count+fold") {
    val relational = {
      val id = col("doc_id")
      val tf = docs
        .select(id, explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
        .groupBy(id, col("t")).agg(count(lit(1)).as("tf"))
      tf.groupBy(id)
        .agg(sum(col("tf")).as("n_tokens"),
          sum(round(col("tf").cast("double") * log(col("tf").cast("double")), 4)
            .cast("decimal(18,4)")).as("s"))
        .select(id, col("n_tokens"),
          greatest(lit(0.0),
            log(col("n_tokens").cast("double")) -
              col("s").cast("double") / col("n_tokens").cast("double")).as("entropy"))
    }
    val got = graft.operators.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = relational.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(!got.exists(_.head == 8L)) // the null-text doc is absent
  }

  test("charEntropy ≡ former relational explode+count+join+fold") {
    val relational = {
      val counts = docs
        .select(col("doc_id"),
          explode(regexp_extract_all(col("text"), lit("."), lit(0))).as("ch"))
        .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      val perDoc = counts.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("charset"), sum(col("c")).as("n"))
      def d(c: org.apache.spark.sql.Column) = c.cast("double")
      val term = round((d(col("c")) / d(col("n"))) * log(d(col("c")) / d(col("n"))), 9)
      counts.join(perDoc, Seq("doc_id"))
        .groupBy(col("doc_id"))
        .agg(max(col("charset")).as("charset"), max(col("n")).as("n_chars"),
          (-sum(term.cast("decimal(18,9)"))).cast("double").as("h"))
        .select(col("doc_id"), col("charset"), col("n_chars"),
          round(col("h") / lit(math.log(2.0)), 6).as("entropy_bits"))
    }
    val got = graft.operators.TextAnalysis.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val want = relational.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("entropy stats are codegen'd (no CodegenFallback) and agree on a real scan") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    // round-12: doGenCode replaced the interpreted fallback — pin it
    assert(!TokenEntropyStatsExpr(Literal("a")).isInstanceOf[CodegenFallback])
    assert(!CharEntropyStatsExpr(Literal("a")).isInstanceOf[CodegenFallback])
    // range-backed (non-local) relation → WholeStageCodegen path; compare
    // against the interpreted eval of the same expression via collect of
    // a local relation with identical rows
    val scan = spark.range(0, 40).select(
      concat_ws(" ", lit("w"), (col("id") % 5).cast("string"),
        lit("w x"), (col("id") % 3).cast("string")).as("text"))
    val viaCodegen = scan.select(
        graft.functions.EntropyStatsExpr.tokenEntropyStats(col("text")).as("te"),
        graft.functions.EntropyStatsExpr.charEntropyStats(col("text")).as("ce"))
      .collect().map(_.toSeq).toSeq
    val local = scan.collect().map(_.getString(0))
    import org.apache.spark.unsafe.types.UTF8String
    val viaEval = local.map { t =>
      val u = UTF8String.fromString(t)
      val te = TokenEntropyStatsExpr(Literal(u, org.apache.spark.sql.types.StringType)).eval(null)
      val ce = CharEntropyStatsExpr(Literal(u, org.apache.spark.sql.types.StringType)).eval(null)
      (te, ce)
    }
    assert(viaCodegen.size == viaEval.size)
    // spot equality through the DataFrame re-encode of the eval results
    viaCodegen.zip(viaEval).foreach { case (cg, (te, ce)) =>
      val teRow = te.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val ceRow = ce.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val cgTe = cg(0).asInstanceOf[org.apache.spark.sql.Row]
      val cgCe = cg(1).asInstanceOf[org.apache.spark.sql.Row]
      assert(cgTe.getLong(0) == teRow.getLong(0))
      assert(cgTe.getDecimal(1).compareTo(
        teRow.getDecimal(1, 38, 4).toJavaBigDecimal) == 0)
      assert(cgCe.getLong(0) == ceRow.getLong(0))
      assert(cgCe.getLong(1) == ceRow.getLong(1))
      assert(cgCe.getDecimal(2).compareTo(
        ceRow.getDecimal(2, 38, 9).toJavaBigDecimal) == 0)
    }
  }
}
