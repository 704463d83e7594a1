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
}
