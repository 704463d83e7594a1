package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-level keyword search over a document corpus — the inverted-index
  * shape: postings are (doc, term, tf) rows, a conjunctive query intersects
  * the posting lists of its terms.
  *
  * Plan shape at 100 TB: the `isin(query terms)` filter sits directly on the
  * exploded token stream, so only postings for the query's terms ever reach
  * the aggregation — the per-doc row count is bounded by |terms|, and both
  * aggregations are hash-partitioned with map-side partials. Against a
  * PRE-materialized postings table (the explode+filter+groupBy below, written
  * out once, bucketed by term) the same query becomes |terms| bounded
  * posting-list reads with no scan of the corpus at all.
  */
object Search {

  /** Documents containing ALL of `terms` as whitespace tokens
    * (case-insensitive), with the total occurrence count of the query terms.
    */
  def matchAllTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]
  ): DataFrame = {
    require(terms.nonEmpty, "matchAllTerms: empty term set")
    // dedupe after lowercasing: Seq("Spark", "spark") must behave as one
    // term, not demand two distinct matches (which no doc can satisfy)
    val lowered = terms.map(_.toLowerCase).distinct
    // necessary-condition gate BEFORE the explode: a doc can only match all
    // terms as tokens if it contains each as a substring, so docs failing the
    // cheap contains() conjunction skip tokenization entirely (at scale the
    // explode dominates; the gate is one codegen'd pass over the raw text)
    val gate = lowered.map(t => contains(lower(col(textCol)), lit(t))).reduce(_ && _)
    val postings = df
      .where(gate)
      .select(col(idCol),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .where(col("term").isin(lowered: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    postings
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("n_hits"))
      .where(col("n_terms") === lowered.length)
      .select(col(idCol), col("n_hits"))
  }
}
