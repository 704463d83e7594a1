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

  /** BM25-ranked DISJUNCTIVE search (Robertson/Spärck Jones; the Lucene
    * `ln(1 + (N-df+0.5)/(df+0.5))`-style non-negative idf): documents
    * containing ANY query term, scored
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` and ranked.
    *
    * Cross-engine exactness, same discipline as the LM scores: every
    * constant appears as the same decimal literal in both engines (no
    * folded arithmetic on constants — `1.2+1.0` folds to a double one ulp
    * off the literal `2.2`), each per-(doc,term) contribution is rounded to
    * 4 decimals and accumulated as DECIMAL, and the corpus stats (N, avgdl)
    * ride along as one broadcast row computed with the identical
    * cast-then-divide.
    *
    * Plan shape at 100 TB: document length comes from `size(split)` on the
    * base scan — no second explode; postings explode only rows passing the
    * any-term contains() gate; df/N/avgdl are tiny broadcasts. Against a
    * pre-materialized postings+doclen table the query is |terms| posting
    * reads, no corpus scan.
    */
  def bm25Rank(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Rank: empty term set")
    val lowered = terms.map(_.toLowerCase).distinct
    val base = Dedup.parallelize(df).select(col(idCol),
      lower(col(textCol)).as("_txt"),
      size(TextAnalysis.tokens(lower(col(textCol)))).as("dl"))
    // corpus stats over ALL docs (one row, broadcast)
    val stats = base.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val gate = lowered.map(t => contains(col("_txt"), lit(t))).reduce(_ || _)
    // barrier: the postings relation feeds BOTH the df aggregation and the
    // score join below — without it the optimizer re-expands the whole
    // scan+tokenize+explode upstream at each consumer (two full corpus
    // passes per probe; the pipeline_e2e multi-consumer lesson applied to
    // the query side). Postings are (matched docs × |terms|)-bounded.
    val postings = base
      .where(gate)
      .select(col(idCol), col("dl"), explode(TextAnalysis.tokens(col("_txt"))).as("term"))
      .where(col("term").isin(lowered: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .localCheckpoint()
    val docFreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfw = col("tf").cast("double") * lit(k1 + 1) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    postings
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(sum(round(idf * tfw, 4).cast("decimal(18,4)")).as("_s"))
      .select(col(idCol), col("_s").cast("double").as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Exact phrase search via POSITIONAL postings: an occurrence at token
    * position i means `token[i+j] == phrase[j]` for every j, so the start
    * positions are the intersection of each term's posting positions
    * shifted left by its phrase offset. The whole match runs in ONE
    * aggregation: posexplode → keep only the phrase's terms (below the
    * contains() gate, like [[matchAllTerms]]) → per-doc conditional
    * position lists per offset → chained array_intersect. No self-joins —
    * the classic L-way positional-index merge as a single hash-partitioned
    * groupBy. Against a pre-materialized positional postings table
    * (term-bucketed), the same query is |phrase| posting reads.
    *
    * Output: (idCol, n_occurrences) for docs with ≥ 1 occurrence.
    */
  def phraseSearch(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "phraseSearch: need a multi-token phrase")
    val lowered = phrase.map(_.toLowerCase)
    val distinctTerms = lowered.distinct
    // sound necessary condition: every phrase term must appear as a
    // substring (adjacency can't be gated cheaply — whitespace runs vary)
    val gate = distinctTerms.map(t => contains(lower(col(textCol)), lit(t))).reduce(_ && _)
    val postings = Dedup.parallelize(df)
      .where(gate)
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(lower(col(textCol)))).as(Seq("pos", "term")))
      .where(col("term").isin(distinctTerms: _*))
    val starts = lowered.zipWithIndex.map { case (t, j) =>
      collect_list(when(col("term") === t, col("pos") - j)).as(s"_p$j")
    }
    postings
      .groupBy(col(idCol))
      .agg(starts.head, starts.tail: _*)
      .select(col(idCol),
        size((1 until lowered.length).foldLeft(col("_p0")) { (acc, j) =>
          array_intersect(acc, col(s"_p$j"))
        }).cast("long").as("n_occurrences"))
      .where(col("n_occurrences") > 0)
  }

  /** DuckDB mirror of [[phraseSearch]] — the direct list-comprehension
    * ground truth (`ws[i+j] = phrase[j] ∀j`), deliberately NOT the postings
    * plan: equality proves the index form computes the definition.
    */
  def phraseSearchSql(table: String, idCol: String, textCol: String,
      phrase: Seq[String]): String = {
    val l = phrase.length
    val conds = phrase.map(_.toLowerCase).zipWithIndex
      .map { case (t, j) => s"ws[i + $j] = ${OracleSql.lit(t)}" }.mkString(" AND ")
    s"""WITH w AS (SELECT $idCol, string_split_regex(trim(lower($textCol)),'\\s+') AS ws FROM $table)
       SELECT $idCol, CAST(len(list_filter(range(1, len(ws) - ${l - 2}), i -> $conds)) AS BIGINT)
         AS n_occurrences
       FROM w WHERE len(list_filter(range(1, len(ws) - ${l - 2}), i -> $conds)) > 0
       ORDER BY $idCol"""
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of a lexical
    * and a semantic ranking — the standard hybrid-retrieval combiner:
    * `rrf(d) = Σ_lists 1/(k0 + rank_list(d))`, robust to the two score
    * scales being incomparable (only RANKS enter the fusion).
    *
    * Inputs are ranked lists `(id, rank)` with rank 1-based and dense per
    * list. The fusion is a full outer join of two top-N lists — list-sized,
    * not corpus-sized, so at 100 TB the expensive work is entirely inside
    * the two retrievers (each already bounded: BM25 postings reads, ANN
    * index probes) and the fusion itself touches 2N rows.
    *
    * Cross-engine exact: each reciprocal is the same IEEE division
    * `1.0/(k0+rank)` in both engines, the two-term sum has a fixed operand
    * order, and the result is rounded to 6 decimals.
    */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame, idCol: String,
      k: Int, k0: Int = 60): DataFrame = {
    val lex = lexical.select(col(idCol), col("rank").as("r_lex"))
    val sem = semantic.select(col(idCol), col("rank").as("r_sem"))
    lex
      .join(sem, Seq(idCol), "full_outer")
      .select(col(idCol), col("r_lex"), col("r_sem"),
        round(
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("r_lex").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("r_sem").cast("double")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio/RM3-lite): run the
    * query, treat the BM25 top-`nDocs` as relevant, and surface the
    * `nTerms` terms that best characterize that feedback set by tf-idf
    * (feedback term frequency × corpus idf), excluding the original query
    * terms — the classic recall-widening step between first-pass retrieval
    * and rerank.
    *
    * Scale shape: the feedback doc list is `nDocs` rows (TakeOrdered from
    * [[bm25Rank]]) and BROADCASTS into a semi-join against the corpus scan
    * — the expansion tf aggregation then runs over nDocs documents, not
    * the corpus. Corpus df (for idf) folds from the feedback terms only:
    * the df count semi-joins the corpus posting stream against the
    * (feedback-term)-sized key set. Nothing corpus-sized is ranked; the
    * final top-k is TakeOrdered over a feedback-vocabulary-sized relation.
    */
  def prfExpand(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], nDocs: Int = 10, nTerms: Int = 15): DataFrame = {
    val lowered = terms.map(_.toLowerCase).distinct
    val top = bm25Rank(df, idCol, textCol, terms, nDocs).select(col(idCol))
    val fb = df.join(broadcast(top), idCol)
    // term frequency across the feedback set (nDocs docs — tiny)
    // barrier: ftf feeds the df semi-join's key set AND the final weight
    // join — without it the BM25 top-k + feedback tokenize re-runs twice
    val ftf = fb.select(
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .where(!col("term").isin(lowered: _*))
      .groupBy("term").agg(count(lit(1)).as("ftf"))
      .localCheckpoint()
    // corpus document frequency, only for terms the feedback set surfaced
    val dfreq = Dedup.parallelize(df)
      .select(col(idCol), explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .join(broadcast(ftf.select("term")), Seq("term"), "left_semi")
      .groupBy("term").agg(count_distinct(col(idCol)).as("df"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    ftf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(total))
      .select(col("term"),
        round(col("ftf") * log(col("n_docs").cast("double") / col("df")), 4)
          .as("weight"))
      .orderBy(col("weight").desc, col("term"))
      .limit(nTerms)
  }

  /** DuckDB mirror of [[prfExpand]]: `bmCtes` must define a `bm` relation
    * (doc_id, score) over `table` — the [[bm25Rank]] mirror.
    */
  def prfExpandSql(bmCtes: String, table: String, idCol: String,
      textCol: String, terms: Seq[String], nDocs: Int = 10,
      nTerms: Int = 15): String = {
    val termList = terms.map(t => OracleSql.lit(t.toLowerCase)).mkString(", ")
    s"""WITH $bmCtes,
         top AS (SELECT $idCol FROM bm ORDER BY score DESC, $idCol LIMIT $nDocs),
         ftf AS (SELECT term, COUNT(*) AS ftf FROM (
             SELECT unnest(string_split_regex(trim(lower(t.$textCol)),'\\s+')) AS term
             FROM $table t JOIN top USING ($idCol))
           WHERE term NOT IN ($termList) GROUP BY term),
         fdf AS (SELECT term, COUNT(DISTINCT $idCol) AS df FROM (
             SELECT $idCol, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
             FROM $table)
           WHERE term IN (SELECT term FROM ftf) GROUP BY term),
         tot AS (SELECT COUNT(*) AS n_docs FROM $table)
       SELECT term, round(ftf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS weight
       FROM ftf JOIN fdf USING (term) CROSS JOIN tot
       ORDER BY weight DESC, term LIMIT $nTerms"""
  }

  /** Ranker-quality audit: precision@k of the BM25 ranking against a
    * DETERMINISTIC relevance set — documents matching ALL query terms as
    * tokens ([[matchAllTerms]]), the strictest lexical notion of "surely
    * relevant". The measure-your-ranker companion of the sketch
    * calibration audits: the number a retrieval stack publishes before
    * anyone trusts its top-k at corpus scale.
    *
    * Shape: the ranked list is k_max rows (global window over k_max rows
    * only — TakeOrdered delivers it); relevance is the gated conjunctive
    * match; the join is k_max × 1 columns. One output row.
    */
  /** NDCG@k of the BM25 ranker over a PANEL of queries (Järvelin &
    * Kekäläinen 2002) — graded relevance where [[precisionAtK]] is binary:
    * grade(doc) = number of DISTINCT query terms the doc contains as
    * tokens, gain 2^g − 1, log2 positional discount.
    *
    * Everything is bounded-relation algebra: one corpus scan builds the
    * postings for the union of all panels' terms (contains() gate below
    * the explode, exactly [[bm25Rank]]); scores are per-(query, doc) with
    * the round(·,4)-DECIMAL sum discipline so ranking ties are exact; the
    * per-query top-k is a rank-filtered window (WindowGroupLimit prunes it
    * map-side); and the IDEAL ranking never materializes — it derives from
    * the per-query GRADE HISTOGRAM (≤ max-grade rows per query), whose
    * descending-cumulative join against the k positions yields the ideal
    * grade at every position. No collect, no per-query corpus sort.
    *
    * Output: one row per query — docs scored, DCG@k, IDCG@k, NDCG@k.
    */
  def ndcgAtK(df: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty), "ndcgAtK: empty panel")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val qterms = queries
      .flatMap { case (q, ts) => ts.map(t => (q, t.toLowerCase)) }
      .distinct.toDF("qid", "term")
    val allTerms = queries.flatMap(_._2.map(_.toLowerCase)).distinct
    val base = Dedup.parallelize(df).select(col(idCol).as("_n_id"),
      lower(col(textCol)).as("_txt"),
      size(TextAnalysis.tokens(lower(col(textCol)))).as("dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val gate = allTerms.map(t => contains(col("_txt"), lit(t))).reduce(_ || _)
    // barrier (multi-consumer): postings feed df + the panel score join;
    // without it each consumer re-expands the corpus scan+tokenize+explode
    val postings = base
      .where(gate)
      .select(col("_n_id"), col("dl"),
        explode(TextAnalysis.tokens(col("_txt"))).as("term"))
      .where(col("term").isin(allTerms: _*))
      .groupBy(col("_n_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .localCheckpoint()
    val docFreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfw = col("tf").cast("double") * lit(k1 + 1) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    // per-(query, doc): DECIMAL-exact score + grade (postings are unique per
    // (doc, term), so count(*) IS the distinct-term match count)
    val scores = postings
      .join(broadcast(docFreq), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("qid"), col("_n_id"))
      .agg(sum(round(idf * tfw, 4).cast("decimal(18,4)")).as("_s"),
        count(lit(1)).as("g"))
      // barrier: scores feed the DCG ranking, the per-query scored count
      // AND the ideal-grade histogram — three consumers, panel-bounded rows
      .localCheckpoint()
    val ranked = scores
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("_s").desc, col("_n_id"))))
      .where(col("rk") <= k)
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val dcgTerm = round((pow(lit(2.0), d(col("g"))) - lit(1.0)) /
      (log(d(col("rk")) + lit(1.0)) / log(lit(2.0))), 9)
    val dcg = ranked.groupBy("qid")
      .agg(sum(dcgTerm.cast("decimal(18,9)")).as("_dcg"))
    val nScored = scores.groupBy("qid").agg(count(lit(1)).as("n_scored"))
    // ideal grades from the descending-cumulative grade histogram
    val cum = scores.groupBy("qid", "g").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("qid").orderBy(col("g").desc)))
    val positions = qterms.select("qid").distinct()
      .select(col("qid"), explode(sequence(lit(1), lit(k))).as("p"))
    val ideal = positions.join(cum, Seq("qid"))
      .where(col("cum") >= col("p"))
      .groupBy("qid", "p").agg(max(col("g")).as("ig"))
    val idcgTerm = round((pow(lit(2.0), d(col("ig"))) - lit(1.0)) /
      (log(d(col("p")) + lit(1.0)) / log(lit(2.0))), 9)
    val idcg = ideal.groupBy("qid")
      .agg(sum(idcgTerm.cast("decimal(18,9)")).as("_idcg"))
    dcg.join(idcg, "qid").join(nScored, "qid")
      .select(col("qid"), col("n_scored"),
        round(d(col("_dcg")), 6).as("dcg"),
        round(d(col("_idcg")), 6).as("idcg"),
        round(d(col("_dcg")) / d(col("_idcg")), 6).as("ndcg"))
      .orderBy("qid")
  }

  /** DuckDB mirror of [[ndcgAtK]] — same postings/score/histogram algebra. */
  def ndcgAtKSql(table: String, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): String = {
    val qtVals = queries
      .flatMap { case (q, ts) => ts.map(t => (q, t.toLowerCase)) }
      .distinct
      .map { case (q, t) => s"(${OracleSql.lit(q)}, ${OracleSql.lit(t)})" }
      .mkString(", ")
    val allTerms = queries.flatMap(_._2.map(_.toLowerCase)).distinct
      .map(OracleSql.lit).mkString(",")
    s"""WITH qt(qid, term) AS (VALUES $qtVals),
       base AS (SELECT $idCol AS id, trim(lower($textCol)) AS txt,
           len(string_split_regex(trim(lower($textCol)),'\\s+')) AS dl
         FROM $table),
       stats AS (SELECT COUNT(*) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM base),
       p AS (SELECT id, term, COUNT(*) AS tf, MAX(dl) AS dl FROM (
           SELECT id, dl, unnest(string_split_regex(txt,'\\s+')) AS term FROM base)
         WHERE term IN ($allTerms) GROUP BY id, term),
       f AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term),
       sc AS (SELECT qid, id,
           SUM(CAST(round(
             ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
               / (CAST(df AS DOUBLE) + 0.5) + 1.0)
             * ((CAST(tf AS DOUBLE) * ${k1 + 1})
               / (CAST(tf AS DOUBLE) + $k1 * (${1 - b} + ($b * CAST(dl AS DOUBLE)) / avgdl))),
             4) AS DECIMAL(18,4))) AS s,
           COUNT(*) AS g
         FROM p JOIN f USING (term) JOIN qt USING (term) CROSS JOIN stats
         GROUP BY qid, id),
       rk AS (SELECT qid, id, g,
           row_number() OVER (PARTITION BY qid ORDER BY s DESC, id) AS rk
         FROM sc),
       dcg AS (SELECT qid, SUM(CAST(round(
             (power(2.0, CAST(g AS DOUBLE)) - 1.0)
             / (ln(CAST(rk AS DOUBLE) + 1.0) / ln(2.0)), 9) AS DECIMAL(18,9))) AS dcg
         FROM rk WHERE rk <= $k GROUP BY qid),
       nsc AS (SELECT qid, COUNT(*) AS n_scored FROM sc GROUP BY qid),
       cum AS (SELECT qid, g, SUM(c) OVER (PARTITION BY qid ORDER BY g DESC) AS cum
         FROM (SELECT qid, g, COUNT(*) AS c FROM sc GROUP BY qid, g)),
       pos AS (SELECT qid, unnest(range(1, ${k + 1})) AS p
         FROM (SELECT DISTINCT qid FROM qt)),
       ideal AS (SELECT qid, p, MAX(g) AS ig
         FROM pos JOIN cum USING (qid) WHERE cum >= p GROUP BY qid, p),
       idcg AS (SELECT qid, SUM(CAST(round(
             (power(2.0, CAST(ig AS DOUBLE)) - 1.0)
             / (ln(CAST(p AS DOUBLE) + 1.0) / ln(2.0)), 9) AS DECIMAL(18,9))) AS idcg
         FROM ideal GROUP BY qid)
       SELECT qid, n_scored,
         round(CAST(dcg AS DOUBLE), 6) AS dcg,
         round(CAST(idcg AS DOUBLE), 6) AS idcg,
         round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg
       FROM dcg JOIN idcg USING (qid) JOIN nsc USING (qid)
       ORDER BY qid"""
  }

  /** Average precision + MRR of the BM25 ranking against the conjunctive
    * relevance set — the rank-sensitive companion to [[precisionAtK]]:
    * p@k is blind to WHERE in the top-k the relevant docs sit; AP
    * integrates precision at every relevant hit (so burying relevant docs
    * at the bottom of the window costs score), and MRR isolates the
    * first-hit experience. AP's denominator is the FULL corpus relevance
    * count, so relevant docs the ranker never surfaces count as misses.
    *
    * Shape: same ranked-topk ⋈ relevance left-join as precisionAtK; the
    * cumulative-hits window runs over the ≤kmax ranked rows only.
    */
  def apEval(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], kmax: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = bm25Rank(df, idCol, textCol, terms, kmax)
      .select(col(idCol),
        row_number().over(Window.orderBy(col("score").desc, col(idCol))).as("rk"))
    val rel = matchAllTerms(df, idCol, textCol, terms)
      .select(col(idCol), lit(1L).as("_rel"))
    val nRel = rel.agg(count(lit(1)).as("n_relevant"))
    val w = Window.orderBy("rk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hits = ranked.join(rel, Seq(idCol), "left")
      .select(col("rk"), when(col("_rel").isNotNull, 1L).otherwise(0L).as("r"))
      .withColumn("cum", sum(col("r")).over(w))
      .select(when(col("r") === 1,
          round(col("cum").cast("double") / col("rk").cast("double"), 6)
            .cast("decimal(18,6)")).as("p"),
        when(col("r") === 1, col("rk")).as("rrk"))
    val agg = hits.agg(sum(col("p")).as("sp"), min(col("rrk")).as("frk"),
      count(col("p")).as("hits_ranked"))
    agg.crossJoin(broadcast(nRel))
      .select(col("n_relevant"), col("hits_ranked"),
        when(col("n_relevant") > 0,
          round(coalesce(col("sp").cast("double"), lit(0.0)) /
            col("n_relevant").cast("double"), 6)).as("ap"),
        when(col("frk").isNotNull,
          round(lit(1.0) / col("frk").cast("double"), 6)).as("mrr"))
  }

  /** [[apEval]] across a query panel: one (query, n_relevant, ap, mrr)
    * row per panel entry — the macro view a ranker regression gate
    * actually tracks (single-query AP swings on one relevance set; the
    * panel mean doesn't).
    *
    * ONE corpus scan serves the whole panel (the [[ndcgAtK]] shared-
    * postings shape): tokenize once behind the union contains() gate,
    * then every per-query layer — df, BM25 scores, ranks, relevance —
    * is type-table work joined through the (qid, term) relation. The
    * per-query numbers are bit-identical to running [[apEval]] per entry
    * (df/tf/dl/avgdl are per-term global facts; sharing the scan cannot
    * change them), which is what keeps the per-query oracle mirrors
    * valid.
    */
  def apEvalPanel(df: DataFrame, idCol: String, textCol: String,
      panel: Seq[(String, Seq[String])], kmax: Int = 100,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(panel.nonEmpty && panel.forall(_._2.nonEmpty),
      "apEvalPanel: empty panel")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val qterms = panel
      .flatMap { case (q, ts) => ts.map(t => (q, t.toLowerCase)) }
      .distinct.toDF("qid", "term")
    val qsize = panel
      .map { case (q, ts) => (q, ts.map(_.toLowerCase).distinct.size) }
      .toDF("qid", "n_terms")
    val allTerms = panel.flatMap(_._2.map(_.toLowerCase)).distinct
    val base = Dedup.parallelize(df).select(col(idCol).as("_ap_id"),
      lower(col(textCol)).as("_txt"),
      size(TextAnalysis.tokens(lower(col(textCol)))).as("dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val gate = allTerms.map(t => contains(col("_txt"), lit(t))).reduce(_ || _)
    // barrier (multi-consumer): postings feed df + the panel score join;
    // without it each consumer re-expands the corpus scan+tokenize+explode
    val postings = base
      .where(gate)
      .select(col("_ap_id"), col("dl"),
        explode(TextAnalysis.tokens(col("_txt"))).as("term"))
      .where(col("term").isin(allTerms: _*))
      .groupBy(col("_ap_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .localCheckpoint()
    val docFreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfw = col("tf").cast("double") * lit(k1 + 1) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    // per-(query, doc): score + matched-term count (postings unique per
    // (doc, term), so count(*) is the distinct-term match count)
    val scores = postings
      .join(broadcast(docFreq), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("qid"), col("_ap_id"))
      .agg(sum(round(idf * tfw, 4).cast("decimal(18,4)")).as("_s"),
        count(lit(1)).as("matched"))
      // barrier: scores feed the relevance set, the ranked window AND the
      // hits join — three consumers over a panel-bounded relation
      .localCheckpoint()
    val rel = scores.join(broadcast(qsize), "qid")
      .where(col("matched") === col("n_terms"))
      .select(col("qid"), col("_ap_id"), lit(1L).as("_rel"))
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_relevant"))
    val ranked = scores
      .withColumn("rk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("_s").cast("double").desc, col("_ap_id"))))
      .where(col("rk") <= kmax)
    val w = Window.partitionBy("qid").orderBy("rk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hits = ranked.join(rel, Seq("qid", "_ap_id"), "left")
      .select(col("qid"), col("rk"),
        when(col("_rel").isNotNull, 1L).otherwise(0L).as("r"))
      .withColumn("cum", sum(col("r")).over(w))
      .select(col("qid"),
        when(col("r") === 1,
          round(col("cum").cast("double") / col("rk").cast("double"), 6)
            .cast("decimal(18,6)")).as("p"),
        when(col("r") === 1, col("rk")).as("rrk"))
    val agg = hits.groupBy("qid")
      .agg(sum(col("p")).as("sp"), min(col("rrk")).as("frk"),
        count(col("p")).as("hits_ranked"))
    // seed with every panel qid: a query with zero index hits must still
    // emit its row (n_relevant 0, ap/mrr NULL) exactly like apEval does
    qsize.select("qid").join(agg, Seq("qid"), "left")
      .withColumn("hits_ranked", coalesce(col("hits_ranked"), lit(0L)))
      .join(broadcast(nRel), Seq("qid"), "left")
      .select(col("qid").as("query"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        col("hits_ranked"),
        when(coalesce(col("n_relevant"), lit(0L)) > 0,
          round(coalesce(col("sp").cast("double"), lit(0.0)) /
            col("n_relevant").cast("double"), 6)).as("ap"),
        when(col("frk").isNotNull,
          round(lit(1.0) / col("frk").cast("double"), 6)).as("mrr"))
      .orderBy("query")
  }

  def precisionAtK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], ks: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0), "precisionAtK: bad k list")
    import org.apache.spark.sql.expressions.Window
    val kmax = ks.max
    val ranked = bm25Rank(df, idCol, textCol, terms, kmax)
      .select(col(idCol),
        row_number().over(Window.orderBy(col("score").desc, col(idCol))).as("rk"))
    val rel = matchAllTerms(df, idCol, textCol, terms)
      .select(col(idCol), lit(1L).as("_rel"))
    val nRel = rel.agg(count(lit(1)).as("n_relevant"))
    // denominator: least(k, ranked rows) — on a small corpus or rare terms
    // the ranked list may hold fewer than k docs; dividing by the fixed k
    // would silently deflate p@k by counting absent slots as misses
    val aggs = ks.map { k =>
      round(sum(when(col("rk") <= k && col("_rel").isNotNull, 1L).otherwise(0L))
        .cast("double") /
        least(lit(k.toDouble), count(lit(1)).cast("double")), 4).as(s"p$k")
    }
    ranked.join(rel, Seq(idCol), "left")
      .agg(aggs.head, aggs.tail: _*)
      .crossJoin(broadcast(nRel))
      .select(col("n_relevant") +: ks.map(k => col(s"p$k")): _*)
  }
}
