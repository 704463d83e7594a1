package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** All-pairs similarity search (APSS) over sparse tf-idf vectors in word
  * n-gram SHINGLE space, with prefix filtering — the exact-cosine
  * near-duplicate complement to the MinHash (estimated Jaccard) and
  * embedding (dense cosine) families: every document pair whose shingle
  * tf-idf cosine reaches a threshold, with the exact similarity, and
  * nothing all-pairs anywhere in the plan.
  *
  * Shingle space is what makes exact APSS tractable on text: in UNIGRAM
  * space a synthetic-vocabulary corpus is near-clique (measured on the
  * sf0.1 fixture: 10.7M candidate pairs for 2.5k true pairs at t=0.9 —
  * every pair shares some "rare" word), while 5-gram shingles are
  * essentially unique to near-duplicate content, so the term-join fan-out
  * collapses to the true near-dup structure (measured: Σ df² = 278k for
  * 250k postings on the same fixture). This mirrors how production
  * near-dup pipelines use exact cosine — over shingles or character
  * n-grams, never bag-of-words.
  *
  * The pruning is Bayardo/Chaudhuri-style prefix filtering re-expressed
  * declaratively (Bayardo, Ma, Srikant, "Scaling Up All Pairs Similarity
  * Search", WWW'07):
  *
  *   1. one corpus scan → (doc, shingle, tf); tf-idf weights; L2-normalize
  *      per doc (doc-keyed agg joined back — no window over the corpus);
  *   2. order each doc's shingles by a GLOBAL rare-first order (df asc,
  *      term asc) and keep the PREFIX: positions whose reverse-cumulative
  *      squared mass still reaches t'² (t' = t − ε, the float-safety
  *      margin). If x and y share no prefix term then, taking wlog the doc
  *      whose last prefix rank is smaller, every shared term lies in its
  *      pruned suffix, so cos(x,y) ≤ ‖suffix‖ < t' — prefix-prefix joining
  *      is SOUND under a shared global order;
  *   3. candidates = prefix ⋈ prefix on term (rare-first ordering makes
  *      prefix terms exactly the low-df ones, so the per-term join fan-out
  *      is small by construction), dedup (a,b);
  *   4. verify candidates only: join both full posting lists, sum the
  *      products, keep round(sim,4) ≥ t.
  *
  * Scale shape: two corpus-sized shuffles (tf agg, doc-keyed norm), a
  * term-keyed candidate join whose fan-out the prefix bounds, and a
  * pair-keyed verify join proportional to CANDIDATES, not pairs². The
  * per-doc prefix window partitions by doc_id (bounded by document length,
  * never corpus-sized). The reference engine has no similarity operator at
  * all (`server/lib/eval.go` is boolean filtering) — this is beyond-parity
  * pipeline surface.
  */
object Apss {

  /** Normalized tf-idf shingle postings with the prefix marker, in THREE
    * shuffles and zero joins: (id, term, wn, in_prefix).
    *
    *   - shuffle 1: tf aggregation on (id, term);
    *   - shuffle 2: df via a whole-partition count window over term;
    *   - shuffle 3: ONE doc-partitioned window, sorted once by the global
    *     rare-first order (df asc, term asc), serving BOTH frames — the
    *     whole-doc Σw² (the L2 norm) and the reverse-cumulative Σw² (the
    *     prefix bound). The prefix test compares raw sums
    *     (rev ≥ t'²·ss ⇔ rev/ss ≥ t'²), so normalization needs no join.
    *
    * Terms are 60-bit md5 digests (the Decontam discipline): fixed-width
    * long keys in every shuffle instead of ~40-byte shingle strings;
    * tf/df/weights are digest-invariant, so the brute string-space oracle
    * matches (collision odds ~n²/2^60).
    */
  private def postings(df: DataFrame, idCol: String, textCol: String,
      ngram: Int, t2: Double): DataFrame = {
    val exploded = Dedup.parallelize(df).select(
      col(idCol).as("id"),
      explode(graft.functions.MinHashExpr.shinglesArray(
        lower(col(textCol)), ngram)).as("gram"))
      .select(col("id"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("term"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    val tf = exploded.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val withDf = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(total))
      .withColumn("w",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
    val byDoc = Window.partitionBy("id").orderBy(col("df").asc, col("term").asc)
    withDf
      .withColumn("ss", sum(col("w") * col("w")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rev", sum(col("w") * col("w")).over(
        byDoc.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .where(col("ss") > 0)
      .select(col("id"), col("term"),
        (col("w") / sqrt(col("ss"))).as("wn"),
        (col("rev") >= lit(t2) * col("ss")).as("in_prefix"))
  }

  /** Exact shingle tf-idf cosine pairs ≥ `threshold`: (id_a, id_b, sim),
    * with id_a < id_b.
    */
  def tfidfPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 5): DataFrame = {
    // ε-margin: the prefix bound prunes only pairs provably < t' — a pair
    // whose true sim sits within float noise of t survives to the exact
    // verify step instead of being dropped by an ulp-crossed norm
    val tSafe = threshold - 1e-6
    val t2 = tSafe * tSafe
    // materialized ONCE: the prefix, probe and index sides below would
    // otherwise re-derive the 3-shuffle pipeline
    val post = postings(df, idCol, textCol, ngram, t2).localCheckpoint()
    val prefix = post.where(col("in_prefix")).select(col("id"), col("term"))
    val cands = prefix.select(col("id").as("id_a"), col("term"))
      .join(prefix.select(col("id").as("id_b"), col("term")), "term")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val fa = post.select(col("id").as("id_a"), col("term").as("term_a"),
      col("wn").as("wa"))
    val fb = post.select(col("id").as("_ap_idb"), col("term").as("term_b"),
      col("wn").as("wb"))
    // no join-strategy hints here: the candidate relation's size is the
    // near-dup structure of the corpus — AQE picks broadcast when it's
    // small (the common case) and falls back to shuffle when it isn't
    cands
      .join(fa, "id_a")
      .join(fb,
        col("id_b") === col("_ap_idb") && col("term_a") === col("term_b"))
      .groupBy("id_a", "id_b")
      .agg(round(sum(col("wa") * col("wb")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Brute all-pairs mirror (term join, no prefix) — spec only. */
  def tfidfPairsBrute(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 5): DataFrame = {
    val post = postings(df, idCol, textCol, ngram, t2 = 0.0)
    val a = post.select(col("id").as("id_a"), col("term"), col("wn").as("wa"))
    val b = post.select(col("id").as("id_b"), col("term"), col("wn").as("wb"))
    a.join(b, "term").where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(round(sum(col("wa") * col("wb")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** DuckDB mirror of [[tfidfPairs]] — the brute term-join form; the prefix
    * filter is exact-pruning-only, so the filtered and brute results are
    * the same relation. Shingle construction mirrors [[Dedup.shingles]]
    * (short docs contribute their whole text as one gram).
    */
  def tfidfPairsSql(table: String, idCol: String, textCol: String,
      threshold: Double, ngram: Int = 5): String = {
    val n = ngram
    val parts = (0 until n).map(k => s"ws[i+$k]").mkString("||' '||")
    s"""WITH toks AS (SELECT $idCol AS id,
           string_split_regex(trim(lower($textCol)), '\\s+') AS ws FROM $table),
       sh AS (SELECT id, CASE WHEN len(ws) >= $n
               THEN list_transform(range(1, len(ws)-${n - 2}), i -> $parts)
               ELSE [array_to_string(ws, ' ')] END AS sh FROM toks),
       tf AS (SELECT id, term, COUNT(*) AS tf
              FROM (SELECT id, unnest(sh) AS term FROM sh) GROUP BY 1, 2),
       dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
       total AS (SELECT COUNT(*) AS n_docs FROM $table),
       w AS (SELECT id, term, tf * ln(CAST(n_docs AS DOUBLE) / df) AS w
             FROM tf JOIN dfreq USING (term) CROSS JOIN total),
       nrm AS (SELECT id, SUM(w*w) AS ss FROM w GROUP BY id),
       p AS (SELECT w.id, term, w / sqrt(ss) AS wn
             FROM w JOIN nrm USING (id) WHERE ss > 0)
       SELECT a.id AS id_a, b.id AS id_b, round(SUM(a.wn * b.wn), 4) AS sim
       FROM p a JOIN p b ON a.term = b.term AND a.id < b.id
       GROUP BY 1, 2 HAVING round(SUM(a.wn * b.wn), 4) >= $threshold
       ORDER BY id_a, id_b"""
  }
}
