package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language identification, and content
  * fingerprinting. All pure Column expressions (whole-stage codegen, no UDFs)
  * so they scan-scale linearly; each has an exactly-mirrorable DuckDB SQL
  * form used by the correctness oracle.
  */
object TextAnalysis {

  /** whitespace tokenization — matches `string_split_regex(trim(x),'\s+')` */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** long-typed to match DuckDB's BIGINT `len()` in the oracle */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** punctuation character count (long, ≡ DuckDB length arithmetic) */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.!?,;:]", ""))).cast("long")

  /** GPT-2-style pre-tokenization pieces: letter runs, single digits,
    * single other-glyphs. ASCII classes only (identical in Java regex and
    * DuckDB's RE2; `\s` differs between the engines, so whitespace is
    * spelled out). */
  private val bpePiecesRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r\\f]"

  /** BPE-ish token count estimate: each letter run of length L costs
    * ceil(L/4) subword pieces (the ~4-chars-per-token heuristic real BPE
    * vocabularies average on English text), digits and symbols cost 1.
    * Oracle mirror: `list_sum(list_transform(regexp_extract_all(...)))`.
    * One regex pass + one fold — scan-parallel, no shuffle.
    */
  def bpeTokenEstimate(text: Column): Column =
    coalesce(
      aggregate(
        regexp_extract_all(text, lit(bpePiecesRe), lit(0)),
        lit(0L),
        (acc, w) => acc + floor((length(w) + lit(3)) / lit(4.0)).cast("long")
      ),
      lit(0L))

  /** Simple quality signals: chars, tokens, avg word length, punctuation
    * ratio, and a composite score in [0,1]. The formula is arbitrary but
    * deterministic and identical in the SQL oracle.
    */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokenCount(t)
    val chars = length(t)
    val punct = punctCount(t)
    df.withColumn("n_tokens", toks)
      .withColumn("n_chars_m", chars)
      .withColumn("punct_ratio", round(punct.cast("double") / greatest(chars, lit(1)), 6))
      .withColumn("avg_word_len", round(chars.cast("double") / greatest(toks, lit(1)), 6))
      .withColumn(
        "quality_score",
        round(
          least(toks.cast("double") / lit(50.0), lit(1.0)) *
            (lit(1.0) - least(punct.cast("double") / greatest(chars, lit(1)), lit(1.0))),
          6
        )
      )
  }

  private val langMarkers: List[(String, Seq[String])] = List(
    "en" -> Seq("the", "and", "of", "a", "in"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "fr" -> Seq("le", "les", "des", "et", "une")
  )

  /** Marker-word language ID: counts stop-word hits per language over
    * space-split tokens, picks the max with fixed priority en>de>es>fr.
    * (An n-gram model would need training data; marker words are the
    * deterministic, oracle-mirrorable heuristic.)
    */
  def langId(text: Column): Column = {
    val ws = split(text, " ")
    val counts = langMarkers.map { case (lang, words) =>
      lang -> size(filter(ws, w => w.isInCollection(words)))
    }
    val Seq(en, de, es, fr) = counts.map(_._2)
    when(en >= de && en >= es && en >= fr && en > 0, "en")
      .when(de >= es && de >= fr && de > 0, "de")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("unknown")
  }

  /** DuckDB SQL fragment computing the same langId for column `c`. */
  def langIdSql(c: String): String = {
    def cnt(words: Seq[String]) =
      s"len(list_filter(string_split($c, ' '), w -> w IN (${words.map(w => s"'$w'").mkString(",")})))"
    val en = cnt(langMarkers(0)._2); val de = cnt(langMarkers(1)._2)
    val es = cnt(langMarkers(2)._2); val fr = cnt(langMarkers(3)._2)
    s"""CASE WHEN $en >= $de AND $en >= $es AND $en >= $fr AND $en > 0 THEN 'en'
        WHEN $de >= $es AND $de >= $fr AND $de > 0 THEN 'de'
        WHEN $es >= $fr AND $es > 0 THEN 'es'
        WHEN $fr > 0 THEN 'fr' ELSE 'unknown' END"""
  }

  /** PII scrubbing for training corpora: emails, then phone-like digit runs,
    * replaced with typed placeholder tokens. ASCII-only patterns (no `\s`/
    * `\b`, no lookaround) evaluate identically in Java regex and DuckDB's
    * RE2, so the oracle reproduces the scrub byte-for-byte. Each pass is one
    * codegen'd regexp over the row — scan-parallel, no shuffle. Phones are
    * counted/scrubbed AFTER the email pass so digits inside an address are
    * never double-counted.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9 -]{6,}[0-9]"

  def scrubEmails(text: Column): Column = regexp_replace(text, emailRe, "<EMAIL>")
  def scrubPhones(text: Column): Column = regexp_replace(text, phoneRe, "<PHONE>")
  def scrubPii(text: Column): Column = scrubPhones(scrubEmails(text))

  /** matches of `re` in `text`, long-typed (≡ DuckDB `len(regexp_extract_all)`) */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Within-document repetition signals (the Gopher/MassiveText-style rules
    * a quality gate thresholds on): the fraction of token 3-grams that are
    * repeats of an earlier 3-gram in the same document, and the share of all
    * tokens taken by the single most frequent token.
    *
    * Shape: relational, not per-row array HOFs — each signal is one explode
    * followed by two hash-partitioned aggregations with map-side partials
    * (multiplicities at (doc, item), then per-doc totals), joined on doc id.
    * A first cut computed `transform(distinct, t -> size(filter(toks, _ ===
    * t)))` per row; nested lambda HOFs are CodegenFallback and it benched
    * 22 s at sf0.1 vs ~1 s for this plan — the minhash/winnow lesson again:
    * per-row quadratic lambda work doesn't codegen and doesn't scale.
    */
  def repetitionStats(df0: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val id = col(idCol)
    // explode-heavy scans get the Dedup.parallelize min-parallelism guard
    // (single-row-group test inputs otherwise run the CPU stage on 1 task)
    val df = Dedup.parallelize(df0)
    val gramTf = df
      .select(id,
        explode(graft.functions.MinHashExpr.shinglesArray(lower(col(textCol)), n)).as("gram"))
      .groupBy(id, col("gram")).agg(count(lit(1)).as("c"))
    val gramStats = gramTf.groupBy(id).agg(
      sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"))
    val tokTf = df
      .select(id, explode(tokens(lower(col(textCol)))).as("tok"))
      .groupBy(id, col("tok")).agg(count(lit(1)).as("c"))
    val tokStats = tokTf.groupBy(id).agg(
      max(col("c")).as("max_tok"), sum(col("c")).as("n_toks"))
    gramStats.join(tokStats, idCol).select(
      id,
      round((col("n_grams") - col("n_distinct")).cast("double") /
        greatest(col("n_grams"), lit(1)), 6).as("dup_ngram_frac"),
      round(col("max_tok").cast("double") /
        greatest(col("n_toks"), lit(1)), 6).as("top_token_frac"))
  }

  /** Vocabulary pruning with OOV remapping: tokens occurring fewer than
    * `minCount` times across the corpus become `<unk>`, and each document is
    * reassembled in original token order — the vocab-build + out-of-vocab
    * step ahead of tokenizer training.
    *
    * Plan shape at 100 TB: the kept vocabulary is a hash-partitioned
    * aggregate (map-side partials) that is then BROADCAST to the remap join
    * (a real vocabulary is ~10^5-10^6 terms — broadcast-sized by
    * construction, no shuffle of the corpus on the join key); reassembly
    * shuffles once by doc id and restores order via the carried position
    * (sort_array over (pos, token) structs — no assumption that
    * collect_list preserves arrival order).
    */
  def pruneVocab(df: DataFrame, idCol: String, textCol: String,
      minCount: Long, unk: String = "<unk>"): DataFrame = {
    val id = col(idCol)
    val toks = Dedup.parallelize(df)
      .select(id, posexplode(tokens(lower(col(textCol)))).as(Seq("pos", "tok")))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .select(col("tok").as("_vt"))
    toks
      .join(broadcast(vocab), toks("tok") === col("_vt"), "left")
      .select(id, col("pos"),
        when(col("_vt").isNotNull, col("tok")).otherwise(lit(unk)).as("tok2"))
      .groupBy(id)
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok2")))),
            x => x.getField("tok2"))).as("pruned_text"),
        sum(when(col("tok2") === unk, 1L).otherwise(0L)).as("n_unk"))
  }

  /** Unigram language-model surprise score — the cheap perplexity proxy a
    * quality gate thresholds on (rare-word-heavy garbage scores high, stock
    * boilerplate scores low). The "model" is the corpus itself: token
    * negative log-probability −ln(cnt(t)/T) under the corpus unigram
    * distribution, averaged per document.
    *
    * Cross-engine exactness: ln is libm-dependent in the last ulp, so each
    * per-TERM nll is rounded to 4 decimals FIRST and cast to
    * DECIMAL(18,4) — the per-document sum is then EXACT (decimal
    * arithmetic, no float summation-order dependence; the k-means
    * DECIMAL-mean trick applied to log-probs). The final average divides
    * once in double: the decimal→double cast and the IEEE division are
    * both correctly rounded, so the result is bit-identical across
    * engines WITHOUT a final round — a round(4) here landed on exact
    * decimal halves (sum/n terminates at 5 in the 5th place whenever
    * n | 10·10^4·sum) where Spark (binary-expansion HALF_UP) and DuckDB
    * (scale-multiply-then-nearbyint) disagree by one ulp of the last
    * kept digit.
    *
    * Plan shape at 100 TB: one explode → hash-partitioned (doc, term) tf
    * agg with map-side partials → term totals derived from the tf relation
    * (no second corpus scan) — the unigram table is vocabulary-sized, so
    * it BROADCASTS to the per-doc join; corpus token total rides along as
    * a broadcast one-row cross join. Nothing reaches the driver.
    */
  def unigramLogprob(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val tf = Dedup.parallelize(df)
      .select(id, explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(id, col("term")).agg(count(lit(1)).as("tf"))
    val freq = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val total = freq.agg(sum("cnt").as("t_total"))
    val nll = round(log(col("t_total").cast("double") / col("cnt").cast("double")), 4)
      .cast("decimal(18,4)")
    tf.join(broadcast(freq), "term")
      .crossJoin(broadcast(total))
      .groupBy(id)
      .agg(
        sum(col("tf")).as("n_toks"),
        sum(col("tf").cast("decimal(18,4)") * nll).as("_ul_sum"))
      .select(id, col("n_toks"),
        (col("_ul_sum").cast("double") / col("n_toks").cast("double")).as("avg_nll"))
  }

  /** HELD-OUT unigram perplexity — the methodologically honest version of
    * [[unigramLogprob]]: counts come from the id % trainMod != 0 TRAIN
    * split only (add-1 smoothing over the train vocabulary, out-of-vocab
    * terms priced at the unseen mass 1/(N+V+1)), and only HELD-OUT docs
    * are scored. A model scored on the corpus it was fit on
    * under-reports perplexity by exactly the memorized mass — this split
    * is what a CCNet-style quality gate should actually deploy.
    *
    * Same exactness discipline as [[unigramLogprob]]: per-term nll rounds
    * to 4 then accumulates as DECIMAL; OOV terms fold through the same
    * rounded constant. Plan: train counts fold to the type table, held-out
    * occurrences LEFT-join it on term (coalesce to the OOV price), one
    * broadcast scalar for (N, V).
    */
  def heldoutPpl(df: DataFrame, idCol: String, textCol: String,
      trainMod: Int = 5): DataFrame = {
    val id = col(idCol)
    val tf = Dedup.parallelize(df)
      .select(id, explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(id, col("term")).agg(count(lit(1)).as("tf"))
    val freq = tf.where(id % trainMod =!= 0)
      .groupBy("term").agg(sum("tf").as("cnt"))
    val scal = freq.agg(sum(col("cnt")).as("n_train"),
      count(lit(1)).as("v_size"))
    val denom = (col("n_train") + col("v_size") + lit(1)).cast("double")
    val nll = round(log(denom /
      (coalesce(col("cnt"), lit(0L)).cast("double") + lit(1.0))), 4)
      .cast("decimal(18,4)")
    tf.where(id % trainMod === 0)
      .join(broadcast(freq), Seq("term"), "left")
      .crossJoin(broadcast(scal))
      .groupBy(id)
      .agg(
        sum(col("tf")).as("n_toks"),
        sum(col("tf").cast("decimal(18,4)") * nll).as("_hp_sum"))
      .select(id, col("n_toks"),
        (col("_hp_sum").cast("double") / col("n_toks").cast("double")).as("avg_nll"))
  }

  /** DuckDB mirror of [[heldoutPpl]]. */
  def heldoutPplSql(tbl: String, idCol: String, textCol: String,
      trainMod: Int = 5): String =
    s"""WITH t AS (SELECT $idCol, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
           FROM $tbl),
       tf AS (SELECT $idCol, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       fr AS (SELECT term, SUM(tf) AS cnt FROM tf WHERE $idCol % $trainMod <> 0 GROUP BY term),
       sc AS (SELECT SUM(cnt) AS n_train, COUNT(*) AS v_size FROM fr),
       j AS (SELECT tf.$idCol, tf.tf,
             CAST(round(ln(CAST(n_train + v_size + 1 AS DOUBLE)
               / (CAST(COALESCE(fr.cnt, 0) AS DOUBLE) + 1.0)), 4)
               AS DECIMAL(18,4)) AS nll
             FROM tf LEFT JOIN fr USING (term) CROSS JOIN sc
             WHERE tf.$idCol % $trainMod = 0)
       SELECT $idCol, CAST(SUM(tf) AS BIGINT) AS n_toks,
         CAST(SUM(CAST(tf AS DECIMAL(18,4)) * nll) AS DOUBLE)
           / CAST(SUM(tf) AS DOUBLE) AS avg_nll
       FROM j GROUP BY $idCol ORDER BY $idCol"""

  /** Bigram-LM negative log-likelihood per document — the CCNet-style
    * (Wenzek et al. 2020) perplexity quality filter one rung up from
    * [[unigramLogprob]]: fluent text reuses common word PAIRS, so word-salad
    * that sneaks past a unigram gate (common words, scrambled order) scores
    * high here. Laplace-smoothed conditional
    * `p(w2|w1) = (c(w1 w2)+1) / (c(w1·)+V)` where `c(w1·)` is w1's
    * left-context total — derived FROM the bigram relation (Σ over w2), no
    * second corpus pass — and V the continuation-vocabulary size. Per-bigram
    * nll rounds to 4 decimals then accumulates as DECIMAL (exact,
    * order-independent — see [[unigramLogprob]] for why no final round);
    * the average divides once in double. Documents with <2 tokens have no
    * bigrams and are absent from the output.
    *
    * Plan shape at 100 TB: ONE one-pass shingle scan feeds everything; pair
    * totals and context totals are successive aggregations of that relation.
    * The statistics FOLD INTO THE TYPE TABLE before touching the doc-sized
    * relation: c1 (and the vocab scalar) join onto `c2` — bigram-type-sized
    * relations, orders of magnitude under the doc×bigram relation — and the
    * per-pair nll is computed THERE, so the occurrence stream joins exactly
    * once, on `bg`, against a (bg, nll) table. Joining c1 onto it would
    * re-shuffle the doc-sized relation on `w1`, a power-law key ("the"
    * contexts) that skews superlinearly with corpus size; `bg` keys are the
    * near-uniform ones. The type table is NOT broadcast: at scale it is
    * vocabulary²-sized, so the shuffled hash join on `bg` is the honest
    * shape; only the scalar vocabulary size broadcasts.
    */
  def bigramLogprob(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    // per-OCCURRENCE stream, not a per-(doc, bigram) tf table: the tf
    // pre-aggregation would shuffle AND sort the doc-sized relation once
    // more for at best a ~10% row reduction (most bigrams occur once per
    // doc); summing the per-type nll once per occurrence is decimal-exact
    // equal to tf·nll
    val raw = Dedup.parallelize(df)
      .select(id,
        explode(graft.functions.MinHashExpr.shinglesArray(lower(col(textCol)), 2)).as("bg"))
      // a <2-token document yields its whole-token-string "gram" (no space):
      // not a bigram, dropped — exactly the oracle's empty range(1, len)
      .where(instr(col("bg"), " ") > 0)
    val c2 = raw.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c2").as("c1"))
    // NOT a global count_distinct: that plan funnels every distinct
    // continuation word through ONE final reducer (the partial phase only
    // dedups per-partition). distinct-then-count dedups in a parallel
    // shuffle and the single reducer sums one Long per partition.
    val vocab = c2.select(substring_index(col("bg"), " ", -1).as("_w2"))
      .distinct().agg(count(lit(1)).as("v_size"))
    val nll = round(
      log((col("c1").cast("double") + col("v_size").cast("double")) /
        (col("c2").cast("double") + lit(1.0))), 4)
      .cast("decimal(18,4)")
    val perBg = c2
      .join(c1, substring_index(col("bg"), " ", 1) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("bg"), nll.as("_bl_nll"))
    // SHUFFLE_HASH on the type-sized side: SMJ would SORT the corpus-sized
    // occurrence stream just to probe a per-partition type table
    raw.join(perBg.hint("shuffle_hash"), "bg")
      .groupBy(id)
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("_bl_nll")).as("_bl_sum"))
      .select(id, col("n_bigrams"),
        (col("_bl_sum").cast("double") / col("n_bigrams").cast("double")).as("avg_nll"))
  }

  /** Jelinek–Mercer interpolated bigram scoring (Jelinek & Mercer 1980):
    * `p(w2|w1) = λ·c12/c1 + (1−λ)·c·2(w2)/T` — the linear-interpolation
    * rung of the smoothing ladder between Laplace ([[bigramLogprob]]) and
    * Kneser–Ney ([[knLogprob]]); the unigram leg uses the CONTINUATION
    * count (occurrences of w2 as a second token over total bigram
    * occurrences), so the two legs share one normalization universe.
    *
    * Same relational discipline as [[bigramLogprob]]: every statistic
    * (c12, c1, c·2, T) folds into the bigram TYPE table by aggregation —
    * the w1/w2 joins hit type-sized relations (shuffle-hash, power-law
    * keys never touch the doc-sized stream) — and the doc×bigram
    * occurrence stream joins exactly ONCE on `bg`. Per-type nll rounds to
    * 4 then DECIMAL-sums per doc.
    */
  def jmLogprob(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.7): DataFrame = {
    require(lambda > 0 && lambda < 1, "jmLogprob: need 0 < lambda < 1")
    val id = col(idCol)
    val raw = Dedup.parallelize(df)
      .select(id,
        explode(graft.functions.MinHashExpr.shinglesArray(lower(col(textCol)), 2)).as("bg"))
      .where(instr(col("bg"), " ") > 0)
    val c2 = raw.groupBy("bg").agg(count(lit(1)).as("c12"))
    val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c12").as("c1"))
    val cw2 = c2.groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(sum("c12").as("cdot2"))
    val t = c2.agg(sum("c12").as("t_tot"))
    val nll = round(
      lit(-1.0) * log(
        lit(lambda) * col("c12").cast("double") / col("c1").cast("double") +
        lit(1 - lambda) * col("cdot2").cast("double") / col("t_tot").cast("double")),
      4).cast("decimal(18,4)")
    val perBg = c2
      .join(c1.hint("shuffle_hash"), substring_index(col("bg"), " ", 1) === col("w1"))
      .join(cw2.hint("shuffle_hash"), substring_index(col("bg"), " ", -1) === col("w2"))
      .crossJoin(broadcast(t))
      .select(col("bg"), nll.as("_jm_nll"))
    raw.join(perBg.hint("shuffle_hash"), "bg")
      .groupBy(id)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_jm_nll")).as("_jm_sum"))
      .select(id, col("n_bigrams"),
        (col("_jm_sum").cast("double") / col("n_bigrams").cast("double")).as("avg_nll"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing every serious n-gram LM ships): absolute discount D off
    * every seen bigram count, redistributed through the CONTINUATION
    * probability — `p(w2|w1) = (max(c12−D,0) + D·N1+(w1·)·pcont(w2)) / c1`
    * with `pcont(w2) = |{w1 : c12>0}| / |bigram types|` — so rare contexts
    * back off to how many contexts a word follows, not how often it
    * occurs (the "san francisco" effect: "francisco" is frequent but
    * follows one context).
    *
    * Relational shape mirrors [[bigramLogprob]]: every statistic (c12, c1,
    * N1+, continuation fan-in, type count) derives from the ONE bigram
    * relation by aggregation, and all of them fold into the bigram-TYPE
    * table (w1/w2 joins hit type-sized relations, never the doc-sized one —
    * those keys are power-law-skewed) so the doc×bigram relation joins
    * exactly once, on `bg`, against (bg, nll). The per-pair nll is rounded
    * to 4 then accumulated DECIMAL-exact per doc. In-corpus docs always
    * have c12 ≥ 1, so no zero-probability path exists.
    */
  def knLogprob(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    val id = col(idCol)
    // per-occurrence stream — see [[bigramLogprob]] for why no tf pre-agg
    val raw = Dedup.parallelize(df)
      .select(id,
        explode(graft.functions.MinHashExpr.shinglesArray(lower(col(textCol)), 2)).as("bg"))
      .where(instr(col("bg"), " ") > 0)
    val c12 = raw.groupBy("bg").agg(count(lit(1)).as("c12"))
    val byW1 = c12.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1p"))
    val byW2 = c12.groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("n_hist"))
    val types = c12.agg(count(lit(1)).as("n_types"))
    val d = lit(discount)
    val p = (greatest(col("c12").cast("double") - d, lit(0.0)) +
      d * col("n1p").cast("double") *
        (col("n_hist").cast("double") / col("n_types").cast("double"))) /
      col("c1").cast("double")
    val nll = round(-log(p), 4).cast("decimal(18,4)")
    val perBg = c12
      .join(byW1.hint("shuffle_hash"), substring_index(col("bg"), " ", 1) === col("w1"))
      .join(byW2.hint("shuffle_hash"), substring_index(col("bg"), " ", -1) === col("w2"))
      .crossJoin(broadcast(types))
      .select(col("bg"), nll.as("_kn_nll"))
    raw.join(perBg.hint("shuffle_hash"), "bg")
      .groupBy(id)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("_kn_nll")).as("_kn_sum"))
      .select(id, col("n_bigrams"),
        (col("_kn_sum").cast("double") / col("n_bigrams").cast("double")).as("avg_nll"))
  }

  /** DuckDB mirror of [[knLogprob]] — same discount interpolated, same
    * parenthesization and cast points. */
  def knLogprobSql(table: String, idCol: String, textCol: String,
      discount: Double = 0.75): String =
    s"""WITH w AS (SELECT $idCol, string_split_regex(trim(lower($textCol)),'\\s+') AS ws FROM $table),
       b AS (SELECT $idCol, unnest(list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1])) AS bg FROM w),
       tf AS (SELECT $idCol, bg, COUNT(*) AS tf FROM b GROUP BY $idCol, bg),
       c2 AS (SELECT bg, SUM(tf) AS c12 FROM tf GROUP BY bg),
       w1s AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c12) AS c1, COUNT(*) AS n1p FROM c2 GROUP BY 1),
       w2s AS (SELECT split_part(bg, ' ', 2) AS w2, COUNT(*) AS n_hist FROM c2 GROUP BY 1),
       ty AS (SELECT COUNT(*) AS n_types FROM c2),
       j AS (SELECT tf.$idCol, tf.tf,
             CAST(round(-ln(
               (greatest(CAST(c12 AS DOUBLE) - $discount, 0.0)
                 + $discount * CAST(n1p AS DOUBLE)
                   * (CAST(n_hist AS DOUBLE) / CAST(n_types AS DOUBLE)))
               / CAST(c1 AS DOUBLE)), 4) AS DECIMAL(18,4)) AS nll
             FROM tf JOIN c2 USING (bg)
             JOIN w1s ON split_part(tf.bg, ' ', 1) = w1s.w1
             JOIN w2s ON split_part(tf.bg, ' ', 2) = w2s.w2
             CROSS JOIN ty)
       SELECT $idCol, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
         CAST(SUM(CAST(tf AS DECIMAL(18,4)) * nll) AS DOUBLE)
           / CAST(SUM(tf) AS DOUBLE) AS avg_nll
       FROM j GROUP BY $idCol ORDER BY $idCol"""

  /** Per-document token Shannon entropy, `H = ln(n) − (Σ tf·ln tf)/n` —
    * the repetition/diversity signal (a doc of one repeated token has
    * H = 0; uniform tokens maximize it). One explode → one tf aggregation;
    * `tf·ln tf` rounds to 4 and accumulates DECIMAL-exact so the sum is
    * order-free, then the closed form applies once per doc.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    // row-local bag stats ([[graft.functions.TokenEntropyStatsExpr]],
    // equality-pinned by EntropyStatsSpec): the former exploded (doc,
    // token) relation + per-(doc, token) count shuffled the whole corpus
    // into an aggregate whose key cardinality ≈ its row count; only one
    // (n_tokens, Σ round(tf·ln tf, 4)) struct per doc is needed.
    // `isNotNull` reproduces the explode semantics (a NULL text
    // contributed no rows, any other text splits to >= 1 token) AND keeps
    // the expression single-eval — a `_te.n > 0` post-filter was pushed
    // below the projection by the optimizer, evaluating the bag fold twice
    // per row (the guide's duplicated-expensive-expression trap)
    val st = Dedup.parallelize(df.where(col(textCol).isNotNull))
      .select(id,
        graft.functions.EntropyStatsExpr.tokenEntropyStats(col(textCol)).as("_te"))
    st.select(id, col("_te.n").as("n_tokens"),
      // clamp: the rounded-4 tf·ln(tf) terms can overshoot ln(n)·n by an
      // epsilon on degenerate (single-token) docs; entropy is ≥ 0
      greatest(lit(0.0),
        log(col("_te.n").cast("double")) -
          col("_te.s").cast("double") / col("_te.n").cast("double")).as("entropy"))
  }

  /** DuckDB mirror of [[tokenEntropy]]. */
  def tokenEntropySql(table: String, idCol: String, textCol: String): String =
    s"""WITH tf AS (SELECT $idCol, t, COUNT(*) AS tf FROM (
           SELECT $idCol, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS t FROM $table)
         GROUP BY $idCol, t)
       SELECT $idCol, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         greatest(0.0, ln(CAST(SUM(tf) AS DOUBLE))
           - CAST(SUM(CAST(round(CAST(tf AS DOUBLE) * ln(CAST(tf AS DOUBLE)), 4) AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(SUM(tf) AS DOUBLE)) AS entropy
       FROM tf GROUP BY $idCol ORDER BY $idCol"""

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * Cross-engine stable (md5 in both Spark and DuckDB); the first 16 hex
    * chars serve as a 64-bit fingerprint.
    */
  def fingerprint(text: Column): Column =
    substring(md5(regexp_replace(lower(trim(text)), "\\s+", " ")), 1, 16)

  /** Bag fingerprint: md5 over the sorted distinct token multiset — equal for
    * word-order permutations (near-dup signal).
    */
  def bagFingerprint(text: Column): Column =
    substring(md5(concat_ws(" ", array_sort(array_distinct(tokens(lower(text)))))), 1, 16)

  /** Winnowed ROLLING-HASH document fingerprints (Schleimer, Wilkerson,
    * Aiken: "Winnowing: Local Algorithms for Document Fingerprinting" — the
    * MOSS scheme): a polynomial rolling hash over token k-grams, then the
    * MINIMUM of each sliding window of `w` hashes, distinct-ed. Any shared
    * run of ≥ w+k-1 tokens between two documents is guaranteed to share a
    * fingerprint — substring-level (local) similarity, where MinHash only
    * sees whole-document (global) overlap.
    *
    * Cross-engine exact: token base hashes are the first 15 md5 hex chars
    * (< 2^60) mod 1e9+7, the k-step fold takes `% M` after every multiply
    * (so every intermediate stays < 2^37), and window minima mirror DuckDB
    * list slicing. Evaluated by the one-pass
    * [[graft.functions.WinnowFingerprintsExpr]] — the Column-HOF reference
    * form below re-inlines the k-gram array into every window lambda
    * (O(n²) interpreted evaluation) and exists only as the pinned
    * equivalence/oracle mirror.
    */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    graft.functions.WinnowExpr.fingerprints(text, k, w)

  /** Pairwise winnow-fingerprint overlap — the MOSS match step: document
    * pairs sharing at least `minShared` winnowed fingerprints, with the
    * shared count (substring-level plagiarism/near-dup evidence, where
    * MinHash-Jaccard only sees whole-document overlap).
    *
    * Scale design: candidates come from an equi-join on the fingerprint
    * value — never all-pairs — and fingerprints appearing in more than
    * `maxDf` documents are dropped FIRST (the standard MOSS index cap:
    * a ubiquitous fingerprint is boilerplate, carries no match signal,
    * and is exactly the hot key that would turn the self-join quadratic).
    * Per-fingerprint pair fan-out is therefore ≤ maxDf², and the df gate
    * is itself one hash aggregation over the fingerprint relation.
    */
  def winnowOverlap(df: DataFrame, idCol: String, textCol: String,
      minShared: Int = 3, maxDf: Int = 20): DataFrame = {
    // Round-12 reshape (guide §2.4): keying the fingerprint relation ONCE
    // (repartition on fp) makes the df-gate aggregate, the gate join, and
    // both sides of the pair self-join consume the SAME exchange — the
    // former plan shuffled the (doc, fp) relation twice (partial-count
    // shuffle for `rare`, full-row shuffle for the gate join; different
    // subtrees, so nothing was reusable) and ran the winnowing scan — the
    // rolling-hash CPU stage — twice with it. The df-gate itself is
    // unchanged (count-then-filter, no per-key row buffering, so a hot
    // boilerplate fingerprint still costs one counter, not a collected
    // list).
    val fp = Dedup.parallelize(df)
      .select(col(idCol), explode(winnowFingerprints(col(textCol))).as("fp"))
      .repartition(col("fp"))
    val rare = fp.groupBy("fp")
      .agg(count(lit(1)).as("_wo_df"))
      .where(col("_wo_df") <= maxDf)
      .select(col("fp"))
    val gated = fp.join(rare, "fp")
    gated.select(col(idCol).as("id_a"), col("fp"))
      .join(gated.select(col(idCol).as("id_b"), col("fp")), "fp")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .orderBy("id_a", "id_b")
  }

  /** DuckDB mirror of [[winnowOverlap]] (composes the text_winnow
    * fingerprint CTE with the df gate + pair join).
    */
  def winnowOverlapSql(table: String, idCol: String, textCol: String,
      minShared: Int = 3, maxDf: Int = 20): String =
    s"""WITH t AS (SELECT $idCol,
           list_transform(string_split_regex(trim(lower($textCol)), '\\s+'),
             tok -> CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 1000000007) AS th
           FROM $table WHERE $textCol IS NOT NULL),
         g AS (SELECT $idCol,
           list_transform(range(1, greatest(len(th) - 2, 1) + 1), i ->
             (((COALESCE(th[i], 0) * 131 + COALESCE(th[i+1], 0)) % 1000000007)
               * 131 + COALESCE(th[i+2], 0)) % 1000000007) AS kg
           FROM t),
         f AS (SELECT $idCol, list_distinct(
             list_transform(range(1, greatest(len(kg) - 3, 1) + 1),
               j -> list_min(kg[j:j+3]))) AS fps
           FROM g),
         fp AS (SELECT $idCol, unnest(fps) AS fp FROM f),
         rare AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= $maxDf),
         gated AS (SELECT $idCol, fp.fp FROM fp JOIN rare ON fp.fp = rare.fp)
       SELECT a.$idCol AS id_a, b.$idCol AS id_b, COUNT(*) AS shared
       FROM gated a JOIN gated b ON a.fp = b.fp AND a.$idCol < b.$idCol
       GROUP BY 1, 2 HAVING COUNT(*) >= $minShared
       ORDER BY id_a, id_b"""

  /** HOF reference form of [[winnowFingerprints]] — equivalence-spec only. */
  def winnowFingerprintsColumns(text: Column, k: Int = 3, w: Int = 4): Column = {
    val M = 1000000007L
    val B = 131L
    val th = transform(tokens(lower(text)),
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long") % M)
    // k-gram rolling hashes; short docs (< k tokens) hash their zero-padded
    // prefix (try_element_at + coalesce, mirrored by COALESCE in the oracle)
    val kg = transform(
      sequence(lit(1), greatest(size(th) - (k - 1), lit(1))),
      i =>
        (0 until k).foldLeft(lit(0L))((h, d) =>
          (h * B + coalesce(try_element_at(th, i + lit(d)), lit(0L))) % M))
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(kg) - (w - 1), lit(1))),
      j => array_min(slice(kg, j, lit(w))))))
  }

  /** Per-(document, term) TF-IDF over whitespace tokens:
    * `tf * ln(N / df)`, rounded to 4 decimals (the ulp-masking convention
    * the cosine oracles use — `ln` is libm-dependent in the last bit).
    *
    * Plan shape at scale: one explode → ONE partial-aggregated groupBy
    * (doc, term) → document frequency derived from the tf relation (a
    * second partial agg, no second scan of the corpus) → shuffle join on
    * term; the corpus size N rides along as a broadcast one-row cross join,
    * so nothing about the corpus reaches the driver.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = Dedup.parallelize(df).select(
      col(idCol), explode(tokens(lower(col(textCol)))).as("term"))
    val tf = exploded.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .select(
        col(idCol), col("term"), col("tf"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4)
          .as("tfidf"))
  }

  /** Distinctive vocabulary per source via Dunning's log-likelihood ratio
    * (G², Dunning 1993 — the keyness statistic corpus linguistics settled
    * on; χ² overweights rare terms, raw counts just find stopwords): for
    * each (source, term), compare the term's rate inside the source
    * against the rest of the corpus with
    * G² = 2·Σ O·ln(O/E) over the 2×2 contingency table, keeping terms
    * OVER-represented in the source. The per-source fingerprint a mixture
    * audit reads ("what is src7 actually full of?").
    *
    * Every statistic folds from ONE (source, term) count relation:
    * term totals, source totals, and the grand total are successive
    * aggregations joined back at type-table size ([[bigramLogprob]]
    * discipline); ranking is the salted [[TopK.perKey]]. Zero-count cells
    * contribute 0 to G² (lim x→0 x·ln x = 0), matching the oracle's CASE.
    */
  def sourceKeyness(df: DataFrame, sourceCol: String, textCol: String,
      topN: Int): DataFrame = {
    val st = Dedup.parallelize(df)
      .select(col(sourceCol).as("source"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("a"))
      // barrier: the source×term type table feeds termTot/srcTot/grand and
      // the 2x2 join — the burrowsDelta bySrc pattern
      .localCheckpoint()
    val termTot = st.groupBy("term").agg(sum("a").as("t_tot"))
    val srcTot = st.groupBy("source").agg(sum("a").as("s_tot"))
    val grand = st.agg(sum("a").as("g_tot"))
    // 2x2 table: a = in-source count, b = elsewhere count,
    // c = source's other tokens, d = the rest
    val withTots = st
      .join(termTot.hint("shuffle_hash"), "term")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(grand))
      .withColumn("b", col("t_tot") - col("a"))
      .withColumn("c", col("s_tot") - col("a"))
      .withColumn("d", col("g_tot") - col("t_tot") - col("c"))
    def term(o: Column, rowTot: Column, colTot: Column, g: Column): Column = {
      val e = rowTot.cast("double") * colTot.cast("double") / g.cast("double")
      when(o > 0, o.cast("double") * log(o.cast("double") / e)).otherwise(lit(0.0))
    }
    val g2 = lit(2.0) * (
      term(col("a"), col("s_tot"), col("t_tot"), col("g_tot")) +
      term(col("b"), col("g_tot") - col("s_tot"), col("t_tot"), col("g_tot")) +
      term(col("c"), col("s_tot"), col("g_tot") - col("t_tot"), col("g_tot")) +
      term(col("d"), col("g_tot") - col("s_tot"), col("g_tot") - col("t_tot"), col("g_tot")))
    val scored = withTots
      // keep only OVER-represented terms: observed in-source rate > expected
      .where(col("a").cast("double") * col("g_tot").cast("double") >
        col("s_tot").cast("double") * col("t_tot").cast("double"))
      .select(col("source"), col("term"), col("a").as("n"),
        round(g2, 4).as("g2"))
    TopK.perKey(scored, Seq("source"), Seq(col("g2").desc, col("term").asc),
        saltFrom = col("term"), n = topN)
      .select(col("source"), col("rank"), col("term"), col("n"), col("g2"))
  }

  /** DuckDB mirror of [[sourceKeyness]] — same folds, single-window rank. */
  def sourceKeynessSql(tbl: String, sourceCol: String, textCol: String,
      topN: Int): String =
    s"""WITH st AS (SELECT $sourceCol AS source, term, COUNT(*) AS a
           FROM (SELECT $sourceCol,
                   unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term
                 FROM $tbl)
           GROUP BY 1, 2),
       tt AS (SELECT term, SUM(a) AS t_tot FROM st GROUP BY term),
       stot AS (SELECT source, SUM(a) AS s_tot FROM st GROUP BY source),
       g AS (SELECT SUM(a) AS g_tot FROM st),
       cells AS (SELECT st.source, st.term, a,
                        t_tot - a AS b, s_tot - a AS c, g_tot - t_tot - (s_tot - a) AS d,
                        s_tot, t_tot, g_tot
                 FROM st JOIN tt USING (term) JOIN stot USING (source) CROSS JOIN g),
       scored AS (SELECT source, term, CAST(a AS BIGINT) AS n,
           round(2.0 * (
             (CASE WHEN a > 0 THEN a * ln(a / (CAST(s_tot AS DOUBLE) * t_tot / g_tot)) ELSE 0 END) +
             (CASE WHEN b > 0 THEN b * ln(b / (CAST(g_tot - s_tot AS DOUBLE) * t_tot / g_tot)) ELSE 0 END) +
             (CASE WHEN c > 0 THEN c * ln(c / (CAST(s_tot AS DOUBLE) * (g_tot - t_tot) / g_tot)) ELSE 0 END) +
             (CASE WHEN d > 0 THEN d * ln(d / (CAST(g_tot - s_tot AS DOUBLE) * (g_tot - t_tot) / g_tot)) ELSE 0 END)
           ), 4) AS g2
         FROM cells
         WHERE CAST(a AS DOUBLE) * g_tot > CAST(s_tot AS DOUBLE) * t_tot)
       SELECT source, rank, term, n, g2 FROM (
         SELECT source, term, n, g2,
           CAST(row_number() OVER (PARTITION BY source ORDER BY g2 DESC, term) AS BIGINT) AS rank
         FROM scored)
       WHERE rank <= $topN ORDER BY source, rank"""

  /** Windowed token co-occurrence counts — the input relation of every
    * count-based embedding / collocation method (GloVe's X_ij, PMI, χ²):
    * c(w1, w2) = occurrences of w2 within `window` positions AFTER w1
    * (directional; the symmetric count is c(w1,w2)+c(w2,w1)).
    *
    * Relational shape at 100 TB: the pair stream needs NO join at all —
    * pairs materialize inside the scan projection by zipping the token
    * array against its own d-shifted slice for each d ∈ [1, window]
    * (bounded fan-out ≤ window per token, never quadratic in document
    * length), so the only shuffle in the whole operator is the final
    * map-side-combinable pair aggregation. The first cut equi-joined a
    * probe explode back to the position relation — same result, but it
    * shuffled the corpus-sized relation twice and sorted it for the join;
    * the 10× smoke read 4.9× for it vs ~linear for this form.
    */
  def cooccurCounts(df: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"cooccurCounts: need window >= 1, got $window")
    val ws = tokens(lower(col(textCol)))
    val pairsOf = flatten(transform(sequence(lit(1), lit(window)), d =>
      zip_with(
        ws,
        slice(ws, d + lit(1), greatest(size(ws) - d, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))))
    Dedup.parallelize(df)
      .select(explode(pairsOf).as("p"))
      // zip_with pads the shorter (shifted) side with nulls: the last d
      // tokens of each document have no d-ahead partner
      .where(col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
  }

  /** Top collocations by pointwise mutual information over
    * [[cooccurCounts]]: pmi(w1,w2) = ln( (n·T) / (c1·c2) ) where T is the
    * total co-occurrence mass and c1/c2 the marginals — high for pairs that
    * appear together far above independence. `minCount` drops the
    * low-count noise PMI is notorious for. Marginals and T derive from the
    * ONE pair relation by aggregation (the [[bigramLogprob]] fold-into-
    * the-type-table discipline: w1/w2 joins hit marginal-sized relations).
    */
  def pmiTop(df: DataFrame, idCol: String, textCol: String, window: Int,
      minCount: Long, topN: Int): DataFrame = {
    val pairs = cooccurCounts(df, idCol, textCol, window)
    val left = pairs.groupBy("w1").agg(sum("n").as("c1"))
    val right = pairs.groupBy("w2").agg(sum("n").as("c2"))
    val total = pairs.agg(sum("n").as("t"))
    pairs.where(col("n") >= minCount)
      .join(left.hint("shuffle_hash"), "w1")
      .join(right.hint("shuffle_hash"), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n"),
        round(log((col("n").cast("double") * col("t").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** DuckDB mirror of [[cooccurCounts]] — generate_subscripts positions +
    * a range join (the naive single-engine form).
    */
  def cooccurCountsSql(tbl: String, idCol: String, textCol: String,
      window: Int): String =
    s"""WITH p AS (SELECT $idCol AS id,
            CAST(generate_subscripts(ws, 1) AS BIGINT) AS pos, unnest(ws) AS tok
          FROM (SELECT $idCol, string_split_regex(trim(lower($textCol)), '\\s+') AS ws
                FROM $tbl))
        SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS n
        FROM p a JOIN p b
          ON a.id = b.id AND b.pos > a.pos AND b.pos <= a.pos + $window
        GROUP BY 1, 2"""

  /** DuckDB mirror of [[pmiTop]]. */
  def pmiTopSql(tbl: String, idCol: String, textCol: String, window: Int,
      minCount: Long, topN: Int): String =
    s"""WITH pairs AS (${cooccurCountsSql(tbl, idCol, textCol, window)}),
        l AS (SELECT w1, SUM(n) AS c1 FROM pairs GROUP BY w1),
        r AS (SELECT w2, SUM(n) AS c2 FROM pairs GROUP BY w2),
        t AS (SELECT SUM(n) AS t FROM pairs)
        SELECT pairs.w1, pairs.w2, pairs.n,
          round(ln((CAST(n AS DOUBLE) * CAST(t.t AS DOUBLE)) /
            (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 4) AS pmi
        FROM pairs JOIN l ON pairs.w1 = l.w1 JOIN r ON pairs.w2 = r.w2
        CROSS JOIN t
        WHERE n >= $minCount
        ORDER BY pmi DESC, pairs.w1, pairs.w2 LIMIT $topN"""

  private val gopherStops = Seq("the", "a", "of", "and", "in", "to")

  /** Gopher/MassiveText-style rule gate (Rae et al. 2021 §A1.1): the
    * threshold filters a corpus pass applies BEFORE any model-based scoring
    * — word-count bounds, mean-word-length bounds, a minimum of distinct
    * stop words present, and a symbol-ratio cap. Bounds are scaled to the
    * fixture corpus; the rule STRUCTURE is the published one.
    *
    * Every signal is a per-row codegen'd Column over the scan (ASCII-only
    * regex classes so Java regex and DuckDB RE2 agree byte-for-byte; the
    * stop-word hit count intersects DISTINCT tokens so multiplicity can't
    * inflate it). No shuffle anywhere — the gate scales with the scan.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 10L, maxWords: Long = 1000L): DataFrame = {
    val t = col(textCol)
    val nw = tokenCount(t)
    val meanWl = length(t).cast("double") / greatest(nw, lit(1))
    val nStop = size(array_intersect(
      array_distinct(tokens(lower(t))),
      array(gopherStops.map(lit): _*))).cast("long")
    val nSym = length(regexp_replace(t, "[A-Za-z0-9 \\t\\n\\r\\f]", "")).cast("long")
    val symRatio = nSym.cast("double") / greatest(length(t), lit(1))
    df.select(col(idCol),
      nw.as("n_words"),
      round(meanWl, 6).as("mean_word_len"),
      nStop.as("n_stop"),
      round(symRatio, 6).as("sym_ratio"),
      (nw >= minWords && nw <= maxWords).as("r_wordcount"),
      (meanWl >= 3.0 && meanWl <= 10.0).as("r_wordlen"),
      (nStop >= 2L).as("r_stopwords"),
      (symRatio <= 0.1).as("r_symbols"),
      (nw >= minWords && nw <= maxWords && meanWl >= 3.0 && meanWl <= 10.0 &&
        nStop >= 2L && symRatio <= 0.1).as("keep"))
  }

  /** DuckDB mirror of [[gopherRules]]. */
  def gopherRulesSql(tbl: String, idCol: String, textCol: String,
      minWords: Long = 10L, maxWords: Long = 1000L): String = {
    val stops = gopherStops.map(w => s"'$w'").mkString(", ")
    s"""WITH sig AS (SELECT $idCol,
           CAST(len(string_split_regex(trim($textCol), '\\s+')) AS BIGINT) AS n_words,
           CAST(length($textCol) AS DOUBLE) /
             greatest(len(string_split_regex(trim($textCol), '\\s+')), 1) AS mwl,
           CAST(len(list_intersect(
             list_distinct(string_split_regex(trim(lower($textCol)), '\\s+')),
             [$stops])) AS BIGINT) AS n_stop,
           CAST(length(regexp_replace($textCol, '[A-Za-z0-9 \\t\\n\\r\\f]', '', 'g')) AS DOUBLE) /
             greatest(length($textCol), 1) AS sym
         FROM $tbl)
       SELECT $idCol, n_words, round(mwl, 6) AS mean_word_len, n_stop,
         round(sym, 6) AS sym_ratio,
         n_words >= $minWords AND n_words <= $maxWords AS r_wordcount,
         mwl >= 3.0 AND mwl <= 10.0 AS r_wordlen,
         n_stop >= 2 AS r_stopwords,
         sym <= 0.1 AS r_symbols,
         n_words >= $minWords AND n_words <= $maxWords AND mwl >= 3.0 AND
           mwl <= 10.0 AND n_stop >= 2 AND sym <= 0.1 AS keep
       FROM sig ORDER BY $idCol"""
  }

  /** Per-group n-gram diversity (type/token ratio over token n-grams — the
    * corpus-level repetitiveness metric generation-quality reports cite as
    * distinct-n): total n-gram occurrences, distinct n-gram types, and
    * their ratio, per `groupCol`.
    *
    * Shape: one explode, then two hash aggs — (group, gram) multiplicities
    * with map-side partials, then per-group totals where the distinct count
    * is a plain `count(1)` over the already-deduped type relation (never a
    * global count_distinct funneling types through one reducer).
    */
  def ngramDiversity(df: DataFrame, groupCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"ngramDiversity: need n >= 1, got $n")
    val raw = Dedup.parallelize(df)
      .select(col(groupCol).as("_nd_g"),
        explode(graft.functions.MinHashExpr.shinglesArray(
          lower(col(textCol)), n)).as("_nd_gram"))
      // a <n-token document yields its whole-token-string shingle; a true
      // n-gram has exactly n-1 separator spaces (tokens never contain one)
      .where(size(split(col("_nd_gram"), " ")) === n)
    raw.groupBy("_nd_g", "_nd_gram").agg(count(lit(1)).as("_nd_c"))
      .groupBy("_nd_g")
      .agg(sum("_nd_c").as("total_ngrams"), count(lit(1)).as("distinct_ngrams"))
      .select(col("_nd_g").as(groupCol), col("total_ngrams"),
        col("distinct_ngrams"),
        round(col("distinct_ngrams").cast("double") /
          col("total_ngrams").cast("double"), 4).as("diversity"))
  }

  /** Corpus ENTROPY RATE: the conditional entropy H(w₂|w₁) of the bigram
    * relation (nats/token) and its perplexity — the model-free ceiling
    * diagnostic the LM-scoring family reports against ([[bigramLogprob]]
    * scores documents under a fitted LM; this is the corpus's own
    * irreducible next-token uncertainty, what any bigram LM's average nll
    * converges to). Gap to the unigram entropy H(w) = how much one token
    * of context buys on this corpus.
    *
    * Exactness: all counts integer; each −(c₁₂/N)·ln(c₁₂/c₁) term is one
    * fixed double shape rounded to 9 and summed as DECIMAL (partition-
    * order-immune, the [[giniConcentration]] discipline). Shape: one
    * explode into the bigram type table; context totals fold FROM that
    * table (no second corpus scan); one row out.
    */
  def entropyRate(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val big = Dedup.parallelize(df)
      .select(explode(graft.functions.MinHashExpr.shinglesArray(
        lower(col(textCol)), 2)).as("_er_g"))
      .where(size(split(col("_er_g"), " ")) === 2)
      .groupBy("_er_g").agg(count(lit(1)).as("c12"))
      .withColumn("_er_w1", split(col("_er_g"), " ").getItem(0))
    val tot = big.agg(sum(col("c12")).as("n"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    // Round-12 reshape (guide §2.4): the former ctx aggregate + inner
    // join re-keyed the bigram TYPE table twice (groupBy(_er_w1) exchange
    // + the join's own exchange) and re-expanded the gram subtree for the
    // separate h1 aggregate. One window over partition(_er_w1) computes
    // the identical context totals (sum is the same long arithmetic over
    // the same groups), and rn==1 marks exactly one row per context so
    // h1's per-context terms fold into the SAME final aggregate — the
    // type table crosses the wire once. Every operand (c12, c1, n) and
    // every rounding point is unchanged, so the decimal sums are
    // bit-equal; the oracle keeps the relational spelling as the
    // equivalence proof.
    val byW1 = Window.partitionBy("_er_w1")
    val win = big.crossJoin(broadcast(tot))
      .withColumn("c1", sum(col("c12")).over(byW1))
      .withColumn("_er_rn", row_number().over(byW1.orderBy("_er_g")))
    val condTerm = round(
      (d(col("c12")) / d(col("n"))) * log(d(col("c12")) / d(col("c1"))), 9)
    val uniTerm = round(
      (d(col("c1")) / d(col("n"))) * log(d(col("c1")) / d(col("n"))), 9)
    win.agg(
        max(col("n")).as("n_bigrams"),
        count(lit(1)).as("n_bigram_types"),
        count(when(col("_er_rn") === 1, lit(1))).as("n_contexts"),
        (-sum(condTerm.cast("decimal(18,9)"))).cast("double").as("_h2"),
        (-sum(when(col("_er_rn") === 1, uniTerm).cast("decimal(18,9)")))
          .cast("double").as("_h1"))
      .select(col("n_bigrams"), col("n_bigram_types"), col("n_contexts"),
        round(col("_h2"), 6).as("h_cond"),
        round(col("_h1"), 6).as("h_uni"),
        round(exp(col("_h2")), 4).as("ppl_cond"))
  }

  /** DuckDB mirror of [[entropyRate]]. */
  def entropyRateSql(tbl: String, textCol: String): String =
    s"""WITH w AS (SELECT string_split_regex(trim(lower($textCol)),'\\s+') AS ws FROM $tbl),
       big AS (SELECT gram AS g, COUNT(*) AS c12,
           string_split(gram, ' ')[1] AS w1
         FROM (SELECT unnest(CASE WHEN len(ws) >= 2
             THEN list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1])
             ELSE [array_to_string(ws, ' ')] END) AS gram FROM w)
         WHERE len(string_split(gram, ' ')) = 2
         GROUP BY gram),
       ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY w1),
       tot AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM big),
       h2 AS (SELECT MAX(n) AS n_bigrams, COUNT(*) AS n_bigram_types,
           CAST(-SUM(CAST(round((CAST(c12 AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DOUBLE) AS h2
         FROM big JOIN ctx USING (w1) CROSS JOIN tot),
       h1 AS (SELECT COUNT(*) AS n_contexts,
           CAST(-SUM(CAST(round((CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DOUBLE) AS h1
         FROM ctx CROSS JOIN tot)
       SELECT CAST(n_bigrams AS BIGINT) AS n_bigrams,
         CAST(n_bigram_types AS BIGINT) AS n_bigram_types,
         CAST(n_contexts AS BIGINT) AS n_contexts,
         round(h2, 6) AS h_cond, round(h1, 6) AS h_uni,
         round(exp(h2), 4) AS ppl_cond
       FROM h2 CROSS JOIN h1"""

  /** Per-source readability (Flesch reading-ease and Flesch–Kincaid
    * grade) with the standard automated syllable proxy — syllables ≈
    * vowel GROUPS per word (`[aeiouy]+` runs), sentences ≈ `[.!?]+` runs
    * — the quality gate curricula and audience filters actually apply at
    * corpus scale (exact syllabification needs a dictionary; every
    * published large-scale readability number uses a proxy of this
    * shape). All three counts are codegen'd regexp folds inside the
    * scan; one bounded group agg; the FK constants appear as the same
    * literals in both engines.
    */
  def readability(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val words = tokenCount(col(textCol))
    // vowel groups: strip everything that is not a vowel-run boundary,
    // then count runs = length after collapsing each run to one char
    val syllables = size(split(t, "[aeiouy]+")) - 1
    val sentences = greatest(size(split(col(textCol), "[.!?]+")) - 1, lit(1))
    val g = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(words.cast("long")).as("n_words"),
      sum(syllables.cast("long")).as("n_syllables"),
      sum(sentences.cast("long")).as("n_sentences"))
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    g.select(col(groupCol), col("n_docs"), col("n_words"), col("n_syllables"),
        col("n_sentences"),
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 4)
          .as("flesch_ease"),
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 4)
          .as("fk_grade"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[readability]]. */
  def readabilitySql(tbl: String, groupCol: String,
      textCol: String): String =
    s"""WITH g AS (SELECT $groupCol,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split_regex(trim($textCol), '\\s+'))) AS BIGINT) AS n_words,
           CAST(SUM(len(string_split_regex(lower($textCol), '[aeiouy]+')) - 1) AS BIGINT) AS n_syllables,
           CAST(SUM(greatest(len(string_split_regex($textCol, '[.!?]+')) - 1, 1)) AS BIGINT) AS n_sentences
         FROM $tbl GROUP BY $groupCol)
       SELECT $groupCol, n_docs, n_words, n_syllables, n_sentences,
         round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
           - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 4) AS flesch_ease,
         round(0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
           + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) - 15.59, 4) AS fk_grade
       FROM g ORDER BY $groupCol"""

  /** Per-source Unicode SCRIPT composition: character counts per script
    * block (Latin / Cyrillic / Han / Greek / digits) and the dominant
    * script — the script-level gate multilingual pipelines run beside
    * token-level [[langId]] (langid confuses languages; script counts
    * can't, and a Latin-labeled corpus with a Cyrillic tail is a
    * mojibake/spam signal langid misses). Zero shuffle beyond the group
    * agg: every count is a codegen'd regexp length inside the scan.
    *
    * Both engines count via `length(regexp_replace(text,
    * '[^\\p{Script}]', ''))` — Java and RE2 agree on Unicode script
    * classes; counts are chars, exact.
    */
  def scriptProfile(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(cls: String) =
      length(regexp_replace(t, s"[^\\p{Is$cls}]", "")).cast("long")
    val digits = length(regexp_replace(t, "[^0-9]", "")).cast("long")
    val g = df.groupBy(col(groupCol)).agg(
      sum(length(t).cast("long")).as("n_chars"),
      sum(cnt("Latin")).as("latin"),
      sum(cnt("Cyrillic")).as("cyrillic"),
      sum(cnt("Han")).as("han"),
      sum(cnt("Greek")).as("greek"),
      sum(digits).as("digit"))
    val dom = when(col("latin") >= col("cyrillic") &&
        col("latin") >= col("han") && col("latin") >= col("greek"), "latin")
      .when(col("cyrillic") >= col("han") && col("cyrillic") >= col("greek"),
        "cyrillic")
      .when(col("han") >= col("greek"), "han")
      .otherwise("greek")
    g.select(col(groupCol), col("n_chars"), col("latin"), col("cyrillic"),
        col("han"), col("greek"), col("digit"),
        round(col("latin").cast("double") / col("n_chars").cast("double"), 6)
          .as("share_latin"),
        dom.as("dominant"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[scriptProfile]]. */
  def scriptProfileSql(tbl: String, groupCol: String,
      textCol: String): String = {
    def cnt(cls: String) =
      s"length(regexp_replace($textCol, '[^\\p{$cls}]', '', 'g'))"
    s"""WITH g AS (SELECT $groupCol,
           CAST(SUM(length($textCol)) AS BIGINT) AS n_chars,
           CAST(SUM(${cnt("Latin")}) AS BIGINT) AS latin,
           CAST(SUM(${cnt("Cyrillic")}) AS BIGINT) AS cyrillic,
           CAST(SUM(${cnt("Han")}) AS BIGINT) AS han,
           CAST(SUM(${cnt("Greek")}) AS BIGINT) AS greek,
           CAST(SUM(length(regexp_replace($textCol, '[^0-9]', '', 'g'))) AS BIGINT) AS digit
         FROM $tbl GROUP BY $groupCol)
       SELECT $groupCol, n_chars, latin, cyrillic, han, greek, digit,
         round(CAST(latin AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS share_latin,
         CASE WHEN latin >= cyrillic AND latin >= han AND latin >= greek THEN 'latin'
              WHEN cyrillic >= han AND cyrillic >= greek THEN 'cyrillic'
              WHEN han >= greek THEN 'han'
              ELSE 'greek' END AS dominant
       FROM g ORDER BY $groupCol"""
  }

  /** Per-document n-gram NOVELTY against everything that came before it
    * (by id order): the fraction of the doc's distinct n-grams whose
    * global FIRST occurrence is this document — the corpus-growth
    * redundancy curve ("are new documents still adding new content, or
    * re-treading the corpus?") that dedup thresholds and crawl-stop
    * decisions get judged by; per-doc it is also a cheap
    * memorization-risk proxy (a low-novelty doc is mostly assembled from
    * text the model already saw).
    *
    * Shape: one explode → distinct (doc, gram) type relation → ONE
    * gram-partitioned window carrying min(doc_id) onto every type row
    * (the groupBy+self-join form re-shuffled the full type table a
    * second time; the window is the same hash partitioning paid once —
    * 10× smoke 5.7×→ratio drop measured on the word-salted replicas) →
    * per-doc counts. The [[ngramDiversity]] distinct-then-count
    * discipline; no window over the corpus, no self-join on text.
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"ngramNovelty: need n >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val types = Dedup.parallelize(df)
      .select(col(idCol).cast("long").as("_nn_id"),
        explode(graft.functions.MinHashExpr.shinglesArray(
          lower(col(textCol)), n)).as("_nn_gram"))
      .where(size(split(col("_nn_gram"), " ")) === n)
      .distinct()
    types
      .withColumn("_nn_first",
        min(col("_nn_id")).over(Window.partitionBy("_nn_gram")))
      .groupBy(col("_nn_id").as(idCol))
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("_nn_first") === col("_nn_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col(idCol), col("n_distinct"), col("n_novel"),
        round(col("n_novel").cast("double") /
          col("n_distinct").cast("double"), 4).as("novelty"))
      .orderBy(idCol)
  }

  /** DuckDB mirror of [[ngramNovelty]]. */
  def ngramNoveltySql(tbl: String, idCol: String, textCol: String,
      n: Int): String = {
    val gram = (1 until n).foldLeft("ws[i]")((acc, j) => s"$acc||' '||ws[i+$j]")
    s"""WITH w AS (SELECT CAST($idCol AS BIGINT) AS id,
             string_split_regex(trim(lower($textCol)), '\\s+') AS ws FROM $tbl),
       types AS (SELECT DISTINCT id, gram FROM (
           SELECT id, unnest(list_transform(
             range(1, len(ws) - ${n - 2}), i -> $gram)) AS gram FROM w)),
       fo AS (SELECT gram, MIN(id) AS first_id FROM types GROUP BY gram)
       SELECT id AS $idCol, COUNT(*) AS n_distinct,
         CAST(SUM(CASE WHEN first_id = id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         round(CAST(SUM(CASE WHEN first_id = id THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE), 4) AS novelty
       FROM types JOIN fo USING (gram)
       GROUP BY id ORDER BY id"""
  }

  /** DuckDB mirror of [[ngramDiversity]]. */
  def ngramDiversitySql(tbl: String, groupCol: String, textCol: String,
      n: Int): String = {
    val gram = (1 until n).foldLeft("ws[i]")((acc, j) => s"$acc||' '||ws[i+$j]")
    s"""WITH w AS (SELECT $groupCol AS g,
             string_split_regex(trim(lower($textCol)), '\\s+') AS ws FROM $tbl),
       grams AS (SELECT g, unnest(list_transform(
             range(1, len(ws) - ${n - 2}), i -> $gram)) AS gram FROM w),
       c AS (SELECT g, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2)
       SELECT g AS $groupCol, CAST(SUM(c) AS BIGINT) AS total_ngrams,
         COUNT(*) AS distinct_ngrams,
         round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 4) AS diversity
       FROM c GROUP BY g ORDER BY $groupCol"""
  }

  /** Per-language tokenizer fertility — subword tokens per word and chars
    * per subword token, THE metric tokenizer evaluations report when
    * comparing vocabularies across languages (fertility ≈ 1 is ideal;
    * high fertility means the vocabulary fragments that language). Uses
    * the [[bpeTokenEstimate]] proxy tokenizer; all sums are integer
    * (exact under any partitioning), ratios divide once in double.
    */
  def tokenizerFertility(df: DataFrame, langCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    df.groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(t)).as("n_words"),
        sum(bpeTokenEstimate(t)).as("n_bpe"),
        sum(length(t).cast("long")).as("n_chars"))
      .select(col(langCol), col("n_docs"), col("n_words"), col("n_bpe"),
        col("n_chars"),
        round(col("n_bpe").cast("double") /
          greatest(col("n_words"), lit(1)).cast("double"), 4).as("fertility"),
        round(col("n_chars").cast("double") /
          greatest(col("n_bpe"), lit(1)).cast("double"), 4).as("chars_per_tok"))
      .orderBy(langCol)
  }

  /** DuckDB mirror of [[tokenizerFertility]]. */
  def tokenizerFertilitySql(tbl: String, langCol: String,
      textCol: String): String = {
    val bpe = s"""coalesce(CAST(list_sum(list_transform(
        regexp_extract_all($textCol, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r\\f]'),
        w -> CAST(floor((length(w)+3)/4.0) AS BIGINT))) AS BIGINT), 0)"""
    s"""SELECT $langCol, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split_regex(trim($textCol), '\\s+'))) AS BIGINT) AS n_words,
         CAST(SUM($bpe) AS BIGINT) AS n_bpe,
         CAST(SUM(length($textCol)) AS BIGINT) AS n_chars,
         round(CAST(SUM($bpe) AS DOUBLE) /
           greatest(CAST(SUM(len(string_split_regex(trim($textCol), '\\s+'))) AS DOUBLE), 1), 4)
           AS fertility,
         round(CAST(SUM(length($textCol)) AS DOUBLE) /
           greatest(CAST(SUM($bpe) AS DOUBLE), 1), 4) AS chars_per_tok
       FROM $tbl GROUP BY $langCol ORDER BY $langCol"""
  }

  /** Per-source Zipf law fit: OLS slope/intercept of ln(freq) against
    * ln(rank) over each source's term type table — natural text sits near
    * slope ≈ −1, and a corpus segment that drifts far from it (machine
    * boilerplate, log spam, template storms) is a curation signal.
    *
    * Determinism: ranks are integers (freq desc, term asc total order);
    * ln(rank)/ln(freq) round to 6 then every OLS sum accumulates the
    * DOUBLE products of those exact decimals rounded to 8 into
    * DECIMAL(28,8) — associative, partition-order-proof, engine-identical.
    *
    * Shape: the rank window partitions by SOURCE over the term TYPE table
    * (vocabulary-sized, Heaps-law sublinear in the corpus — the
    * freq_spectrum/vocab_topn discipline), then one bounded per-source agg.
    */
  def zipfFit(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val types = Dedup.parallelize(df)
      .select(col(sourceCol).as("_zf_s"),
        explode(tokens(lower(col(textCol)))).as("_zf_t"))
      .groupBy("_zf_s", "_zf_t").agg(count(lit(1)).as("_zf_f"))
    val w = Window.partitionBy("_zf_s")
      .orderBy(col("_zf_f").desc, col("_zf_t").asc)
    val xy = types
      .withColumn("_zf_r", row_number().over(w))
      .select(col("_zf_s"),
        round(log(col("_zf_r").cast("double")), 6).as("x"),
        round(log(col("_zf_f").cast("double")), 6).as("y"))
    def s(c: Column): Column = sum(round(c, 8).cast("decimal(28,8)")).cast("double")
    xy.groupBy(col("_zf_s").as(sourceCol))
      .agg(count(lit(1)).as("n_types"),
        s(col("x")).as("_sx"), s(col("y")).as("_sy"),
        s(col("x") * col("y")).as("_sxy"), s(col("x") * col("x")).as("_sxx"))
      .select(col(sourceCol), col("n_types"),
        round((col("_sxy") - col("_sx") * col("_sy") / col("n_types")) /
          (col("_sxx") - col("_sx") * col("_sx") / col("n_types")), 4).as("slope"),
        round(col("_sy") / col("n_types") -
          ((col("_sxy") - col("_sx") * col("_sy") / col("n_types")) /
           (col("_sxx") - col("_sx") * col("_sx") / col("n_types"))) *
            (col("_sx") / col("n_types")), 4).as("intercept"))
      .orderBy(sourceCol)
  }

  /** Hill tail-index estimator over each source's term-frequency
    * distribution: α̂ = k / Σ_{i≤k} (ln f_(i) − ln f_(k+1)) on the top-k
    * order statistics — the PROPER tail-heaviness statistic next to
    * [[zipfFit]]'s whole-curve OLS (the OLS slope is biased by the mid-rank
    * mass; Hill reads only the head, which is what decides whether a few
    * mega-frequent tokens dominate a source). Small α̂ = heavy tail.
    *
    * k adapts per source to min(k, n_types − 1); a source with one type, or
    * a flat head (Σ = 0, all top-(k+1) frequencies equal), yields NULL.
    * Shape: the [[zipfFit]] rank window over the vocabulary-sized type
    * relation; ln(f) rounds to 6, differences sum through DECIMAL.
    */
  def hillTail(df: DataFrame, sourceCol: String, textCol: String,
      k: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val types = Dedup.parallelize(df)
      .select(col(sourceCol).as("_ht_s"),
        explode(tokens(lower(col(textCol)))).as("_ht_t"))
      .groupBy("_ht_s", "_ht_t").agg(count(lit(1)).as("_ht_f"))
    val w = Window.partitionBy("_ht_s")
    val ranked = types
      .withColumn("_ht_r", row_number().over(w.orderBy(col("_ht_f").desc, col("_ht_t").asc)))
      .withColumn("_ht_n", count(lit(1)).over(w))
      .withColumn("_ht_k", least(lit(k.toLong), col("_ht_n") - 1))
      .where(col("_ht_r") <= col("_ht_k") + 1 && col("_ht_k") >= 1)
      .select(col("_ht_s"), col("_ht_r"), col("_ht_k"),
        round(log(col("_ht_f").cast("double")), 6).as("_ht_lf"))
    val fk1 = ranked.where(col("_ht_r") === col("_ht_k") + 1)
      .select(col("_ht_s"), col("_ht_lf").as("_ht_lfk1"))
    ranked.where(col("_ht_r") <= col("_ht_k"))
      .join(fk1, "_ht_s")
      .groupBy(col("_ht_s").as(sourceCol))
      .agg(max(col("_ht_k")).as("k_used"),
        sum((col("_ht_lf") - col("_ht_lfk1")).cast("decimal(28,6)"))
          .cast("double").as("_ht_sum"))
      .select(col(sourceCol), col("k_used"),
        when(col("_ht_sum") > 0,
          round(col("k_used").cast("double") / col("_ht_sum"), 4)).as("alpha"))
      .orderBy(sourceCol)
  }

  /** DuckDB mirror of [[hillTail]]. */
  def hillTailSql(tbl: String, sourceCol: String, textCol: String,
      k: Int = 30): String =
    s"""WITH t AS (SELECT $sourceCol AS s,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term
           FROM $tbl),
       f AS (SELECT s, term, COUNT(*) AS f FROM t GROUP BY 1, 2),
       r AS (SELECT s,
               row_number() OVER (PARTITION BY s ORDER BY f DESC, term) AS r,
               COUNT(*) OVER (PARTITION BY s) AS n,
               round(ln(CAST(f AS DOUBLE)), 6) AS lf
             FROM f),
       rk AS (SELECT s, r, least($k, n - 1) AS k, lf FROM r
              WHERE r <= least($k, n - 1) + 1 AND least($k, n - 1) >= 1),
       fk1 AS (SELECT s, lf AS lfk1 FROM rk WHERE r = k + 1),
       a AS (SELECT rk.s, MAX(k) AS k_used,
               CAST(SUM(CAST(rk.lf - fk1.lfk1 AS DECIMAL(28,6))) AS DOUBLE) AS sm
             FROM rk JOIN fk1 ON rk.s = fk1.s
             WHERE rk.r <= rk.k GROUP BY rk.s)
       SELECT s AS $sourceCol, CAST(k_used AS BIGINT) AS k_used,
         CASE WHEN sm > 0 THEN round(CAST(k_used AS DOUBLE) / sm, 4) END AS alpha
       FROM a ORDER BY $sourceCol"""

  /** DuckDB mirror of [[zipfFit]]. */
  def zipfFitSql(tbl: String, sourceCol: String, textCol: String): String =
    s"""WITH t AS (SELECT $sourceCol AS s,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term
           FROM $tbl),
       f AS (SELECT s, term, COUNT(*) AS f FROM t GROUP BY 1, 2),
       r AS (SELECT s,
               round(ln(CAST(row_number() OVER (PARTITION BY s ORDER BY f DESC, term) AS DOUBLE)), 6) AS x,
               round(ln(CAST(f AS DOUBLE)), 6) AS y
             FROM f),
       a AS (SELECT s, COUNT(*) AS n,
               CAST(SUM(CAST(round(x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(round(y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(round(x*y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(round(x*x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx
             FROM r GROUP BY s)
       SELECT s AS $sourceCol, n AS n_types,
         round((sxy - sx*sy/n) / (sxx - sx*sx/n), 4) AS slope,
         round(sy/n - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * (sx/n), 4) AS intercept
       FROM a ORDER BY $sourceCol"""

  /** Feature-hashed bag-of-words embedding (the hashing trick): every doc
    * becomes a dense `dim`-vector — bucket = md5(token) mod dim, weight =
    * L2-normalized token count. The deterministic text→vector operator that
    * feeds the [[Similarity]] stack when no learned encoder is in the loop
    * (cheap near-dup candidates, cold-start retrieval, drift fingerprints),
    * and the classic trick for bounding feature width at 100 TB: vocabulary
    * can grow without bound, the vector never does.
    *
    * Computed ROW-LOCALLY by [[graft.functions.HashEmbedExpr]] (the
    * GramStats discipline): the bucket-count fold, L2 norm, and rounded
    * weights all happen inside the scan projection — the former
    * explode + (id, bucket) count agg + per-doc map fold shuffled a
    * token-count-of-the-corpus relation through two exchanges to compute
    * what is a per-row bag count (HashEmbedStatsSpec pins bit-equality
    * against that relational form; the DuckDB mirror keeps the relational
    * spelling, so the board hash doubles as the equivalence proof).
    *
    * Output: (idCol, embedding array<double> of length dim). Docs with no
    * tokens produce no row (null text prefiltered — the explode's absence
    * semantics; a non-null text always yields >= 1 token).
    */
  def hashEmbed(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame =
    // explode(array(...)) wraps the vector in a Generate (the charEntropy
    // lesson): a consumer's own posexplode makes InferFiltersFromGenerate
    // add `size(embedding) > 0 AND isnotnull(embedding)`, and with a plain
    // projection those predicates push into the scan and evaluate the
    // md5 fold TWO more times per row; against a generated attribute they
    // stay above this Generate and cost a length check on the built array
    Dedup.parallelize(df)
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        explode(array(
          graft.functions.HashEmbedExpr.hashEmbed(col(textCol), dim)))
          .as("embedding"))

  /** DuckDB mirror of [[hashEmbed]] in LONG form (doc, dim, weight), the
    * shape the oracle compares; zeros are omitted on both sides.
    */
  def hashEmbedLongSql(tbl: String, idCol: String, textCol: String,
      dim: Int = 64): String =
    s"""WITH t AS (SELECT $idCol AS id,
             CAST(('0x' || substr(md5(term), 1, 15))::BIGINT % $dim AS INT) AS b
           FROM (SELECT $idCol,
                   unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term
                 FROM $tbl)),
       c AS (SELECT id, b, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
       n AS (SELECT id, sqrt(CAST(SUM(cnt * cnt) AS DOUBLE)) AS nrm
             FROM c GROUP BY id)
       SELECT c.id AS $idCol, b AS dim,
         round(CAST(cnt AS DOUBLE) / nrm, 6) AS w
       FROM c JOIN n USING (id) ORDER BY $idCol, dim"""

  /** Heaps' law fit: V(n) ≈ k·n^β — vocabulary growth against token count
    * along the doc_id order. The companion diagnostic to [[zipfFit]]
    * (natural text sits near β ≈ 0.4–0.6; template/boilerplate corpora
    * flatten, random noise inflates toward 1) and the estimator behind
    * "how big will the vocab be at 100× the corpus".
    *
    * Construction: each term contributes its FIRST document (min doc_id —
    * one vocab-sized agg), so per-doc new-type counts need no sequential
    * scan; cumulative (tokens, types) per doc then rides the
    * [[Sharding.packShards]] two-level distributed prefix sum (the naive
    * single-window form is the oracle, invisible in the output). OLS of
    * ln V on ln n over per-doc checkpoints with the [[zipfFit]]
    * rounded-DECIMAL fold discipline.
    *
    * Output: one row (n_docs, n_tokens, n_types, beta, ln_k).
    */
  def heapsLaw(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Dedup.parallelize(df).select(col(idCol).cast("long").as("_hl_id"),
      tokens(lower(col(textCol))).as("_hl_ts"))
    val newTypes = base
      .select(col("_hl_id"), explode(col("_hl_ts")).as("_hl_t"))
      .groupBy("_hl_t").agg(min("_hl_id").as("_hl_id"))
      .groupBy("_hl_id").agg(count(lit(1)).as("_hl_new"))
    val perDoc = base
      .select(col("_hl_id"), size(col("_hl_ts")).cast("long").as("_hl_tok"))
      .join(newTypes, Seq("_hl_id"), "left")
      .select(col("_hl_id"), col("_hl_tok"),
        coalesce(col("_hl_new"), lit(0L)).as("_hl_new"))
    // two-level inclusive prefix sums over the doc axis (packShards shape).
    // The id span comes from BASE, not perDoc: the values are identical
    // (left join keeps every base id) but perDoc would drag the whole
    // explode+vocab pipeline through this eager scalar job, while base
    // prunes to a bare id-column scan
    val Array(minId, maxId) = base.agg(min("_hl_id"), max("_hl_id")).head() match {
      case r if r.isNullAt(0) => Array(0L, 0L)
      case r                  => Array(r.getLong(0), r.getLong(1))
    }
    val width = ((BigInt(maxId) - BigInt(minId)) / buckets + 1).toLong
    val minBucket = Math.floorDiv(minId, width)
    def floorDiv(name: String): Column =
      expr(s"$name DIV ${width}L") -
        when(col(name) % width =!= 0 && col(name) < 0, lit(1L)).otherwise(lit(0L))
    val bucketed = perDoc.withColumn("_hl_b", floorDiv("_hl_id") - minBucket)
    val inB = Window.partitionBy("_hl_b").orderBy("_hl_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("_hl_ltok", sum("_hl_tok").over(inB))
      .withColumn("_hl_lnew", sum("_hl_new").over(inB))
    val exB = Window.orderBy("_hl_b").rowsBetween(Window.unboundedPreceding, -1)
    val offs = bucketed.groupBy("_hl_b")
      .agg(sum("_hl_tok").as("_bt"), sum("_hl_new").as("_bn"))
      .select(col("_hl_b"),
        coalesce(sum(col("_bt")).over(exB), lit(0L)).as("_hl_otok"),
        coalesce(sum(col("_bn")).over(exB), lit(0L)).as("_hl_onew"))
    val xy = local.join(broadcast(offs), "_hl_b")
      .select((col("_hl_otok") + col("_hl_ltok")).as("_ct"),
        (col("_hl_onew") + col("_hl_lnew")).as("_cv"))
      .where(col("_ct") > 0 && col("_cv") > 0)
      .select(col("_ct"), col("_cv"),
        round(log(col("_ct").cast("double")), 6).as("x"),
        round(log(col("_cv").cast("double")), 6).as("y"))
    def s(c: Column): Column = sum(round(c, 8).cast("decimal(28,8)")).cast("double")
    xy.agg(count(lit(1)).as("n_docs"),
        max(col("_ct")).as("n_tokens"), max(col("_cv")).as("n_types"),
        s(col("x")).as("_sx"), s(col("y")).as("_sy"),
        s(col("x") * col("y")).as("_sxy"), s(col("x") * col("x")).as("_sxx"))
      .select(col("n_docs"), col("n_tokens"), col("n_types"),
        round((col("_sxy") - col("_sx") * col("_sy") / col("n_docs")) /
          (col("_sxx") - col("_sx") * col("_sx") / col("n_docs")), 4).as("beta"),
        round(col("_sy") / col("n_docs") -
          ((col("_sxy") - col("_sx") * col("_sy") / col("n_docs")) /
           (col("_sxx") - col("_sx") * col("_sx") / col("n_docs"))) *
            (col("_sx") / col("n_docs")), 4).as("ln_k"))
  }

  /** DuckDB mirror of [[heapsLaw]] — the naive single-window cumulative
    * form; the distributed decomposition must be invisible in the output.
    */
  def heapsLawSql(tbl: String, idCol: String, textCol: String): String =
    s"""WITH d AS (SELECT $idCol AS id,
             CAST(len(string_split_regex(trim(lower($textCol)), '\\s+')) AS BIGINT) AS tok
           FROM $tbl),
       nt AS (SELECT id, COUNT(*) AS nw FROM (
                SELECT term, MIN(id) AS id FROM (
                  SELECT $idCol AS id,
                    unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term
                  FROM $tbl) GROUP BY term) GROUP BY id),
       p AS (SELECT d.id,
               SUM(d.tok) OVER (ORDER BY d.id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
               SUM(COALESCE(nt.nw, 0)) OVER (ORDER BY d.id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
             FROM d LEFT JOIN nt ON nt.id = d.id),
       xy AS (SELECT ct, cv,
                round(ln(CAST(ct AS DOUBLE)), 6) AS x,
                round(ln(CAST(cv AS DOUBLE)), 6) AS y
              FROM p WHERE ct > 0 AND cv > 0),
       a AS (SELECT COUNT(*) AS n,
               CAST(MAX(ct) AS BIGINT) AS n_tokens, CAST(MAX(cv) AS BIGINT) AS n_types,
               CAST(SUM(CAST(round(x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(round(y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(round(x*y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(round(x*x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx
             FROM xy)
       SELECT n AS n_docs, n_tokens, n_types,
         round((sxy - sx*sy/n) / (sxx - sx*sx/n), 4) AS beta,
         round(sy/n - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * (sx/n), 4) AS ln_k
       FROM a"""

  /** Perplexity-quartile curriculum buckets over [[unigramLogprob]]: docs
    * are banded by exact avg-nll quartile breakpoints (the `value_bands`
    * percentile-broadcast discipline — one tiny breaks row broadcast over
    * the scored relation, NOT a global ntile window, whose single ORDER BY
    * partition cannot be split at corpus scale; the mergeable
    * log-histogram sketch is the approximate 100 TB route when exactness
    * isn't required). Per-bucket doc/token mass is what a curriculum
    * mixer feeds on.
    */
  def pplBuckets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // both consumers (breakpoint agg + banding scan) read the scored
    // relation: materialize it ONCE — it is doc-count-sized (id, n_toks,
    // avg_nll), tiny next to the exploded corpus text that produces it,
    // and without this the whole LM-scoring subtree runs twice
    val scored = unigramLogprob(df, idCol, textCol).localCheckpoint()
    // one array-percentile buffer, not three (same values: the array form
    // evaluates the identical interpolation per fraction off one sort)
    val breaks = scored
      .agg(expr("percentile(avg_nll, array(0.25, 0.5, 0.75))").as("_p"))
      .select(
        round(col("_p").getItem(0), 4).as("p25"),
        round(col("_p").getItem(1), 4).as("p50"),
        round(col("_p").getItem(2), 4).as("p75"))
    scored.crossJoin(broadcast(breaks))
      .select(
        when(col("avg_nll") < col("p25"), "q1")
          .when(col("avg_nll") < col("p50"), "q2")
          .when(col("avg_nll") < col("p75"), "q3")
          .otherwise("q4").as("bucket"),
        col("n_toks"), col("avg_nll"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_toks").as("n_tokens"),
        round(min("avg_nll"), 4).as("min_nll"),
        round(max("avg_nll"), 4).as("max_nll"))
      .orderBy("bucket")
  }

  /** DuckDB mirror of [[pplBuckets]] over the `unigram_logprob` oracle CTE. */
  def pplBucketsSql(scoredCte: String): String =
    s"""WITH scored AS ($scoredCte),
       b AS (SELECT round(quantile_cont(avg_nll, 0.25), 4) AS p25,
               round(quantile_cont(avg_nll, 0.5), 4) AS p50,
               round(quantile_cont(avg_nll, 0.75), 4) AS p75 FROM scored)
       SELECT CASE WHEN avg_nll < p25 THEN 'q1'
                   WHEN avg_nll < p50 THEN 'q2'
                   WHEN avg_nll < p75 THEN 'q3' ELSE 'q4' END AS bucket,
         COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         round(min(avg_nll), 4) AS min_nll, round(max(avg_nll), 4) AS max_nll
       FROM scored CROSS JOIN b GROUP BY bucket ORDER BY bucket"""

  /** Per-source vocabulary coverage curve: the share of a source's token
    * mass covered by its top-100/1k/10k most frequent types — the
    * tokenizer-budget sizing readout (how small a vocab still covers X%
    * of source tokens; compare across sources to spot template storms,
    * which cover ~everything with a handful of types).
    *
    * Shape: the [[zipfFit]] discipline — one (source, type) count agg,
    * ONE source-partitioned rank window (vocabulary-sized partitions),
    * conditional sums per cutoff (no cumulative scan), bounded output.
    * Coverage divides exact integer sums once in double, round 6.
    */
  def vocabCoverage(df: DataFrame, sourceCol: String, textCol: String,
      cutoffs: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(cutoffs.nonEmpty && cutoffs == cutoffs.sorted, "sorted cutoffs")
    val types = Dedup.parallelize(df)
      .select(col(sourceCol).as("_vc_s"),
        explode(tokens(lower(col(textCol)))).as("_vc_t"))
      .groupBy("_vc_s", "_vc_t").agg(count(lit(1)).as("_vc_f"))
    val w = Window.partitionBy("_vc_s")
      .orderBy(col("_vc_f").desc, col("_vc_t").asc)
    val ranked = types.withColumn("_vc_r", row_number().over(w))
    val covCols = cutoffs.map(n =>
      round(sum(when(col("_vc_r") <= n, col("_vc_f")).otherwise(0L)).cast("double") /
        sum(col("_vc_f")).cast("double"), 6).as(s"cov_$n"))
    ranked.groupBy(col("_vc_s").as(sourceCol))
      .agg(count(lit(1)).as("n_types"), covCols: _*)
      .orderBy(sourceCol)
  }

  /** DuckDB mirror of [[vocabCoverage]]. */
  def vocabCoverageSql(tbl: String, sourceCol: String, textCol: String,
      cutoffs: Seq[Int] = Seq(100, 1000, 10000)): String = {
    val covs = cutoffs.map(n =>
      s"""round(CAST(SUM(CASE WHEN r <= $n THEN f ELSE 0 END) AS DOUBLE)
          / CAST(SUM(f) AS DOUBLE), 6) AS cov_$n""").mkString(",\n         ")
    s"""WITH t AS (SELECT $sourceCol AS s,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS term
           FROM $tbl),
       f AS (SELECT s, term, COUNT(*) AS f FROM t GROUP BY 1, 2),
       r AS (SELECT s, f,
               row_number() OVER (PARTITION BY s ORDER BY f DESC, term) AS r
             FROM f)
       SELECT s AS $sourceCol, COUNT(*) AS n_types,
         $covs
       FROM r GROUP BY s ORDER BY $sourceCol"""
  }

  // --- degenerate-loop detection --------------------------------------------

  /** Generation-loop detector: the longest run of CONSECUTIVE identical
    * n-grams per document — the signature of degenerate model output
    * ("the the the…", looped phrases) that [[repetitionStats]]' global
    * dup-fraction can miss (a doc can repeat a trigram 40× scattered
    * without ever looping). Classic gaps-and-islands over the positional
    * shingle stream: change-flag via lag, run ids via a prefix sum, run
    * lengths via one count — every window PARTITIONED BY doc, so the shape
    * is embarrassingly parallel at any corpus size.
    */
  def loopDetector(df0: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minRun: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol)
    val grams = Dedup.parallelize(df0)
      .select(id, posexplode(
        graft.functions.MinHashExpr.shinglesArray(lower(col(textCol)), n))
        .as(Seq("pos", "gram")))
    val w = Window.partitionBy(id).orderBy("pos")
    val chg = when(lag(col("gram"), 1).over(w).isNull ||
      lag(col("gram"), 1).over(w) =!= col("gram"), 1L).otherwise(0L)
    grams
      .withColumn("rid", sum(chg).over(w))
      .groupBy(id, col("rid")).agg(count(lit(1)).as("rl"))
      .groupBy(id).agg(max(col("rl")).as("max_run"))
      .withColumn("looped", col("max_run") >= minRun)
      .orderBy(idCol)
  }

  /** DuckDB mirror of [[loopDetector]] over `textExpr` (same shingle rule
    * as the near-dup CTEs: <n tokens → one whole-string gram). */
  def loopDetectorSql(tbl: String, idCol: String, textExpr: String,
      n: Int = 3, minRun: Int = 3): String =
    s"""WITH w AS (SELECT $idCol, string_split_regex(trim(lower($textExpr)),'\\s+') AS ws FROM $tbl),
       g AS (SELECT $idCol, i AS pos,
           CASE WHEN len(ws) >= $n
                THEN ${(0 until n).map(k => s"ws[i+$k]").mkString(" || ' ' || ")}
                ELSE array_to_string(ws, ' ') END AS gram
         FROM w, UNNEST(range(1, CASE WHEN len(ws) >= $n THEN len(ws) - ${n - 2} ELSE 2 END)) AS t(i)),
       r AS (SELECT $idCol, pos, gram,
           CASE WHEN lag(gram) OVER (PARTITION BY $idCol ORDER BY pos)
                     IS DISTINCT FROM gram THEN 1 ELSE 0 END AS chg
         FROM g),
       runs AS (SELECT $idCol, gram,
           SUM(chg) OVER (PARTITION BY $idCol ORDER BY pos) AS rid FROM r),
       rl AS (SELECT $idCol, rid, COUNT(*) AS rl FROM runs GROUP BY 1, 2)
       SELECT $idCol, MAX(rl) AS max_run, MAX(rl) >= $minRun AS looped
       FROM rl GROUP BY $idCol ORDER BY $idCol"""

  // --- quality-gate funnel --------------------------------------------------

  /** Quality-gate FUNNEL: how many documents survive each successive gate —
    * the attrition table a pipeline review reads before touching any gate
    * threshold. Gates are cumulative (a doc is counted at stage k only if
    * it passed 0..k−1), each a codegen'd predicate in ONE corpus scan:
    * stage sums are `sum(when(...))` aggregates, so the funnel costs one
    * pass regardless of gate count.
    */
  def qualityFunnel(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val t = col(textCol)
    val g1 = tokenCount(t) >= 20
    val g2 = g1 && punctCount(t).cast("double") / greatest(length(t), lit(1)).cast("double") < 0.1
    val g3 = g2 && col(langCol) === "en"
    val agg = df.agg(
      count(lit(1)).as("n0"),
      sum(when(g1, 1L).otherwise(0L)).as("n1"),
      sum(when(g2, 1L).otherwise(0L)).as("n2"),
      sum(when(g3, 1L).otherwise(0L)).as("n3"))
    agg.select(explode(array(
      struct(lit(0).as("stage"), lit("all").as("gate"), col("n0").as("n_docs"), col("n0").as("prev")),
      struct(lit(1).as("stage"), lit("tok_ge_20").as("gate"), col("n1").as("n_docs"), col("n0").as("prev")),
      struct(lit(2).as("stage"), lit("+punct_lt_10pct").as("gate"), col("n2").as("n_docs"), col("n1").as("prev")),
      struct(lit(3).as("stage"), lit("+lang_en").as("gate"), col("n3").as("n_docs"), col("n2").as("prev"))
    )).as("s"))
      .select(col("s.stage").as("stage"), col("s.gate").as("gate"),
        col("s.n_docs").as("n_docs"),
        round(col("s.n_docs").cast("double") /
          greatest(col("s.prev"), lit(1L)).cast("double"), 6).as("pass_rate"))
      .orderBy("stage")
  }

  /** DuckDB mirror of [[qualityFunnel]]. */
  def qualityFunnelSql(tbl: String, idCol: String, textCol: String,
      langCol: String): String = {
    val tok = s"len(string_split_regex(trim($textCol), '\\s+'))"
    val punct = s"(length($textCol) - length(regexp_replace($textCol, '[.!?,;:]', '', 'g')))"
    val g1 = s"$tok >= 20"
    val g2 = s"$g1 AND CAST($punct AS DOUBLE) / CAST(greatest(length($textCol), 1) AS DOUBLE) < 0.1"
    val g3 = s"$g2 AND $langCol = 'en'"
    s"""WITH a AS (SELECT COUNT(*) AS n0,
           CAST(SUM(CASE WHEN $g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN $g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN $g3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
         FROM $tbl)
       SELECT stage, gate, n_docs,
         round(CAST(n_docs AS DOUBLE) / CAST(greatest(prev, 1) AS DOUBLE), 6) AS pass_rate
       FROM (
         SELECT 0 AS stage, 'all' AS gate, n0 AS n_docs, n0 AS prev FROM a
         UNION ALL SELECT 1, 'tok_ge_20', n1, n0 FROM a
         UNION ALL SELECT 2, '+punct_lt_10pct', n2, n1 FROM a
         UNION ALL SELECT 3, '+lang_en', n3, n2 FROM a)
       ORDER BY stage"""
  }

  // --- encoding-quality / mojibake audit ------------------------------------

  /** The classic UTF-8-decoded-as-Latin-1 signatures: a stray 'Ã' or the
    * 'â€¦'-family digraph opener followed by anything. */
  val MojibakeRe = "Ã.|â€."

  /** C0 control characters (minus \t\n\r, legitimate in text) + DEL. */
  val CtrlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Per-doc encoding-quality audit — the byte-level corruption gate a crawl
    * pipeline runs before any token-level scoring (script_profile sees
    * script MIX; this sees decode DAMAGE the script histogram can't):
    *
    *   - `n_repl`   U+FFFD replacement characters (a decoder already gave up)
    *   - `n_moji`   mojibake signatures (UTF-8 bytes re-decoded as Latin-1:
    *                'Ã·'/'â€¦' digraphs — the most common crawl corruption)
    *   - `n_ctrl`   C0 control chars (minus tab/newline/CR) + DEL
    *   - `suspect`  any of the above — the drop/re-decode routing flag
    *
    * Everything is a codegen'd length/regexp expression inside the scan —
    * one pass, no shuffle; per-doc rows keep it a filter input, not a
    * report. Counts are exact so the oracle is bit-for-bit.
    */
  def mojibakeScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nRepl = (length(t) - length(replace(t, lit("�"), lit("")))).cast("long")
    val nMoji = size(regexp_extract_all(t, lit(MojibakeRe), lit(0))).cast("long")
    val nCtrl = (length(t) - length(regexp_replace(t, CtrlRe, ""))).cast("long")
    df.select(col(idCol), nRepl.as("n_repl"), nMoji.as("n_moji"), nCtrl.as("n_ctrl"))
      .withColumn("suspect",
        col("n_repl") > 0 || col("n_moji") > 0 || col("n_ctrl") > 0)
      .orderBy(idCol)
  }

  /** DuckDB mirror of [[mojibakeScan]] over the same text expression. */
  def mojibakeScanSql(tbl: String, idCol: String, textExpr: String): String =
    s"""SELECT $idCol,
         CAST(length($textExpr) - length(replace($textExpr, chr(65533), '')) AS BIGINT) AS n_repl,
         CAST(len(regexp_extract_all($textExpr, '${MojibakeRe}')) AS BIGINT) AS n_moji,
         CAST(length($textExpr) - length(regexp_replace($textExpr, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')) AS BIGINT) AS n_ctrl,
         (length($textExpr) - length(replace($textExpr, chr(65533), '')) > 0
          OR len(regexp_extract_all($textExpr, '${MojibakeRe}')) > 0
          OR length($textExpr) - length(regexp_replace($textExpr, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')) > 0) AS suspect
       FROM $tbl ORDER BY $idCol"""

  /** Simpson concentration / diversity of the per-group token distribution
    * (Simpson 1949): λ = Σ nᵢ(nᵢ−1) / (N(N−1)) — the probability two
    * tokens drawn WITHOUT replacement are the same type — and its inverse,
    * the "effective vocabulary" (Hill number of order 2). The pair with
    * [[tokenEntropy]]'s Shannon view: entropy weights rare types, inverse
    * Simpson is dominated by the head, so the two diverge exactly when a
    * corpus slice is head-heavy — the mode-collapse signature.
    *
    * Exactness: everything is integer until TWO final divisions — the pair
    * counts fold as DECIMAL(38,0) (nᵢ up to 10¹⁸ before the product
    * saturates, far past any real shard), so unlike a double Σpᵢ² there is
    * no float-order dependence and no catastrophic cancellation for
    * near-uniform distributions.
    */
  def simpsonDiversity(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val counts = Dedup.parallelize(df)
      .select(col(groupCol).as("_sd_g"),
        explode(tokens(trim(lower(col(textCol))))).as("_sd_t"))
      .groupBy("_sd_g", "_sd_t").agg(count(lit(1)).as("n"))
    def d(c: Column) = c.cast("double")
    val nDec = col("n").cast("decimal(19,0)")
    counts.groupBy("_sd_g")
      .agg(count(lit(1)).as("vocab"),
        sum(col("n")).as("n_tokens"),
        sum((nDec * (nDec - lit(1))).cast("decimal(38,0)")).as("pairs"))
      .select(col("_sd_g").as(groupCol), col("vocab"), col("n_tokens"),
        col("pairs").cast("long").as("pair_matches"),
        round(d(col("pairs")) /
          (d(col("n_tokens")) * d(col("n_tokens") - lit(1))), 6).as("simpson"),
        round((d(col("n_tokens")) * d(col("n_tokens") - lit(1))) /
          d(col("pairs")), 4).as("inv_simpson"))
      .orderBy(groupCol)
  }

  /** DuckDB mirror of [[simpsonDiversity]]. */
  def simpsonDiversitySql(tbl: String, groupCol: String,
      textCol: String): String =
    s"""WITH c AS (SELECT $groupCol AS g, term, COUNT(*) AS n FROM (
           SELECT $groupCol, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
           FROM $tbl)
         GROUP BY 1, 2),
       agg AS (SELECT g, COUNT(*) AS vocab, SUM(n) AS n_tokens,
           SUM(CAST(CAST(n AS DECIMAL(19,0)) * (CAST(n AS DECIMAL(19,0)) - 1) AS DECIMAL(38,0))) AS pairs
         FROM c GROUP BY g)
       SELECT g AS $groupCol, CAST(vocab AS BIGINT) AS vocab,
         CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(pairs AS BIGINT) AS pair_matches,
         round(CAST(pairs AS DOUBLE)
           / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)), 6) AS simpson,
         round((CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE))
           / CAST(pairs AS DOUBLE), 4) AS inv_simpson
       FROM agg ORDER BY $groupCol"""

  /** Per-document CHARACTER entropy (bits/char) — the byte-level quality
    * signal below [[tokenEntropy]]'s word view: binary junk, base64 blobs
    * and single-char floods all shift it while leaving token counts
    * plausible. One regexp explode into the (doc, char) type table;
    * per-term −p·ln p rounded to 9 then DECIMAL-summed (the
    * [[entropyRate]] fold discipline), one division to bits.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // row-local bag stats ([[graft.functions.CharEntropyStatsExpr]],
    // equality-pinned by EntropyStatsSpec): replaces the exploded (doc,
    // char) relation + per-(doc, char) count + per-doc join/fold — three
    // corpus-character-sized stages — with one struct per doc. `n > 0`
    // reproduces the explode semantics (a doc whose text has no
    // '.'-matchable chars was absent)
    // explode(array(...)) wraps the single struct in a Generate: a plain
    // `_ce.n > 0` filter was pushed below the projection and evaluated the
    // bag fold twice per row; a filter on generator output cannot sink
    // below the Generate, so the expression runs exactly once
    val st = Dedup.parallelize(df)
      .select(col(idCol),
        explode(array(
          graft.functions.EntropyStatsExpr.charEntropyStats(col(textCol)))).as("_ce"))
      .where(col("_ce.n") > 0)
    st.select(col(idCol), col("_ce.charset").as("charset"),
        col("_ce.n").as("n_chars"),
        round((-col("_ce.s")).cast("double") / lit(math.log(2.0)), 6)
          .as("entropy_bits"))
      .orderBy(idCol)
  }

  /** DuckDB mirror of [[charEntropy]] — chars via regexp '.', identical
    * term shape. ln(2) is written as ln(2.0) in BOTH engines (same libm
    * double), never a decimal constant.
    */
  def charEntropySql(tbl: String, idCol: String, textCol: String): String =
    s"""WITH ch AS (SELECT $idCol, unnest(regexp_extract_all($textCol, '.')) AS c0
           FROM $tbl),
       counts AS (SELECT $idCol, c0, COUNT(*) AS c FROM ch GROUP BY 1, 2),
       per AS (SELECT $idCol, COUNT(*) AS charset, SUM(c) AS n FROM counts GROUP BY 1)
       SELECT counts.$idCol, MAX(charset) AS charset,
         CAST(MAX(n) AS BIGINT) AS n_chars,
         round(CAST(-SUM(CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
             * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DOUBLE)
           / ln(2.0), 6) AS entropy_bits
       FROM counts JOIN per USING ($idCol)
       GROUP BY counts.$idCol ORDER BY counts.$idCol"""

  /** Moving-Average Type-Token Ratio (Covington & McFall, JQL 2010):
    * lexical diversity that — unlike raw TTR — does not shrink with
    * document length, because it averages the type ratio over fixed
    * non-overlapping windows of `w` tokens (partial trailing windows are
    * dropped; only same-length windows are comparable). Integer-exact to
    * ONE final division: Σ distinct-counts / (w · windows).
    */
  def mattr(df: DataFrame, idCol: String, textCol: String,
      w: Int = 50): DataFrame = {
    require(w >= 2, s"mattr: window too small: $w")
    val toks = Dedup.parallelize(df)
      .select(col(idCol),
        tokens(trim(lower(col(textCol)))).as("_mt_a"))
      .select(col(idCol), size(col("_mt_a")).as("n_tokens"),
        posexplode(col("_mt_a")).as(Seq("_mt_p", "_mt_t")))
      .withColumn("_mt_w", (col("_mt_p") / w).cast("long"))
    val full = toks.groupBy(col(idCol), col("n_tokens"), col("_mt_w"))
      .agg(count(lit(1)).as("wn"), countDistinct(col("_mt_t")).as("wd"))
      .where(col("wn") === w)
    def d(c: Column) = c.cast("double")
    full.groupBy(col(idCol))
      .agg(max(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_windows"), sum(col("wd")).as("_mt_d"))
      .select(col(idCol), col("n_tokens"), col("n_windows"),
        round(d(col("_mt_d")) / (lit(w.toDouble) * d(col("n_windows"))), 6)
          .as("mattr"))
      .orderBy(idCol)
  }

  /** DuckDB mirror of [[mattr]] — 0-based window index from the 1-based
    * unnest ordinality.
    */
  def mattrSql(tbl: String, idCol: String, textCol: String,
      w: Int = 50): String =
    s"""WITH t AS (SELECT $idCol, len(ws) AS n_tokens,
             unnest(ws) AS tok,
             CAST((unnest(range(1, len(ws) + 1)) - 1) // $w AS BIGINT) AS win
           FROM (SELECT $idCol,
               string_split_regex(trim(lower($textCol)),'\\s+') AS ws FROM $tbl)),
       full_w AS (SELECT $idCol, n_tokens, win,
             COUNT(*) AS wn, COUNT(DISTINCT tok) AS wd
           FROM t GROUP BY 1, 2, 3 HAVING COUNT(*) = $w)
       SELECT $idCol, MAX(n_tokens) AS n_tokens, COUNT(*) AS n_windows,
         round(CAST(SUM(wd) AS DOUBLE) / (${w.toDouble} * CAST(COUNT(*) AS DOUBLE)), 6)
           AS mattr
       FROM full_w GROUP BY $idCol ORDER BY $idCol"""

  /** Burrows's Delta (Burrows, LLC 2002) between per-source token
    * distributions — the stylometric distance: z-score each source's
    * relative frequency of the corpus's top-`k` words against the
    * across-source mean/std, Delta(a,b) = mean |z_a − z_b|. The mixture
    * diagnostic that reads as AUTHORSHIP/register distance where
    * [[graft.operators.Audit]]'s sourceOverlap reads as content overlap.
    *
    * Bounded algebra end to end: the corpus collapses to (source, word)
    * counts for k words; every later relation is sources×k or pairs×k.
    * Relative frequencies round to 9 dp then fold as DECIMAL, so the
    * across-source moments are partition-order-immune; z and |z_a − z_b|
    * are fixed-shape doubles with a final rounded DECIMAL mean.
    */
  def burrowsDelta(df: DataFrame, groupCol: String, textCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 2, s"burrowsDelta: need k >= 2: $k")
    val tok = Dedup.parallelize(df)
      .select(col(groupCol).as("_bd_g"),
        explode(tokens(trim(lower(col(textCol))))).as("_bd_t"))
    // barrier: bySrc feeds srcLen, topK AND the grid join — without it
    // each consumer re-expands the corpus tokenize+explode+agg (measured:
    // a 60-Exchange plan for a 3-exchange dataflow). The relation is the
    // (source × vocabulary) type table — the standard materialization.
    val bySrc = tok.groupBy("_bd_g", "_bd_t").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val srcLen = bySrc.groupBy("_bd_g").agg(sum(col("c")).as("len"))
    val topK = bySrc.groupBy("_bd_t").agg(sum(col("c")).as("cf"))
      .orderBy(col("cf").desc, col("_bd_t")).limit(k)
    // #sources and #profile-words as broadcast ONE-ROW relations, not
    // driver .count() actions — the former eager scalars each re-ran the
    // corpus tokenize+agg as its own job before the real one (3 corpus
    // passes); as relations the whole thing is one job and Catalyst
    // reuses the bySrc exchange across the branches
    val nSrcRel = srcLen.agg(count(lit(1)).as("_bd_ns"))
    val nWordsRel = topK.agg(count(lit(1)).as("_bd_nw"))
    def d(c: Column) = c.cast("double")
    // dense (source × top-k) grid: absent words count zero
    val grid = srcLen.crossJoin(broadcast(topK.select(col("_bd_t"))))
      .join(bySrc, Seq("_bd_g", "_bd_t"), "left")
      .select(col("_bd_g"), col("_bd_t"),
        round(d(coalesce(col("c"), lit(0L))) / d(col("len")), 9)
          .cast("decimal(18,9)").as("f"))
      // barrier: grid feeds moments AND the z projection — (sources × k)
      // rows, trivially bounded
      .localCheckpoint()
    // moments leave DECIMAL via one double division each (never decimal
    // division — the engines' decimal scale rules differ)
    val moments = grid.groupBy("_bd_t")
      .agg(sum(col("f")).as("sf"), sum(col("f") * col("f")).as("sff"))
      .crossJoin(broadcast(nSrcRel))
      .select(col("_bd_t"),
        (d(col("sf")) / d(col("_bd_ns"))).as("mu"),
        col("sff"), col("_bd_ns"))
      .select(col("_bd_t"), col("mu"),
        sqrt(d(col("sff")) / d(col("_bd_ns")) - col("mu") * col("mu"))
          .as("sigma"))
    val z = grid.join(broadcast(moments), "_bd_t")
      .select(col("_bd_g"), col("_bd_t"),
        ((d(col("f")) - col("mu")) / col("sigma")).as("z"))
      // barrier: z self-joins as za × zb — two consumers of the same
      // (sources × k) relation
      .localCheckpoint()
    val za = z.select(col("_bd_g").as("source_a"), col("_bd_t"), col("z").as("za"))
    val zb = z.select(col("_bd_g").as("source_b"), col("_bd_t"), col("z").as("zb"))
    // explicit broadcast: the checkpointed z is a LogicalRDD with no size
    // stats, so the (sources × k)-bounded pair join must be told what the
    // optimizer could previously estimate (PlanAuditSpec pins the
    // BroadcastHashJoin on the word key)
    za.join(broadcast(zb), Seq("_bd_t"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(sum(round(abs(col("za") - col("zb")), 9).cast("decimal(18,9)"))
        .as("_bd_sz"))
      .crossJoin(broadcast(nWordsRel))
      .select(col("source_a"), col("source_b"),
        round(col("_bd_sz").cast("double") / d(col("_bd_nw")), 6).as("delta"))
      .orderBy("source_a", "source_b")
  }

  /** DuckDB mirror of [[burrowsDelta]]. */
  def burrowsDeltaSql(tbl: String, groupCol: String, textCol: String,
      k: Int = 20): String =
    s"""WITH tok AS (SELECT $groupCol AS g,
             unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS t
           FROM $tbl),
       bysrc AS (SELECT g, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       srclen AS (SELECT g, SUM(c) AS len FROM bysrc GROUP BY g),
       nsrc AS (SELECT COUNT(*) AS ns FROM srclen),
       topk AS (SELECT t FROM (SELECT t, SUM(c) AS cf FROM bysrc GROUP BY t)
           ORDER BY cf DESC, t LIMIT $k),
       grid AS (SELECT srclen.g, topk.t,
             CAST(round(CAST(COALESCE(bysrc.c, 0) AS DOUBLE) / CAST(len AS DOUBLE), 9)
               AS DECIMAL(18,9)) AS f
           FROM srclen CROSS JOIN topk
           LEFT JOIN bysrc ON bysrc.g = srclen.g AND bysrc.t = topk.t),
       moments AS (SELECT t, SUM(f) AS sf, SUM(f * f) AS sff FROM grid GROUP BY t),
       sig AS (SELECT t,
             CAST(sf AS DOUBLE) / CAST((SELECT ns FROM nsrc) AS DOUBLE) AS mu,
             sqrt(CAST(sff AS DOUBLE) / CAST((SELECT ns FROM nsrc) AS DOUBLE)
               - (CAST(sf AS DOUBLE) / CAST((SELECT ns FROM nsrc) AS DOUBLE))
                 * (CAST(sf AS DOUBLE) / CAST((SELECT ns FROM nsrc) AS DOUBLE))) AS sigma
           FROM moments),
       z AS (SELECT g, grid.t,
             (CAST(f AS DOUBLE) - mu) / sigma AS z
           FROM grid JOIN sig ON grid.t = sig.t)
       SELECT a.g AS source_a, b.g AS source_b,
         round(CAST(SUM(CAST(round(abs(a.z - b.z), 9) AS DECIMAL(18,9))) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM topk) AS DOUBLE), 6) AS delta
       FROM z a JOIN z b ON a.t = b.t AND a.g < b.g
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Bigram collocations by Dunning's log-likelihood ratio (G², Dunning
    * 1993) — [[sourceKeyness]]'s statistic turned from (source, term)
    * association onto ADJACENT WORD PAIRS: the 2×2 table for (w₁, w₂) is
    * a = c(w₁w₂), row = c(w₁ ·), col = c(· w₂), N = total bigrams. The
    * robust replacement for [[pmiTop]] at low counts (PMI explodes for
    * rare pairs; G² is count-weighted evidence).
    *
    * Shape: bigrams materialize inside the scan projection (the
    * [[cooccurCounts]] zip-shift, no join), then everything folds over
    * the bigram TYPE TABLE; marginal joins are type-keyed. Over-
    * represented pairs only (observed > expected), global top-N by
    * (G² desc, pair) — a TakeOrdered, never a full sort.
    */
  def collocationLlr(df: DataFrame, idCol: String, textCol: String,
      topN: Int = 30): DataFrame = {
    require(topN >= 1, s"collocationLlr: bad topN $topN")
    val ws = tokens(trim(lower(col(textCol))))
    val bigrams = Dedup.parallelize(df)
      .select(explode(zip_with(
        ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .where(col("p.w2").isNotNull) // zip_with pads the shorter side
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("a"))
    val rowT = bigrams.groupBy("w1").agg(sum("a").as("r_tot"))
    val colT = bigrams.groupBy("w2").agg(sum("a").as("c_tot"))
    val grand = bigrams.agg(sum("a").as("n_tot"))
    val cells = bigrams
      .join(rowT.hint("shuffle_hash"), "w1")
      .join(colT.hint("shuffle_hash"), "w2")
      .crossJoin(broadcast(grand))
      .withColumn("b", col("r_tot") - col("a"))
      .withColumn("c", col("c_tot") - col("a"))
      .withColumn("d", col("n_tot") - col("r_tot") - col("c"))
    def term(o: Column, rowTot: Column, colTot: Column, g: Column): Column = {
      val e = rowTot.cast("double") * colTot.cast("double") / g.cast("double")
      when(o > 0, o.cast("double") * log(o.cast("double") / e)).otherwise(lit(0.0))
    }
    val g2 = lit(2.0) * (
      term(col("a"), col("r_tot"), col("c_tot"), col("n_tot")) +
      term(col("b"), col("r_tot"), col("n_tot") - col("c_tot"), col("n_tot")) +
      term(col("c"), col("n_tot") - col("r_tot"), col("c_tot"), col("n_tot")) +
      term(col("d"), col("n_tot") - col("r_tot"), col("n_tot") - col("c_tot"), col("n_tot")))
    cells
      .where(col("a").cast("double") * col("n_tot").cast("double") >
        col("r_tot").cast("double") * col("c_tot").cast("double"))
      .select(col("w1"), col("w2"), col("a").as("n"), round(g2, 4).as("g2"))
      .orderBy(col("g2").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** DuckDB mirror of [[collocationLlr]]. */
  def collocationLlrSql(tbl: String, idCol: String, textCol: String,
      topN: Int = 30): String =
    s"""WITH w AS (SELECT string_split_regex(trim(lower($textCol)),'\\s+') AS ws
           FROM $tbl),
       bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2, COUNT(*) AS a FROM w,
           UNNEST(range(1, greatest(len(ws), 1))) AS u(i)
         GROUP BY 1, 2),
       rt AS (SELECT w1, SUM(a) AS r_tot FROM bg GROUP BY w1),
       ct AS (SELECT w2, SUM(a) AS c_tot FROM bg GROUP BY w2),
       g AS (SELECT SUM(a) AS n_tot FROM bg),
       cells AS (SELECT w1, w2, a, r_tot, c_tot, n_tot,
           r_tot - a AS b, c_tot - a AS c, n_tot - r_tot - (c_tot - a) AS d
         FROM bg JOIN rt USING (w1) JOIN ct USING (w2) CROSS JOIN g)
       SELECT w1, w2, CAST(a AS BIGINT) AS n,
         round(2.0 * (
           (CASE WHEN a > 0 THEN a * ln(a / (CAST(r_tot AS DOUBLE) * c_tot / n_tot)) ELSE 0 END) +
           (CASE WHEN b > 0 THEN b * ln(b / (CAST(r_tot AS DOUBLE) * (n_tot - c_tot) / n_tot)) ELSE 0 END) +
           (CASE WHEN c > 0 THEN c * ln(c / (CAST(n_tot - r_tot AS DOUBLE) * c_tot / n_tot)) ELSE 0 END) +
           (CASE WHEN d > 0 THEN d * ln(d / (CAST(n_tot - r_tot AS DOUBLE) * (n_tot - c_tot) / n_tot)) ELSE 0 END)
         ), 4) AS g2
       FROM cells
       WHERE CAST(a AS DOUBLE) * n_tot > CAST(r_tot AS DOUBLE) * c_tot
       ORDER BY g2 DESC, w1, w2 LIMIT $topN"""

  /** Yule's characteristic K (Yule 1944) per source: the repeat-rate
    * constant 10⁴·(Σm²·V_m − N)/N² over the frequency-of-frequencies
    * spectrum — a length-INVARIANT vocabulary-richness number where raw
    * TTR shrinks with corpus size (that invariance is the whole point:
    * sources of different volumes become comparable). High K = heavy
    * word reuse (template/boilerplate prose), low K = lexically rich.
    * Complements [[heapsLaw]] (growth exponent) and MATTR (windowed):
    * one constant per source, no fitting.
    *
    * Two aggs over the per-source type table (term → m), then the
    * m-bounded spectrum; integer throughout until the final ratio.
    */
  def yuleK(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val tf = Dedup.parallelize(df)
      .select(col(sourceCol).as("src"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("src", "term").agg(count(lit(1)).as("m"))
    val spec = tf.groupBy(col("src"), col("m")).agg(count(lit(1)).as("vm"))
    spec.groupBy("src")
      .agg(sum(col("m") * col("vm")).as("n_tokens"),
        sum(col("vm")).as("v_types"),
        sum(col("m") * col("m") * col("vm")).as("smm"))
      .select(col("src").as(sourceCol), col("n_tokens"), col("v_types"),
        round(lit(1e4) * (d(col("smm")) - d(col("n_tokens"))) /
          (d(col("n_tokens")) * d(col("n_tokens"))), 4).as("yule_k"))
      .orderBy(sourceCol)
  }

  /** DuckDB mirror of [[yuleK]]. */
  def yuleKSql(tbl: String, sourceCol: String, textCol: String): String =
    s"""WITH tf AS (SELECT $sourceCol AS src, term, COUNT(*) AS m FROM (
           SELECT $sourceCol, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
           FROM $tbl) GROUP BY 1, 2),
       spec AS (SELECT src, m, COUNT(*) AS vm FROM tf GROUP BY 1, 2),
       agg AS (SELECT src, CAST(SUM(m * vm) AS BIGINT) AS n_tokens,
           CAST(SUM(vm) AS BIGINT) AS v_types,
           CAST(SUM(m * m * vm) AS BIGINT) AS smm
         FROM spec GROUP BY 1)
       SELECT src AS $sourceCol, n_tokens, v_types,
         round(1e4 * (CAST(smm AS DOUBLE) - n_tokens)
           / (CAST(n_tokens AS DOUBLE) * n_tokens), 4) AS yule_k
       FROM agg ORDER BY $sourceCol"""

  /** Log-odds keyness with an informative Dirichlet prior (Monroe,
    * Colaresi & Quinn 2008, "Fightin' Words") between the md5-half
    * corpus snapshots: δ_w = logit difference of w's rate in the two
    * halves after shrinking both toward the pooled corpus rate (prior
    * mass α₀ spread ∝ corpus frequency), z = δ/√(1/(y₁+α_w) + 1/(y₂+α_w)).
    * The prior is what fixes raw log-odds' pathology — rare words no
    * longer dominate the top ranks on noise — which is exactly the
    * failure mode of unregularized keyness lists; the G² board query
    * ([[sourceKeyness]]) ranks by evidence, this ranks by SHRUNKEN
    * effect with a per-word z. Top-N by |z|.
    *
    * One explode to the (half, term) type table; totals broadcast;
    * TakeOrdered top-N (ties by term).
    */
  def logoddsKeyness(df: DataFrame, idCol: String, textCol: String,
      topN: Int = 20, alpha0: Double = 1000.0): DataFrame = {
    def d(c: Column) = c.cast("double")
    val half = conv(substring(md5(concat(lit("half:"),
      col(idCol).cast("string"))), 1, 2), 16, 10).cast("int") % 2
    val st = Dedup.parallelize(df)
      .select(half.as("h"), explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(sum(when(col("h") === 0, 1L).otherwise(0L)).as("y1"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("y2"))
    val tot = st.agg(sum(col("y1")).as("n1"), sum(col("y2")).as("n2"))
    val j = st.crossJoin(broadcast(tot))
    val g = d(col("n1")) + d(col("n2"))
    val aw = lit(alpha0) * (d(col("y1")) + d(col("y2"))) / g
    def lo(y: Column, n: Column) =
      log((d(y) + aw) / (d(n) + lit(alpha0) - d(y) - aw))
    val delta = lo(col("y1"), col("n1")) - lo(col("y2"), col("n2"))
    val sigma = sqrt(lit(1.0) / (d(col("y1")) + aw) +
      lit(1.0) / (d(col("y2")) + aw))
    j.select(col("term"), col("y1"), col("y2"),
        round(delta, 6).as("delta"),
        round(delta / sigma, 4).as("z"))
      .orderBy(abs(col("z")).desc, col("term").asc)
      .limit(topN)
  }

  /** DuckDB mirror of [[logoddsKeyness]]. */
  def logoddsKeynessSql(tbl: String, idCol: String, textCol: String,
      topN: Int = 20, alpha0: Double = 1000.0): String =
    s"""WITH st AS (SELECT term,
           CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS y1,
           CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS y2
         FROM (SELECT
             CAST('0x'||substr(md5('half:'||CAST($idCol AS VARCHAR)),1,2) AS INT) % 2 AS h,
             unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
           FROM $tbl) GROUP BY term),
       tot AS (SELECT CAST(SUM(y1) AS BIGINT) AS n1,
           CAST(SUM(y2) AS BIGINT) AS n2 FROM st),
       f AS (SELECT term, y1, y2,
           $alpha0 * (CAST(y1 AS DOUBLE) + y2)
             / (CAST(n1 AS DOUBLE) + n2) AS aw,
           CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
         FROM st CROSS JOIN tot),
       g2 AS (SELECT term, y1, y2,
           ln((CAST(y1 AS DOUBLE) + aw) / (n1d + $alpha0 - y1 - aw))
             - ln((CAST(y2 AS DOUBLE) + aw) / (n2d + $alpha0 - y2 - aw)) AS delta,
           sqrt(1.0 / (CAST(y1 AS DOUBLE) + aw)
             + 1.0 / (CAST(y2 AS DOUBLE) + aw)) AS sigma
         FROM f)
       SELECT term, y1, y2, round(delta, 6) AS delta,
         round(delta / sigma, 4) AS z
       FROM g2 ORDER BY abs(round(delta / sigma, 4)) DESC, term ASC
       LIMIT $topN"""

  /** Term burstiness (Church & Gale 1995): observed document frequency
    * vs the Poisson expectation E[df] = D·(1 − e^(−cf/D)) for a term
    * scattered independently at its corpus rate. ratio << 1 = the term
    * CLUMPS into few documents (topical/boilerplate; a great dedup or
    * topic signal), ratio ≈ 1 = function-word-like spread. Reports the
    * `topN` most bursty terms above a frequency floor — the term-level
    * diagnostic [[sourceKeyness]]'s source-level contrasts can't give.
    *
    * One explode → (term, cf, df) type-table agg; corpus doc count
    * broadcast; TakeOrdered top-N, ties by term.
    */
  def termBurstiness(df: DataFrame, idCol: String, textCol: String,
      minCf: Long = 20, topN: Int = 20): DataFrame = {
    def d(c: Column) = c.cast("double")
    val dTot = df.agg(count(lit(1)).as("n_docs"))
    val stats = Dedup.parallelize(df)
      .select(col(idCol),
        explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cf"), countDistinct(col(idCol)).as("df"))
      .where(col("cf") >= minCf)
    stats.crossJoin(broadcast(dTot))
      .select(col("term"), col("cf"), col("df"), col("n_docs"),
        round(d(col("n_docs")) *
          (lit(1.0) - exp(-d(col("cf")) / d(col("n_docs")))), 4)
          .as("expected_df"))
      .withColumn("burstiness",
        round(d(col("df")) / col("expected_df"), 6))
      .orderBy(col("burstiness").asc, col("term").asc)
      .limit(topN)
  }

  /** DuckDB mirror of [[termBurstiness]]. */
  def termBurstinessSql(tbl: String, idCol: String, textCol: String,
      minCf: Long = 20, topN: Int = 20): String =
    s"""WITH dt AS (SELECT COUNT(*) AS n_docs FROM $tbl),
       st AS (SELECT term, COUNT(*) AS cf,
           COUNT(DISTINCT $idCol) AS df FROM (
           SELECT $idCol, unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS term
           FROM $tbl) GROUP BY 1 HAVING COUNT(*) >= $minCf),
       f AS (SELECT term, cf, df, n_docs,
           round(CAST(n_docs AS DOUBLE)
             * (1.0 - exp(-CAST(cf AS DOUBLE) / n_docs)), 4) AS expected_df
         FROM st CROSS JOIN dt)
       SELECT term, cf, df, n_docs, expected_df,
         round(CAST(df AS DOUBLE) / expected_df, 6) AS burstiness
       FROM f ORDER BY burstiness ASC, term ASC LIMIT $topN"""
}
