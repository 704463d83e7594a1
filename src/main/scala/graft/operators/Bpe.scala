package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the merge-table
  * construction a training-data pipeline runs corpus-wide before it can
  * tokenize anything.
  *
  * The working set is the key scale fact: BPE trains on the WORD VOCABULARY
  * (word, freq), not the corpus — one corpus-sized aggregation up front,
  * then every merge step runs over a vocabulary-sized table. Each step is
  * (a) a pair-count aggregation (one-pass symbol 2-grams via the shared
  * [[graft.functions.MinHashExpr.shinglesArray]] expression, hash-partitioned
  * sum), (b) an argmax of ONE row collected to the driver (freq desc, pair
  * asc tie-break), and (c) a scan-only merge application. At 100 TB the
  * vocab table is millions of rows against a corpus of trillions — the
  * steps are cheap; the one corpus pass dominates, exactly like the
  * reference tokenizer trainers (fastBPE/subword-nmt, whose doubled-
  * separator merge trick `applyMerge` reuses).
  *
  * The merge application is pure string algebra (`replace`/`regexp_replace`
  * with identical semantics in Spark and DuckDB), so the ENTIRE training
  * loop unrolls into a generated oracle CTE chain — per-step best pairs are
  * data-dependent and come from scalar subqueries, not interpolation. The
  * vocabulary is restricted to lowercase-alnum words: deterministic under
  * both regex engines (RE2 vs java.util.regex differ only outside this
  * class), and what a real tokenizer's pre-tokenizer does anyway.
  */
object Bpe {

  val Eow = "</w>"

  /** (word, freq) over lowercase-alnum whitespace tokens. */
  def vocab(df: DataFrame, textCol: String): DataFrame =
    Dedup.parallelize(df)
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Spaced symbol representation: one char per symbol plus the end-of-word
    * marker — `"ab"` → `"a b </w>"`. */
  def spaced(word: Column): Column =
    concat(trim(regexp_replace(word, "(.)", "$1 ")), lit(" " + Eow))

  /** Apply one merge to a spaced representation: the fastBPE doubled-
    * separator trick. Doubling every separator makes each `"a b"` occurrence
    * the string `" a  b "` with a PRIVATE flanking space on each side, so
    * plain non-overlapping replace() hits every occurrence (consecutive
    * matches share no characters); collapsing separators afterwards
    * restores the single-spaced form.
    */
  def applyMerge(repr: Column, pair: String): Column = {
    val needle = " " + pair.replace(" ", "  ") + " "
    val merged = " " + pair.replace(" ", "") + " "
    trim(regexp_replace(
      call_function("replace",
        concat(lit(" "), call_function("replace", repr, lit(" "), lit("  ")), lit(" ")),
        lit(needle), lit(merged)),
      " +", " "))
  }

  /** Train `steps` merges. Returns the merge table rows (step, pair, freq)
    * and the final (word, repr, freq) vocabulary — the encode artifact.
    * Stops early if no pair is left (every word a single symbol).
    *
    * Driver rounds are BATCHED: each round counts pairs once, collects a
    * bounded top slice, and accepts a run of merges provably identical to
    * applying them one recount at a time (see [[selectBatch]]) — so a real
    * 32k-merge tokenizer train runs ~`maxBatch`× fewer Spark jobs while the
    * merge table stays bit-identical to the classic sequential algorithm
    * (the unrolled sequential DuckDB oracle pins exactly that).
    */
  def train(df: DataFrame, textCol: String, steps: Int,
      maxBatch: Int = 8): (Seq[(Int, String, Long)], DataFrame) = {
    var v = vocab(df, textCol)
      .select(col("word"), spaced(col("word")).as("repr"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, Long)]()
    var t = 1
    var exhausted = false
    while (t <= steps && !exhausted) {
      val want = math.min(maxBatch, steps - t + 1)
      val limit = math.max(2 * want + 32, 48)
      val top = v
        .select(explode(
          graft.functions.MinHashExpr.shinglesArray(col("repr"), 2)).as("pair"),
          col("freq"))
        // a single-symbol repr yields its whole string as the "gram": not a
        // pair, dropped — mirrors the oracle's empty range(1, len)
        .where(instr(col("pair"), " ") > 0)
        .groupBy("pair").agg(sum("freq").as("f"))
        .orderBy(col("f").desc, col("pair").asc)
        .limit(limit)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      if (top.isEmpty) exhausted = true
      else {
        val accepted = selectBatch(top, want, listComplete = top.length < limit)
        accepted.foreach { case (pair, f) => merges += ((t, pair, f)); t += 1 }
        val mergedRepr = accepted.foldLeft(col("repr")) {
          case (c, (pair, _)) => applyMerge(c, pair)
        }
        v = v.select(col("word"), mergedRepr.as("repr"), col("freq"))
          .localCheckpoint()
      }
    }
    (merges.toSeq, v)
  }

  /** The batch-selection rule, chosen so the batch is BIT-IDENTICAL to
    * sequential recount-per-merge training. From the descending
    * (freq, pair-asc) list, take the maximal prefix of pairwise
    * symbol-DISJOINT pairs, then keep only those strictly above `stopF`,
    * the count of the first pair sharing a symbol with the prefix (or the
    * list tail when none was seen — anything uncollected counts ≤ it).
    *
    * Why that is sequentially exact: applying a merge (a b) only changes
    * counts of pairs touching a or b — they can only DECREASE — and any
    * NEW pair contains the merged symbol, with count bounded by a
    * pre-count of some touching pair (e.g. count(x, ab) ≤ count(x, a)).
    * All of those pre-counts are ≤ stopF, so at every sub-step each kept
    * pair still strictly outranks every changed or derived pair, and kept
    * pairs keep their own counts and relative (freq, pair) order — the
    * sequential argmax walks exactly this list. Falls back to the plain
    * single best merge when the rule keeps nothing (always sequentially
    * correct).
    */
  private[operators] def selectBatch(top: Seq[(String, Long)], want: Int,
      listComplete: Boolean): Seq[(String, Long)] = {
    val used = scala.collection.mutable.Set[String]()
    val prefix = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    var i = 0
    var stopped = false
    while (i < top.length && !stopped && prefix.length < want) {
      val (pair, f) = top(i)
      val syms = pair.split(' ')
      if (syms.exists(used)) stopped = true
      else { prefix += ((pair, f)); syms.foreach(used += _); i += 1 }
    }
    val stopF: Long =
      if (i < top.length) top(i)._2 // first sharing pair, or first past the cap
      else if (listComplete) -1L    // the list was everything: nothing uncollected
      else top.last._2              // uncollected pairs all count <= the tail
    val kept = prefix.takeWhile(_._2 > stopF)
    if (kept.nonEmpty) kept.toSeq else Seq(top.head)
  }

  // --- generated DuckDB oracle --------------------------------------------

  private def vocabSql(table: String, textCol: String): String =
    s"""v AS (SELECT word, COUNT(*) AS freq FROM (
           SELECT unnest(string_split_regex(trim(lower($textCol)),'\\s+')) AS word FROM $table)
         WHERE regexp_matches(word, '^[a-z0-9]+$$') GROUP BY word),
       r0 AS MATERIALIZED (SELECT word, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' $Eow' AS r, freq FROM v)"""

  /** Unrolled training chain `r0 … r<steps>` with per-step pair-count and
    * argmax CTEs (`p<t>`, `b<t>`); best pairs are scalar subqueries (data-
    * dependent — cannot be interpolated). Every `r<t>`/`b<t>` is
    * MATERIALIZED: each is referenced more than once downstream, and
    * DuckDB's default inlining would re-evaluate the chain exponentially
    * (the un-hinted 8-step query ran unbounded).
    */
  def trainSqlCtes(table: String, textCol: String, steps: Int): String = {
    val sb = new StringBuilder(vocabSql(table, textCol))
    for (t <- 1 to steps) {
      val prev = s"r${t - 1}"
      sb ++= s""",
         p$t AS (SELECT pair, SUM(freq) AS f FROM (
             SELECT unnest(list_transform(range(1, len(s)), i -> s[i]||' '||s[i+1])) AS pair, freq
             FROM (SELECT string_split(r, ' ') AS s, freq FROM $prev)) GROUP BY pair),
         b$t AS MATERIALIZED (SELECT pair, f FROM p$t ORDER BY f DESC, pair LIMIT 1),
         r$t AS MATERIALIZED (SELECT word, trim(regexp_replace(
               replace(' ' || replace(r, ' ', '  ') || ' ',
                 ' ' || replace((SELECT pair FROM b$t), ' ', '  ') || ' ',
                 ' ' || replace((SELECT pair FROM b$t), ' ', '') || ' '),
               ' +', ' ', 'g')) AS r, freq FROM $prev)"""
    }
    sb.toString
  }

  /** Merge-table oracle: one row per step. */
  def mergesSql(table: String, textCol: String, steps: Int): String = {
    val rows = (1 to steps)
      .map(t => s"SELECT $t AS step, pair, CAST(f AS BIGINT) AS freq FROM b$t")
      .mkString(" UNION ALL ")
    s"WITH ${trainSqlCtes(table, textCol, steps)} SELECT * FROM ($rows) ORDER BY step"
  }

  /** Encoded-vocabulary oracle: the final spaced representations. */
  def encodeSql(table: String, textCol: String, steps: Int): String =
    s"""WITH ${trainSqlCtes(table, textCol, steps)}
       SELECT word, r AS repr FROM r$steps ORDER BY word"""
}
