package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy record linkage (Gravano et al. 2001 q-gram blocking): find all
  * DISTINCT-name pairs within edit distance d without the all-pairs
  * levenshtein a naive join computes. The count filter is the published
  * lower bound — strings within edit distance d share at least
  * `max(|a|,|b|) − (q−1) − q·d` q-grams (multiset intersection; each edit
  * destroys at most q grams) — so the gram join + count gate has NO false
  * negatives, and exact levenshtein runs only on survivors.
  *
  * At 100 TB the shape is dictionary-first: the corpus collapses to its
  * distinct-name dictionary (vocabulary-sized), the gram table is
  * dictionary×(L−q+1) rows hash-partitioned by gram, and candidates are
  * bounded by gram co-occurrence instead of |dict|². Pairs whose combined
  * length makes the bound non-positive (short strings — the filter is
  * vacuous for them) take an explicit brute branch over the SHORT slice
  * of the dictionary only, so the operator is exact for all lengths.
  *
  * Output: (name_a, name_b, dist) with name_a < name_b, one row per
  * distinct-name pair within `maxDist`.
  */
object Linkage {

  def fuzzyMatch(df: DataFrame, nameCol: String, maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1 && q >= 2, "fuzzyMatch: need maxDist >= 1, q >= 2")
    // bound > 0 ⟺ max(|a|,|b|) ≥ q·(d+1): a pair is gram-prunable iff its
    // LONGER member reaches minSafe; two sub-minSafe strings brute-force
    val minSafe = q * (maxDist + 1)
    val names = df.select(col(nameCol).as("name")).distinct()
    // per-(name, gram) multiset counts
    val grams = names
      .where(length(col("name")) >= q)
      .select(col("name"),
        explode(transform(
          sequence(lit(1), length(col("name")) - (q - 1)),
          i => col("name").substr(i, lit(q)))).as("g"))
      .groupBy("name", "g").agg(count(lit(1)).as("cnt"))
    val a = grams.select(col("name").as("name_a"), col("g"), col("cnt").as("cnt_a"))
    val b = grams.select(col("name").as("name_b"), col("g"), col("cnt").as("cnt_b"))
    val gramPairs = a
      .join(b, Seq("g"))
      .where(col("name_a") < col("name_b"))
      .groupBy("name_a", "name_b")
      .agg(sum(least(col("cnt_a"), col("cnt_b"))).as("shared"))
      // the count filter — sound only where the bound is positive, which
      // the max-length condition below guarantees
      .where(greatest(length(col("name_a")), length(col("name_b"))) >= minSafe)
      .where(col("shared") >=
        greatest(length(col("name_a")), length(col("name_b"))) - lit(q - 1) - lit(q * maxDist))
    val short = names.where(length(col("name")) < minSafe)
    val brutePairs = short.select(col("name").as("name_a"))
      .crossJoin(short.select(col("name").as("name_b")))
      .where(col("name_a") < col("name_b"))
    gramPairs.select(col("name_a"), col("name_b"))
      .union(brutePairs)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= maxDist)
  }

  /** DuckDB mirror of [[fuzzyMatch]] — same bound, same branch split. */
  def fuzzyMatchSql(table: String, nameCol: String, maxDist: Int,
      q: Int = 2): String = {
    val minSafe = q * (maxDist + 1)
    s"""WITH names AS (SELECT DISTINCT $nameCol AS name FROM $table),
       g AS (SELECT name, g, COUNT(*) AS cnt FROM (
           SELECT name, unnest(list_transform(range(1, length(name) - ${q - 2}),
             i -> substr(name, i, $q))) AS g
           FROM names WHERE length(name) >= $q)
         GROUP BY name, g),
       gp AS (SELECT a.name AS name_a, b.name AS name_b,
             SUM(least(a.cnt, b.cnt)) AS shared
           FROM g a JOIN g b ON a.g = b.g AND a.name < b.name
           GROUP BY 1, 2
           HAVING greatest(length(name_a), length(name_b)) >= $minSafe
             AND SUM(least(a.cnt, b.cnt)) >=
               greatest(length(name_a), length(name_b)) - ${q - 1} - ${q * maxDist}),
       sh AS (SELECT a.name AS name_a, b.name AS name_b
           FROM names a, names b
           WHERE length(a.name) < $minSafe AND length(b.name) < $minSafe
             AND a.name < b.name),
       u AS (SELECT name_a, name_b FROM gp UNION ALL SELECT name_a, name_b FROM sh)
       SELECT name_a, name_b, levenshtein(name_a, name_b) AS dist
       FROM u WHERE levenshtein(name_a, name_b) <= $maxDist
       ORDER BY name_a, name_b"""
  }

  /** Blocked Jaro-Winkler entity resolution (Winkler 1990; the Fellegi-
    * Sunter string comparator): DISTINCT-name pairs with similarity in
    * `[minSim, 1)` under standard last-token blocking — two product names
    * are candidate duplicates only if they share their head noun, the
    * blocking key deduplication systems use when a fielded key exists.
    *
    * Shape at 100 TB: the corpus collapses once to its distinct-name
    * dictionary (vocabulary-sized, with carrier counts), the self-join is
    * an equi-join on the block key — per-block fan-out is block-size
    * bounded, never |dict|² — and the comparator
    * ([[graft.functions.JaroWinklerExpr]], integer arithmetic to three
    * final divisions) runs inside the join filter. Exact name matches are
    * excluded by `name_a < name_b` over distinct names; sim 1.0 cannot
    * appear, so every row is a genuine near-miss.
    *
    * Output: (name_a, name_b, sim, n_a, n_b) — sim rounded to 6 dp, n_* =
    * carrier record counts, ordered by pair.
    */
  def jaroWinklerPairs(df: DataFrame, nameCol: String,
      minSim: Double = 0.8): DataFrame = {
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("blk", element_at(split(col("name"), " "), -1))
    val a = names.select(col("name").as("name_a"), col("n").as("n_a"), col("blk"))
    val b = names.select(col("name").as("name_b"), col("n").as("n_b"), col("blk"))
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b"))
      .withColumn("sim", round(
        graft.functions.JaroWinklerExpr.jaroWinkler(col("name_a"), col("name_b")), 6))
      .where(col("sim") >= minSim)
      .select(col("name_a"), col("name_b"), col("sim"), col("n_a"), col("n_b"))
      .orderBy("name_a", "name_b")
  }

  /** DuckDB mirror of [[jaroWinklerPairs]] — `jaro_winkler_similarity` is
    * the engine built-in the Spark expression was verified against.
    */
  def jaroWinklerPairsSql(table: String, nameCol: String,
      minSim: Double = 0.8): String =
    s"""WITH names AS (SELECT $nameCol AS name, COUNT(*) AS n,
             string_split($nameCol, ' ')[-1] AS blk
           FROM $table GROUP BY 1)
       SELECT a.name AS name_a, b.name AS name_b,
         round(jaro_winkler_similarity(a.name, b.name), 6) AS sim,
         a.n AS n_a, b.n AS n_b
       FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
       WHERE round(jaro_winkler_similarity(a.name, b.name), 6) >= $minSim
       ORDER BY name_a, name_b"""
}