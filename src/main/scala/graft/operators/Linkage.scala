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
}