package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-triplet generation — the (anchor, positive,
  * negative) examples an embedding/retrieval model trains on: positives
  * are the corpus's own near-duplicate pairs (real paraphrase-ish signal,
  * the standard unsupervised-contrastive trick), negatives are
  * deterministic pseudo-random draws from the corpus.
  *
  * The negative draw is the scale-aware part: "pick a random document per
  * pair" is a corpus-sized join per pair in the naive form. Here the
  * corpus folds ONCE into a B-bucket representative table (two smallest
  * ids per md5-bucket — a 2B-row broadcast), each pair hashes to a bucket
  * (pure function of the pair, stable across runs/engines), and the
  * negative is the bucket's min id, stepping down a deterministic ladder
  * on collision with the anchor/positive: bucket-min → bucket-second-min
  * → corpus-min → corpus-second-min (the global pair covers empty
  * buckets, so the ladder is total for any corpus with ≥ 3 documents).
  * Negatives can coincide with a true near-dup of the anchor — the
  * documented noise floor of random negatives, like in-batch negatives
  * that happen to be true duplicates.
  */
object Contrastive {

  def triplets(pairs: DataFrame, docs: DataFrame, idCol: String,
      buckets: Int = 64, salt: String = "neg"): DataFrame = {
    require(buckets > 1, "Contrastive: need >= 2 buckets")
    val bucketOf = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets
    val ids = docs.select(col(idCol).cast("long").as("_cn_id"),
      bucketOf(col(idCol).cast("string")).as("_cn_b"))
    // two smallest ids per bucket (bounded, ≤ 2B rows, broadcast); a
    // 1-doc bucket keeps its m1 with a null m2
    val m1 = ids.groupBy("_cn_b").agg(min("_cn_id").as("_cn_m1"))
    val m2 = m1.join(ids, "_cn_b").where(col("_cn_id") > col("_cn_m1"))
      .groupBy("_cn_b").agg(min("_cn_id").as("_cn_m2"))
    val reps = m1.join(m2, Seq("_cn_b"), "left")
    // global fallback pair (the corpus's two smallest ids) covers pairs
    // hashing to an EMPTY bucket — the candidate ladder below stays total
    val g1 = ids.agg(min("_cn_id").as("_cn_g1"))
    val g2 = ids.crossJoin(broadcast(g1)).where(col("_cn_id") > col("_cn_g1"))
      .agg(min("_cn_id").as("_cn_g2"))
    val gRow = g1.crossJoin(broadcast(g2))
    val keyed = pairs.select(
      col("id_a").as("anchor"), col("id_b").as("positive"),
      bucketOf(concat(lit(salt + ":"), col("id_a").cast("string"),
        lit(":"), col("id_b").cast("string"))).as("_cn_b"))
    def ok(c: org.apache.spark.sql.Column) =
      c.isNotNull && c =!= col("anchor") && c =!= col("positive")
    keyed.join(broadcast(reps), Seq("_cn_b"), "left")
      .crossJoin(broadcast(gRow))
      .select(col("anchor"), col("positive"),
        when(ok(col("_cn_m1")), col("_cn_m1"))
          .when(ok(col("_cn_m2")), col("_cn_m2"))
          .when(ok(col("_cn_g1")), col("_cn_g1"))
          .when(ok(col("_cn_g2")), col("_cn_g2"))
          .as("negative"))
      .where(col("negative").isNotNull)
  }

  /** DuckDB mirror of [[triplets]]: `pairsCtes` must yield `ep (id_a, id_b)`
    * over `table`.
    */
  def tripletsSql(pairsCtes: String, table: String, idCol: String,
      buckets: Int = 64, salt: String = "neg"): String = {
    def b(e: String) =
      s"CAST('0x'||substr(md5($e),1,8) AS BIGINT) % $buckets"
    s"""WITH $pairsCtes,
       ids AS (SELECT CAST($idCol AS BIGINT) AS id,
                 ${b(s"CAST($idCol AS VARCHAR)")} AS bk FROM $table),
       m1t AS (SELECT bk, MIN(id) AS m1 FROM ids GROUP BY bk),
       m2t AS (SELECT m1t.bk, MIN(ids.id) AS m2
               FROM m1t JOIN ids ON ids.bk = m1t.bk AND ids.id > m1t.m1
               GROUP BY m1t.bk),
       reps AS (SELECT m1t.bk, m1, m2 FROM m1t LEFT JOIN m2t USING (bk)),
       g AS (SELECT MIN(id) AS g1,
               (SELECT MIN(id) FROM ids WHERE id > (SELECT MIN(id) FROM ids)) AS g2
             FROM ids),
       keyed AS (SELECT id_a AS anchor, id_b AS positive,
                   ${b(s"'$salt:'||CAST(id_a AS VARCHAR)||':'||CAST(id_b AS VARCHAR)")} AS bk
                 FROM ep),
       trip AS (SELECT anchor, positive,
               CASE WHEN m1 IS NOT NULL AND m1 <> anchor AND m1 <> positive THEN m1
                    WHEN m2 IS NOT NULL AND m2 <> anchor AND m2 <> positive THEN m2
                    WHEN g1 IS NOT NULL AND g1 <> anchor AND g1 <> positive THEN g1
                    WHEN g2 IS NOT NULL AND g2 <> anchor AND g2 <> positive THEN g2
               END AS negative
             FROM keyed LEFT JOIN reps USING (bk) CROSS JOIN g)
       SELECT anchor, positive, negative FROM trip WHERE negative IS NOT NULL
       ORDER BY anchor, positive"""
  }
}
