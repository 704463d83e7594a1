package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.bfl.{Bfl, Compiler}
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Driver contract — queries + DuckDB oracle SQL (see SURVEY.md §2, §7).
  *
  * Conventions for oracle hash-parity:
  *   - every query ends in a fully deterministic ORDER BY (unique tie-break);
  *   - aggregated doubles accumulate via DECIMAL(18,6) (exact, associative —
  *     immune to float summation order) then cast back to double;
  *   - timestamps are emitted as epoch millis (`unix_millis` ≡ `epoch_ms`);
  *   - column names/aliases match the SQL exactly.
  */
object SparkEntry {

  /** Flagship: compiled BFL over the event stream — predicate pushes to the
    * Parquet scan (event_type/value native filters + get_json_object residual).
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Bfl.filter(ev, """event_type == "purchase" and value > 100 and props.k >= 50""").df
  }

  // ---------- helpers ----------

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** events filtered by a compiled BFL predicate, standard projection */
  private def bflEvents(s: SparkSession, dir: String, q: String): DataFrame = {
    val df = ev(s, dir)
    df.where(Compiler.compile(df, q).pred)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
      .orderBy("event_id")
  }

  private val evCols = "event_id, event_type, user_id, value"

  private def decSum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  // ---------- queries ----------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- BFL operator coverage (SURVEY §2.2-2.5) ---
    "bfl_eq" -> ((s, dir) => bflEvents(s, dir, """event_type == "click"""")),
    "bfl_and_gt" -> ((s, dir) =>
      bflEvents(s, dir, """event_type == "purchase" and value > 100""")),
    "bfl_or_not" -> ((s, dir) =>
      bflEvents(s, dir, """(event_type == "signup" or event_type == "error") and !(user_id == 0)""")),
    "bfl_props_json" -> ((s, dir) => bflEvents(s, dir, """props.k >= 50""")),
    "bfl_helpers_str" -> ((s, dir) =>
      bflEvents(s, dir, """event_type.startsWith("s") or event_type.contains("lick")""")),
    "bfl_regex" -> ((s, dir) => bflEvents(s, dir, """event_type == r"^(click|view)$"""")),
    "bfl_collapse" -> ((s, dir) =>
      bflEvents(s, dir, """props.missing == "x" or event_type == "click"""")),
    "bfl_limit" -> ((s, dir) => {
      val df = ev(s, dir)
      val plan = Compiler.compile(df, """value > 150 and limit(20)""")
      df.where(plan.pred)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
        .limit(plan.limit.get.toInt)
    }),
    "bfl_datetime" -> ((s, dir) => {
      val df = ev(s, dir)
      df.where(Compiler.compile(df,
        """ts >= datetime("1/15/2024, 12:00:00.000 AM") and event_type == "purchase"""").pred)
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("value"))
        .orderBy("event_id")
    }),
    // --- point lookup / pagination (SURVEY §2.1, §2.5) ---
    "single_lookup" -> ((s, dir) =>
      ev(s, dir)
        .where(col("event_id") === 424)
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"), col("user_id"),
          col("event_type"), col("value"), col("props"))),
    "fetch_forward" -> ((s, dir) => {
      val df = ev(s, dir)
      df.where(col("event_id") > 300 && Compiler.compile(df, """event_type == "view"""").pred)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy("event_id")
        .limit(25)
    }),
    "fetch_backward" -> ((s, dir) => {
      val df = ev(s, dir)
      df.where(col("event_id") < 700 && Compiler.compile(df, """event_type == "view"""").pred)
        .select(col("event_id"), col("event_type"), col("value"))
        .orderBy(col("event_id").desc)
        .limit(25)
    }),
    // --- redact transform through the interpreter fallback tier ---
    "redact_transform" -> ((s, dir) => {
      val df = ev(s, dir).withColumn(
        "doc",
        to_json(struct(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").as("k")))
      )
      Bfl
        .queryDocs(df, "doc", """event_type == "error" and redact("k")""")
        .select(col("event_id"), get_json_object(col("doc"), "$.k").as("redacted_k"))
        .orderBy("event_id")
    }),
    // --- Spark-native relational breadth (beyond-reference; SURVEY §2.4) ---
    "q1_pricing" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          round(decSum(col("l_extendedprice")), 2).as("sum_base"),
          round(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")),
    "q3_topsales" -> ((s, dir) => {
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).where(col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      val l = Tables.lineitem(s, dir).where(col("l_shipdate") > to_timestamp(lit("1999-01-01")))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(round(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q5_region_rev" -> ((s, dir) => {
      val r = Tables.region(s, dir).where(col("r_name") === "EUROPE")
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val sup = Tables.supplier(s, dir)
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      val l = Tables.lineitem(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),
    "topk_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),
    "window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),
    "hourly_events" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(
          unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(decSum(col("value")), 2).as("sum_value"))
        .orderBy("hour_ms", "event_type")),
    "nation_supplier_stats" -> ((s, dir) =>
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          round(decSum(col("s_acctbal")), 2).as("sum_acctbal"))
        .orderBy("n_name")),
    // --- training-data pipeline operators ---
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("content_hash")),
    "text_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.punctCount(col("text")).as("n_punct"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"),
          TextAnalysis.bagFingerprint(col("text")).as("bag_fingerprint"))
        .orderBy("doc_id")),
    "text_quality" -> ((s, dir) =>
      TextAnalysis.withQuality(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_tokens"), col("punct_ratio"),
          col("avg_word_len"), col("quality_score"))
        .orderBy("doc_id")),
    "lang_detect" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),
    "cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(Tables.embeddings(s, dir), "vec_id", "embedding", 0L, 10))
  )

  // ---------- oracle SQL (DuckDB) ----------

  def oracleSql: Map[String, String] = Map(
    "bfl_eq" ->
      s"SELECT $evCols FROM events WHERE event_type = 'click' ORDER BY event_id",
    "bfl_and_gt" ->
      s"SELECT $evCols FROM events WHERE event_type = 'purchase' AND value > 100 ORDER BY event_id",
    "bfl_or_not" ->
      s"SELECT $evCols FROM events WHERE (event_type = 'signup' OR event_type = 'error') AND NOT user_id = 0 ORDER BY event_id",
    "bfl_props_json" ->
      s"SELECT $evCols FROM events WHERE COALESCE(TRY_CAST(json_extract_string(props,'$$.k') AS DOUBLE),0) >= 50 ORDER BY event_id",
    "bfl_helpers_str" ->
      s"SELECT $evCols FROM events WHERE starts_with(event_type,'s') OR contains(event_type,'lick') ORDER BY event_id",
    "bfl_regex" ->
      s"SELECT $evCols FROM events WHERE regexp_matches(event_type, '^(click|view)$$') ORDER BY event_id",
    "bfl_collapse" ->
      s"SELECT $evCols FROM events WHERE 1=0 ORDER BY event_id",
    "bfl_limit" ->
      "SELECT event_id, event_type, value FROM events WHERE value > 150 ORDER BY event_id LIMIT 20",
    "bfl_datetime" ->
      "SELECT event_id, epoch_ms(ts) AS ts_ms, value FROM events WHERE epoch_ms(ts) >= 1705276800000 AND event_type = 'purchase' ORDER BY event_id",
    "single_lookup" ->
      "SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props FROM events WHERE event_id = 424",
    "fetch_forward" ->
      "SELECT event_id, event_type, value FROM events WHERE event_id > 300 AND event_type = 'view' ORDER BY event_id LIMIT 25",
    "fetch_backward" ->
      "SELECT event_id, event_type, value FROM events WHERE event_id < 700 AND event_type = 'view' ORDER BY event_id DESC LIMIT 25",
    "redact_transform" ->
      "SELECT event_id, '[REDACTED]' AS redacted_k FROM events WHERE event_type = 'error' ORDER BY event_id",
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
         round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base,
         round(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q3_topsales" ->
      """SELECT l_orderkey,
         round(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1999-01-01'
           AND l_shipdate > TIMESTAMP '1999-01-01'
         GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_region_rev" ->
      """SELECT n_name,
         round(CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'
           AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "topk_orders" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "hourly_events" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
         COUNT(*) AS n, round(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""",
    "nation_supplier_stats" ->
      """SELECT n_name, COUNT(*) AS n_suppliers,
         round(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_acctbal
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dupes
         FROM documents GROUP BY 1 ORDER BY content_hash""",
    "text_tokens" ->
      """SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))[:16] AS fingerprint,
         md5(list_aggregate(list_sort(list_distinct(string_split_regex(trim(lower(text)), '\s+'))), 'string_agg', ' '))[:16] AS bag_fingerprint
         FROM documents ORDER BY doc_id""",
    "text_quality" ->
      """SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         round((length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / greatest(length(text), 1), 6) AS punct_ratio,
         round(length(text) / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6) AS avg_word_len,
         round(least(len(string_split_regex(trim(text), '\s+')) / 50.0, 1.0) *
               (1.0 - least((length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g'))) / greatest(length(text), 1), 1.0)), 6) AS quality_score
         FROM documents ORDER BY doc_id""",
    "lang_detect" ->
      s"SELECT doc_id, ${TextAnalysis.langIdSql("text")} AS lang_pred FROM documents ORDER BY doc_id",
    "cosine_topk" ->
      """WITH q AS (SELECT embedding AS query_vec FROM embeddings WHERE vec_id = 0)
         SELECT e.vec_id,
           round(
             list_sum(list_transform(list_zip(e.embedding, q.query_vec), x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(q.query_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 4) AS sim
         FROM embeddings e, q ORDER BY sim DESC, vec_id LIMIT 10"""
  )
}
