package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.bfl.Compiler

/** Physical-plan regression tests: the scale properties the operators rely
  * on (Parquet pushdown, broadcast joins, partial aggregation) must be
  * visible in the executed plan, not assumed. A refactor that silently turns
  * a pushed filter into a post-scan filter or a broadcast join into a
  * sort-merge join fails here before it costs anything at scale.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = Sessions
    .builder("local[4]", 4)
    .appName("plan-audit")
    .getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("compiled BFL equality pushes to the Parquet scan") {
    spark.sparkContext.setLogLevel("WARN")
    val df = Tables.events(spark, sf)
    val plan = planOf(df.where(Compiler.compile(df, """event_type == "click"""").pred))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(event_type,click\\).*"),
      s"equality not pushed:\n$plan")
  }

  test("compiled BFL numeric comparison on a long column stays pushable") {
    val df = Tables.events(spark, sf)
    val plan = planOf(df.where(Compiler.compile(df, """user_id > 40""").pred))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(user_id,40\\).*"),
      s"typed literal fast path lost pushdown:\n$plan")
  }

  test("compiled BFL conjunction splits: both conjuncts pushed") {
    val df = Tables.events(spark, sf)
    val plan = planOf(
      df.where(Compiler.compile(df, """event_type == "purchase" and value > 100""").pred))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(event_type,purchase\\).*"), plan)
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(value,100\\.0\\).*"), plan)
  }

  test("datetime comparison compiles to a native timestamp range (row-group pruning)") {
    val df = Tables.events(spark, sf)
    val plan = planOf(df.where(
      Compiler.compile(df, """ts >= datetime("1/15/2024, 12:00:00.000 AM")""").pred))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts,.*"),
      s"timestamp compare not pushed:\n$plan")
  }

  test("small-dimension joins broadcast (q5 shape)") {
    val plan = planOf(
      Tables.supplier(spark, sf)
        .join(broadcast(Tables.nation(spark, sf)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").count())
    assert(plan.contains("BroadcastHashJoin"), s"dim join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("aggregation is partial (map-side combine) before the shuffle") {
    val plan = planOf(
      Tables.lineitem(spark, sf).groupBy("l_returnflag").agg(sum("l_quantity")))
    // HashAggregate appears twice: partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("column pruning: a two-column projection reads a two-column schema") {
    val plan = planOf(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"))
    assert(plan.matches("(?s).*ReadSchema: struct<l_orderkey:[^,]+,l_quantity:[^>]+>.*"),
      s"scan reads more than the projection:\n$plan")
  }

  test("interpreter-tier redact query prefilters its compilable conjunct AT THE SCAN") {
    // event_type == "error" is fully compilable even though redact() forces
    // the interpreter tier — the backed prefilter must reach PushedFilters
    val plan = planOf(SparkEntry.queries("redact_transform")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(event_type,error\\).*"),
      s"redact conjunct not pushed to the scan:\n$plan")
    assert(plan.contains("bfl_match"), s"interpreter filter missing:\n$plan")
  }

  test("interpreter-tier json() query pushes IsNotNull on the backed receiver") {
    val plan = planOf(SparkEntry.queries("bfl_json_helper")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*IsNotNull\\(props\\).*"),
      s"receiver not-null not pushed:\n$plan")
    // the VARIANT prefilter itself runs ahead of the interpreter expression
    assert(plan.contains("variant_get") || plan.contains("try_variant_get"),
      s"variant prefilter missing from the plan:\n$plan")
  }

  test("json() prefilter parses the receiver ONCE per row (shared CSE projection)") {
    // the VARIANT-model coercion cascade references the parsed receiver many
    // times; unbound, every reference re-inlines parse_json into the Filter
    // (~18 parses/row — FilterExec does no subexpression elimination).
    // FilterCseBinding must materialize the parse in a _graft_cse projection
    // below the filter, while keeping IsNotNull(props) in PushedFilters
    val plan = planOf(SparkEntry.queries("bfl_json_helper")(spark, sf))
    assert(plan.contains("_graft_cse_"), s"shared parse projection missing:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*IsNotNull\\(props\\).*"),
      s"CSE sandwich lost the pushed receiver not-null:\n$plan")
    // the filter line itself must not re-inline the parse: at most one
    // parseJson occurrence per plan LINE (the projection line that computes
    // it; scan DataFilters echoes don't contain parses)
    val filterLines = plan.linesIterator.filter(_.contains("Filter")).toSeq
    assert(filterLines.forall(l => "parseJson\\(".r.findAllIn(l).size <= 1),
      s"filter still re-inlines the variant parse:\n$plan")
  }

  test("doc-byte key prefilter over a RAW stored doc column pushes StringContains to the scan") {
    // a descent query on a raw JSON column needs the interpreter, but its
    // derived key conjunct (contains(doc,'"k"') OR contains(doc,'\u')) is a
    // bare-attribute predicate V1 translates — on a 100 TB stored log the
    // parse-everything fallback becomes a dictionary/page-level scan filter
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft-rawdoc").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.StringType, nullable = false)))
    spark.createDataFrame(
      List("""{"outer":{"k":1}}""", """{"outer":{"x":2}}""")
        .map(org.apache.spark.sql.Row(_)).asJava, schema)
      .write.mode("overwrite").parquet(tmp)
    val raw = spark.read.parquet(tmp)
    val plan = planOf(graft.bfl.Bfl.queryDocs(raw, "doc", """outer..k == 1"""))
    assert(plan.contains("StringContains"),
      s"key conjunct not pushed as StringContains:\n$plan")
    assert(plan.contains("bfl_match"), s"interpreter filter missing:\n$plan")
  }

  test("interpreter-tier xml() query pushes IsNotNull through the receiver chain to the scan") {
    // body = concat(..., get_json_object(props, '$.k'), ...) — the derived
    // receiver-not-null condition must surface as IsNotNull(props) in
    // PushedFilters (NotNullDerivation walks the null-propagating chain)
    val plan = planOf(SparkEntry.queries("bfl_xml_helper")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*IsNotNull\\(props\\).*"),
      s"xml receiver not-null not pushed:\n$plan")
  }

  test("compiled collapse shape derives a pushable IsNotNull on the doc-rooted path") {
    // `props.missing == "x" or A`: a match requires the left arm NOT to
    // collapse, so props must exist — IsNotNull(props) must reach the scan
    val plan = planOf(SparkEntry.queries("bfl_collapse")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*IsNotNull\\(props\\).*"),
      s"collapse-derived not-null not pushed:\n$plan")
  }

  test("interpreter-tier filters evaluate ONCE per row (no re-inlined eval in a Project)") {
    // the old fused withColumn(doc, bfl_eval).where(isNotNull) shape let the
    // filter push below the projection and re-inline the interpreter — two
    // evals per surviving row; the match/transform split must keep exactly
    // one bfl_match (filter) and, for altering queries, one bfl_transform
    // the MATCH expression must live in Filter nodes only — a bfl_match (or
    // the old bfl_eval) inside a Project means the interpreter re-runs to
    // produce output columns (the scan node echoes filter expressions in its
    // DataFilters metadata, so count per-line, not globally)
    def projectLines(p: String): Seq[String] =
      p.linesIterator.filter(_.contains("Project")).toSeq
    val plan = planOf(SparkEntry.queries("redact_transform")(spark, sf))
    assert(projectLines(plan).forall(l => !l.contains("bfl_match") && !l.contains("bfl_eval")),
      s"interpreter MATCH re-inlined into a Project:\n$plan")
    assert("bfl_transform".r.findAllIn(plan).size === 1, s"bfl_transform duplicated:\n$plan")
    val planJson = planOf(SparkEntry.queries("bfl_json_helper")(spark, sf))
    assert(projectLines(planJson).forall(l => !l.contains("bfl_match") && !l.contains("bfl_eval")),
      s"interpreter MATCH re-inlined into a Project:\n$planJson")
    assert(!planJson.contains("bfl_eval") && !planJson.contains("bfl_transform"),
      s"non-altering query should not serialize docs:\n$planJson")
  }

  test("recursive descent compiles to the descent expression, not the full interpreter") {
    // `outer..k == 87` must run the path-only bfl_descent expression inside
    // a native exists(...) predicate — the query-level interpreter
    // (bfl_eval/bfl_match) must be absent from the plan entirely
    val plan = planOf(SparkEntry.queries("bfl_descent")(spark, sf))
    assert(plan.contains("bfl_descent"), s"descent tier not engaged:\n$plan")
    assert(!plan.contains("bfl_eval") && !plan.contains("bfl_match"),
      s"descent query fell back to the row interpreter:\n$plan")
  }

  test("brute-force cosine top-k plans as broadcast + TakeOrdered, no shuffle sort") {
    val plan = planOf(operators.Similarity.cosineTopK(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 0L, 10))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query vector not broadcast:\n$plan")
  }

  test("keyword search gates the explode: contains() filter sits BELOW Generate") {
    // docs failing the substring conjunction must never reach tokenization —
    // in the root-first plan string the gate appears after (deeper than) the
    // Generate node, between it and the scan
    val plan = planOf(SparkEntry.queries("keyword_search")(spark, sf))
    val gen = plan.indexOf("Generate explode")
    val gate = plan.indexOf("Contains(lower(text")
    assert(gen >= 0, s"no explode in the plan:\n$plan")
    assert(gate > gen, s"contains() gate not below the explode:\n$plan")
  }

  test("decontamination joins on gram digests — no nested-loop or cartesian join") {
    val plan = planOf(SparkEntry.queries("decontam_ngram")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"gram join degenerated to all-pairs:\n$plan")
    // both aggregations (pair counting) keep map-side partials
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg:\n$plan")
  }

  test("pii scrub reads only the two columns it uses") {
    val plan = planOf(SparkEntry.queries("pii_scrub")(spark, sf))
    assert(plan.matches("(?s).*ReadSchema: struct<doc_id:[^,]+,text:[^>]+>.*"),
      s"scan reads more than (doc_id, text):\n$plan")
  }

  test("decontam_apply: every join stays an equi/broadcast join — no all-pairs") {
    val plan = planOf(SparkEntry.queries("decontam_apply")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"decontamination composite degenerated to all-pairs:\n$plan")
  }

  test("vocab_prune: the remap join broadcasts the vocabulary") {
    val plan = planOf(SparkEntry.queries("vocab_prune")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab not broadcast — corpus would shuffle on the token key:\n$plan")
  }

  test("dsir_weights: the B-bounded ratio table broadcasts back onto the tf relation") {
    val plan = planOf(SparkEntry.queries("dsir_weights")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"log-ratio table not broadcast — tf relation would shuffle on feat:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"all-pairs in DSIR:\n$plan")
  }

  test("cms_heavy: the d×w counter matrix broadcasts; probes never shuffle for the join") {
    val plan = planOf(SparkEntry.queries("cms_heavy")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"counter matrix not broadcast:\n$plan")
  }

  test("hamming_rerank: signature stage is broadcast + TakeOrdered, no shuffle sort") {
    val plan = planOf(SparkEntry.queries("hamming_rerank")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"candidate selection should be a TakeOrdered, not a global sort:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query row not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("apss_pairs: every join is an equi-join (checkpointed postings feed it)") {
    // the postings+prefix window lives in the localCheckpoint's own job;
    // this audits the candidate/verify stage the checkpoint feeds
    val plan = planOf(SparkEntry.queries("apss_pairs")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure leaked into the APSS plan:\n$plan")
  }

  test("simhash_pairs: block candidates and popcount verify stay equi-joins") {
    val plan = planOf(SparkEntry.queries("simhash_pairs")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure in the simhash plan:\n$plan")
  }

  test("weighted_sample: one scan + TakeOrdered, no global sort or window") {
    val plan = planOf(SparkEntry.queries("weighted_sample")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"ES top-k should be TakeOrdered:\n$plan")
  }

  test("neardup_triangles: wedge join and closure stay equi-joins") {
    val plan = planOf(SparkEntry.queries("neardup_triangles")(spark, sf))
    // the one-row (triangles × wedges) scalar crossJoin legitimately plans
    // as a BroadcastNestedLoopJoin; the structural hazard is a product
    // join over EDGES — pinned by the absence of CartesianProduct and by
    // the wedge join being a hash equi-join
    assert(!plan.contains("CartesianProduct"),
      s"triangle census planned a cartesian join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
      s"wedge join should be a keyed equi-join:\n$plan")
  }

  test("prf_expand: the feedback set and df fold broadcast; no corpus shuffle join") {
    val plan = planOf(SparkEntry.queries("prf_expand")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"feedback semi-join should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"product join in PRF:\n$plan")
  }

  test("scd2_merge: update batch broadcasts; the snapshot never shuffle-joins") {
    val plan = planOf(SparkEntry.queries("scd2_merge")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"batch join should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"snapshot shuffled for a join (the anti-join must run against the " +
        s"batch-bounded matched set, not the corpus):\n$plan")
    assert(plan.contains("Generate"),
      s"version legs should come from ONE generator pass:\n$plan")
  }

  test("quality_blend: scoring is scan → project → sort — zero joins, zero windows") {
    // the percent_rank plan this replaces is Exchange SinglePartition + Sort
    // per signal; here the CDF is a driver-folded literal lookup, so the
    // returned (scoring) plan must have no join or window at all and only
    // the final presentation ORDER BY
    val plan = planOf(SparkEntry.queries("quality_blend")(spark, sf))
    assert("rangepartitioning".r.findAllIn(plan).size <= 1,
      s"corpus-sized sort beyond the final ORDER BY:\n$plan")
    assert(!plan.contains("Join"), s"CDF lookup should be a literal, not a join:\n$plan")
    assert(!plan.contains("Window"), s"no window should survive into scoring:\n$plan")
  }

  test("runtime bloom-filter join: a selective build side injects might_contain on the probe") {
    // the 100 TB fact-fact join lever beyond AQE: with runtime bloom
    // filters on, a selective dimension slice plants a bloom probe on the
    // fact scan so non-joining rows die before the shuffle. Spec-only (the
    // conf is session-global, so board queries never flip it).
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // force the shuffle join regime the filter exists for (broadcast
      // joins prune by themselves)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ord = Tables.orders(spark, sf).where(col("o_totalprice") > 400000)
      val li = Tables.lineitem(spark, sf)
      val plan = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").count()
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter not injected:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("minhash_calib: pair-bounded equi-joins, partial agg before the bucket shuffle") {
    val plan = planOf(SparkEntry.queries("minhash_calib")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure in the calibration plan:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"bucket aggregation should map-side combine:\n$plan")
  }

  test("q6: all three range predicates reach the parquet scan, schema pruned") {
    val plan = planOf(SparkEntry.queries("q6_forecast")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate.*"),
      s"shipdate range not pushed:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_discount,0\\.05\\).*"),
      s"discount range not pushed:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*LessThan\\(l_quantity,24\\.0\\).*"),
      s"quantity bound not pushed:\n$plan")
    // projection pruning: the scan must not read the 11-column table
    assert(!plan.contains("l_orderkey") && !plan.contains("l_returnflag"),
      s"scan reads columns Q6 never uses:\n$plan")
  }

  test("q14: the part side broadcasts; no sort-merge join") {
    val plan = planOf(SparkEntry.queries("q14_promo")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"part join should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("q18: lineitem partially aggregates BEFORE the orders/customer joins") {
    val plan = planOf(SparkEntry.queries("q18_large_orders")(spark, sf))
    // the HAVING-aggregate must fold the fact table first (partial_sum on
    // l_quantity below the joins) and top-100 must be TakeOrdered, never a
    // global sort of the joined result
    assert(plan.matches("(?s).*partial_sum\\(.*l_quantity.*"),
      s"no map-side partial aggregation on the fact table:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-100 not TakeOrdered:\n$plan")
  }

  test("q19: brand brackets keep quantity-range pushdown and a broadcast part join") {
    val plan = planOf(SparkEntry.queries("q19_brackets")(spark, sf))
    // the disjunction spans both tables, but its residual per-table
    // conjuncts (quantity range / brand set) must still reach each scan
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*Or\\(.*l_quantity.*"),
      s"quantity-bracket disjunction not pushed to the lineitem scan:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*p_brand.*"),
      s"brand disjunction not pushed to the part scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"part join should broadcast:\n$plan")
  }

  test("q3: BUILDING-segment customer dim broadcasts; top-10 is TakeOrdered") {
    val plan = planOf(SparkEntry.queries("q3_topsales")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"customer dim should broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-10 not TakeOrdered:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(c_mktsegment,BUILDING\\).*"),
      s"segment filter not pushed:\n$plan")
  }

  test("q4: the late-line EXISTS is a left-semi join with partial distinct below") {
    val plan = planOf(SparkEntry.queries("q4_priority")(spark, sf))
    assert(plan.contains("LeftSemi"), s"EXISTS should plan as left-semi:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("q5/q7/q10: nation/region dims broadcast in every multi-join chain") {
    Seq("q5_region_rev", "q7_volume", "q10_returned").foreach { q =>
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(plan.contains("BroadcastHashJoin"), s"$q: dims should broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q: unexpected cartesian:\n$plan")
    }
  }

  test("q12: both shipdate bounds and the late-line residual reach the scan") {
    val plan = planOf(SparkEntry.queries("q12_latestatus")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(l_shipdate.*"),
      s"shipdate lower bound not pushed:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*LessThan\\(l_shipdate.*"),
      s"shipdate upper bound not pushed:\n$plan")
  }

  test("q13: left-outer double aggregation — two hash-agg levels, no sort agg") {
    val plan = planOf(SparkEntry.queries("q13_custdist")(spark, sf))
    assert(plan.contains("LeftOuter"), s"customer-orders join should be left outer:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 4, // partial+final per level
      s"double aggregation should be hash-based at both levels:\n$plan")
    assert(!plan.contains("SortAggregate"), s"unexpected sort aggregate:\n$plan")
  }

  test("q16: part and supplier gates broadcast; size IN-set pushes to the scan") {
    val plan = planOf(SparkEntry.queries("q16_supplier_cnt")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"dims should broadcast:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*In\\(p_size.*"),
      s"size IN-set not pushed:\n$plan")
  }

  test("q20: PROMO flow aggregates before the dominance join; supplier is left-semi") {
    val plan = planOf(SparkEntry.queries("q20_promo_suppliers")(spark, sf))
    assert(plan.matches("(?s).*partial_sum\\(.*"),
      s"flow fold should partially aggregate:\n$plan")
    assert(plan.contains("LeftSemi"), s"dominant-supplier gate should be left-semi:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(p_type,PROMO\\).*"),
      s"PROMO filter not pushed:\n$plan")
  }

  test("q2: candidate-part and EU-supplier dims broadcast; size range pushed") {
    val plan = planOf(SparkEntry.queries("q2_mincost")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"dim joins should broadcast:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*p_size.*"),
      s"size range not pushed to the part scan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("q8: part-type equality and orderdate range reach their scans") {
    val plan = planOf(SparkEntry.queries("q8_share")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(p_type,STANDARD\\).*"),
      s"p_type not pushed:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderdate.*"),
      s"orderdate range not pushed:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"nation/part dims should broadcast:\n$plan")
  }

  test("q9: the LIKE '%red%' part filter pushes as StringContains") {
    val plan = planOf(SparkEntry.queries("q9_profit")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*StringContains\\(p_name,red\\).*"),
      s"name substring not pushed to the part scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"part/nation dims should broadcast:\n$plan")
  }

  test("q15: supplier revenue partially aggregates; scalar max broadcasts back") {
    val plan = planOf(SparkEntry.queries("q15_top_supplier")(spark, sf))
    assert(plan.matches("(?s).*partial_sum\\(.*"),
      s"no map-side partial aggregation under the revenue fold:\n$plan")
    // the one-row MAX joins back as a broadcast (nested-loop on a 1-row
    // build side), never by re-sorting the fact table
    assert(plan.contains("Broadcast"), s"scalar max not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
  }

  test("q17: per-part averages broadcast back against the fact scan") {
    val plan = planOf(SparkEntry.queries("q17_small_qty")(spark, sf))
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(p_brand,Brand#3\\).*"),
      s"brand filter not pushed:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"correlated-avg join-back should broadcast:\n$plan")
    assert(plan.matches("(?s).*partial_sum\\(.*"),
      s"no partial aggregation in the avg fold:\n$plan")
  }

  test("q21: per-order supplier stats fold with partial aggregation, no cartesian") {
    val plan = planOf(SparkEntry.queries("q21_waiting")(spark, sf))
    // the two COUNT(DISTINCT supplier) columns rewrite to ONE Expand +
    // FILTERed partial counts with a map-side pair-dedup below the shuffle
    // — the shape that keeps the per-order fold one pass at scale
    assert(plan.contains("Expand"),
      s"multi-distinct Expand rewrite missing:\n$plan")
    assert(plan.matches("(?s).*partial_count\\(.*FILTER.*"),
      s"filtered partial distinct counts missing:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unexpected cartesian:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-100 not TakeOrdered:\n$plan")
  }

  test("winnow_overlap: df-gated fingerprint equi-join, never all-pairs") {
    val plan = planOf(SparkEntry.queries("winnow_overlap")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must be an equi-join on the fingerprint value:\n$plan")
    assert(plan.matches("(?s).*partial_count\\(.*"),
      s"df gate / shared-count folds should partially aggregate:\n$plan")
  }

  test("q22: dormancy is a LEFT ANTI join; the scalar average broadcasts") {
    val plan = planOf(SparkEntry.queries("q22_opportunity")(spark, sf))
    assert(plan.contains("LeftAnti"), s"no-recent-orders should be an anti join:\n$plan")
    assert(plan.contains("Broadcast"), s"scalar avg not broadcast:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(o_orderdate.*"),
      s"recent-orders date bound not pushed:\n$plan")
  }

  test("cov_matrix: the moment fold executes ONCE (AQE reuses its exchange)") {
    val df = SparkEntry.queries("cov_matrix")(spark, sf)
    df.collect() // adaptive reuse is a RUNTIME property — finalize the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"typed Aggregator missing from the plan:\n$plan")
    // sums + means(i) + means(j) all read the same folded buffer: the
    // scan-side partial fold must run once, the other branches reusing
    // its exchange — otherwise the corpus is folded three times
    assert("ReusedExchange".r.findAllIn(plan).size >= 2,
      s"moment fold not reused across branches:\n$plan")
    // and every Generate is the single-row posexplode of the folded
    // buffer — products never enter the row stream pre-aggregate
    assert(!plan.contains("Generate explode"),
      s"unexpected pre-aggregate fan-out:\n$plan")
  }

  test("cluster_balanced_sample: size/label joins broadcast, draw is TakeOrdered") {
    val plan = planOf(SparkEntry.queries("cluster_balanced_sample")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"ES draw should be TakeOrdered:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"cluster-bounded relations must broadcast, not SMJ:\n$plan")
  }

  test("markov_attribution: path extraction is windows + bounded agg, no self-join") {
    val plan = planOf(SparkEntry.queries("markov_attribution")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("SortMergeJoin"),
      s"transition extraction should not join at all:\n$plan")
  }

  test("dedup_decisions: near-tier verdicts broadcast onto the exact tier") {
    val plan = planOf(SparkEntry.queries("dedup_decisions")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the cluster-bounded near relation should broadcast:\n$plan")
  }

  test("lof_outliers: candidate kNN stays equi-join; cosine runs codegen'd") {
    val plan = planOf(SparkEntry.queries("lof_outliers")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure leaked into LOF:\n$plan")
    // the codegen'd one-pass cosine, never the interpreted HOF chain
    assert(plan.contains("cosine_sim"), s"cosine expression missing:\n$plan")
    assert(!plan.contains("aggregate(zip_with"),
      s"HOF cosine (interpreted) leaked into the hot path:\n$plan")
  }

  test("dbscan_clusters: eps edges and core/border joins stay equi-joins") {
    val plan = planOf(SparkEntry.queries("dbscan_clusters")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure leaked into DBSCAN:\n$plan")
  }

  test("hubness: the in-degree is one hash agg over the kNN edges") {
    val plan = planOf(SparkEntry.queries("hubness")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure:\n$plan")
    assert(plan.contains("HashAggregate"), s"in-degree should hash-agg:\n$plan")
  }

  test("density trio (board = auto-width): hyperplane bands keep every join equi-only; signature is the one-pass expression") {
    for (q <- Seq("hubness", "lof_outliers", "dbscan_clusters")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$q: all-pairs structure:\n$plan")
      // each band value must come from HyperplaneSigExpr (one pass over the
      // vector), not the bits×dim Column tree that takes seconds of Janino.
      // dbscan's eps-edge stage sits behind a localCheckpoint, so its
      // banding is invisible in the FINAL executed plan — the construction
      // is the same planeBands relation the lof/hubness assertions pin.
      if (q != "dbscan_clusters")
        assert(plan.contains("hyperplane_sig"), s"$q: signature expression missing:\n$plan")
      assert(plan.contains("HashAggregate"), s"$q: per-id folds should hash-agg:\n$plan")
    }
  }

  test("pipeline_e2e: composed corpus path stays equi-join-only with a bounded shuffle tail") {
    val plan = planOf(SparkEntry.queries("pipeline_e2e")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure leaked into the composed pipeline:\n$plan")
    // the serving tail after the checkpointed stage barriers (two-level
    // pack prefix sum over the chunk relation → manifest join/agg/sort)
    // must not accrete exchanges as stages compose: 8 at round 9. Without
    // the barriers the optimizer re-expands every reused stage upstream —
    // measured 440 exchanges — so a jump here means a barrier was dropped
    // or a stage stopped reusing the partitioning.
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 8, s"pipeline tail grew to $exchanges exchanges:\n$plan")
  }

  test("rbo_overlap: both rankings materialize via TakeOrdered, not a global sort") {
    val plan = planOf(SparkEntry.queries("rbo_overlap")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-depth should be TakeOrdered:\n$plan")
  }

  test("hash_embed: row-local fold, evaluated once, no aggregation at all") {
    val plan = planOf(SparkEntry.queries("hash_embed")(spark, sf))
    // round-11 optimization: the token explode + two hash aggregations are
    // gone — one HashEmbedExpr per row inside a Generate (the
    // explode(array(...)) wrap keeps the posexplode's inferred size/null
    // filters from sinking the md5 fold into the scan), so the only
    // exchange left is the output sort
    assert(!plan.contains("Join"), s"hash_embed should not join:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"row-local hash_embed should not aggregate:\n$plan")
    assert("hashembedexpr".r.findAllIn(plan.toLowerCase).size == 1,
      s"embed fold must evaluate exactly once per row:\n$plan")
    // remaining exchanges: the min-parallelism round-robin guard and the
    // output sort's range partitioning — but never an aggregation shuffle
    assert(!plan.contains("Exchange hashpartitioning"),
      s"no keyed shuffle should remain:\n$plan")
  }

  test("spearman_corr: rank joins broadcast the distinct-value type relations") {
    val plan = planOf(SparkEntry.queries("spearman_corr")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"value-type rank tables should broadcast back:\n$plan")
  }

  test("asof_nearest: both direction sorts share ONE keyed exchange, no join") {
    val plan = planOf(SparkEntry.queries("asof_nearest")(spark, sf))
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one keyed shuffle, saw $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"nearest as-of must stay join-free:\n$plan")
  }

  test("conformal_intervals: per-group stats broadcast back, no cartesian") {
    val plan = planOf(SparkEntry.queries("conformal_intervals")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"group stats/qhat should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("seq_support: firsts fold with partial min; pair join is equi-only") {
    val plan = planOf(SparkEntry.queries("seq_support")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs structure leaked:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"first-occurrence agg should map-side combine:\n$plan")
  }

  test("ann_recall: panel broadcasts over the corpus; rank prunes via group limit") {
    val plan = planOf(SparkEntry.queries("ann_recall")(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"un-broadcast cartesian leaked:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"query panel should broadcast, not shuffle the corpus:\n$plan")
    // rank-k prune must engage BEFORE the per-qid shuffle: top-k per query
    // flows through WindowGroupLimit, never a full sorted materialization
    assert(plan.contains("WindowGroupLimit"),
      s"row_number <= k should plan as WindowGroupLimit:\n$plan")
  }

  test("quantile_norm: grid is a broadcast scalar; rank sort is source-keyed") {
    val plan = planOf(SparkEntry.queries("quantile_norm")(spark, sf))
    assert(plan.contains("Window"), s"percent_rank window missing:\n$plan")
    assert("Exchange hashpartitioning\\(source".r.findFirstIn(plan).isDefined,
      s"rank must partition by source, not sort globally:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("bh_fdr: per-group KS windows partition by group, no cartesian") {
    val plan = planOf(SparkEntry.queries("bh_fdr")(spark, sf))
    assert("Window.*\\[g#".r.findFirstIn(plan).isDefined ||
      plan.contains("PARTITION BY") || plan.contains("windowspecdefinition(g#"),
      s"KS fold must window per group:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("mase_eval: calendar-offset self-joins stay equi-only with partial agg") {
    val plan = planOf(SparkEntry.queries("mase_eval")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"lag joins must be equi-joins:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"daily counts should map-side combine:\n$plan")
  }

  test("pii_luhn: candidate explode with NO join — validation is pure expression") {
    val plan = planOf(SparkEntry.queries("pii_luhn")(spark, sf))
    assert(!plan.contains("Join"), s"Luhn scan must stay join-free:\n$plan")
    assert(plan.contains("Generate"), s"candidates should explode:\n$plan")
  }

  test("heldout_ppl: train frequencies broadcast back onto the held-out stream") {
    val plan = planOf(SparkEntry.queries("heldout_ppl")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"type-table frequencies should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("intersect_except plans as hash joins over distinct inputs, no cartesian") {
    val plan = planOf(SparkEntry.queries("intersect_except")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"set ops must stay equi-joins:\n$plan")
    assert(plan.contains("LeftSemi") || plan.contains("LeftAnti"),
      s"INTERSECT/EXCEPT should plan as semi/anti joins:\n$plan")
  }

  test("weighted_quantiles: mass window partitions by source, never global") {
    val plan = planOf(SparkEntry.queries("weighted_quantiles")(spark, sf))
    assert("Exchange hashpartitioning\\(source".r.findFirstIn(plan).isDefined,
      s"cumulative mass must shuffle by source:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dedup_savings: threshold explode joins token table equi-only") {
    val plan = planOf(SparkEntry.queries("dedup_savings")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("Generate"), s"thresholds should explode:\n$plan")
  }

  test("wav_features: pure mapPartitions decode, no join, no window") {
    val plan = planOf(SparkEntry.queries("wav_features")(spark, sf))
    assert(!plan.contains("Join"), s"audio features must stay join-free:\n$plan")
    assert(plan.contains("MapPartitions") || plan.contains("mapPartitions") ||
      plan.contains("SerializeFromObject"),
      s"decode should run as the batched partition map:\n$plan")
  }

  test("image_resize / audio_resample: decode+box-downsample is join-free and hash-shuffle-free") {
    for (q <- Seq("image_resize", "audio_resample")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("Join"), s"$q must stay join-free:\n$plan")
      assert(plan.contains("MapPartitions") || plan.contains("SerializeFromObject"),
        s"$q should run as the batched partition map:\n$plan")
      assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined,
        s"$q: no hash shuffle belongs in a per-row decode pass:\n$plan")
    }
  }

  test("mp4_tracks: pure mapPartitions walk — no join, only the orderBy exchange") {
    val plan = planOf(SparkEntry.queries("mp4_tracks")(spark, sf))
    assert(!plan.contains("Join"), s"track walk must stay join-free:\n$plan")
    assert(plan.contains("MapPartitions") || plan.contains("SerializeFromObject"),
      s"walk should run as the batched partition map:\n$plan")
    // scan-parallel: the ONLY exchange is the final sort's range partitioner
    assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined,
      s"no hash shuffle belongs in a per-row container walk:\n$plan")
  }

  test("avi_frames: frame decode is join-free and hash-shuffle-free") {
    val plan = planOf(SparkEntry.queries("avi_frames")(spark, sf))
    assert(!plan.contains("Join"), s"frame decode must stay join-free:\n$plan")
    assert(plan.contains("MapPartitions") || plan.contains("SerializeFromObject"),
      s"decode should run as the batched partition map:\n$plan")
    assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined,
      s"no hash shuffle belongs in a per-row codec pass:\n$plan")
  }

  test("grouping_sets_mix plans as ONE Expand pass with partial aggregation") {
    val plan = planOf(SparkEntry.queries("grouping_sets_mix")(spark, sf))
    assert(plan.contains("Expand"), s"grouping sets should Expand:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count") ||
      "HashAggregate.*partial".r.findFirstIn(plan).isDefined,
      s"tally should map-side combine:\n$plan")
  }

  test("bleu_eval: one side-flagged gram pass — NO join anywhere in the plan") {
    val plan = planOf(SparkEntry.queries("bleu_eval")(spark, sf))
    // the clip is least(hc, rc) on a single (doc, n, gram) relation that
    // counts both sides at once; totals and corpus lengths fold out of the
    // same relation — the former ref/hyp hash join must not come back
    assert(!plan.contains("Join"), s"join crept back into bleu:\n$plan")
    assert(plan.contains("Generate"), s"gram explode expected:\n$plan")
    assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"gram counts should combine map-side:\n$plan")
  }

  test("ndcg_eval: term/query dims broadcast; top-k prunes via group limit") {
    val plan = planOf(SparkEntry.queries("ndcg_eval")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"docFreq/qterms/stats should broadcast:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rk<=k should prune map-side:\n$plan")
  }

  test("jw_linkage: block self-join is equi-only over the name dictionary") {
    val plan = planOf(SparkEntry.queries("jw_linkage")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking must keep the join equi-only:\n$plan")
    assert(plan.contains("jaro_winkler"),
      s"comparator should be the native expression:\n$plan")
  }

  test("holt_linear: per-key fold aggregates with partial combine, no window") {
    val plan = planOf(SparkEntry.queries("holt_linear")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    // the calendar span is a broadcast scalar; the fold itself is agg-side
    assert(plan.contains("BroadcastExchange"), s"span should broadcast:\n$plan")
  }

  test("rouge_eval / chrf_eval: one gram pass; only the maxN-row spine joins") {
    for (q <- Seq("rouge_eval", "chrf_eval")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$q cartesian leaked:\n$plan")
      // the former per-gram clip join is gone (both sides counted in one
      // relation); the only join left is the n-spine (≤ maxN rows) against
      // the per-n aggregate — it must stay broadcast, never a shuffle join
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q: a shuffle join can only be the clip join creeping back:\n$plan")
      assert(plan.contains("Generate"), s"$q gram explode expected:\n$plan")
    }
  }

  test("mann_whitney: rank fold runs over the value type table, no pair join") {
    val plan = planOf(SparkEntry.queries("mann_whitney")(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("Join"),
      s"U must come from the grouped-value window, not a join:\n$plan")
    assert(plan.contains("Window"), s"cumulative fold expected:\n$plan")
    assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"value-group counts should combine map-side:\n$plan")
  }

  test("seasonal_mk: pair join keyed (key, season) — 7x less fan-out than MK") {
    val plan = planOf(SparkEntry.queries("seasonal_mk")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"span should broadcast:\n$plan")
  }

  test("burrows_delta: profile relations broadcast; pair join equi-keyed on word") {
    val plan = planOf(SparkEntry.queries("burrows_delta")(spark, sf))
    // the k-word × source grid builds via an INTENDED broadcast cross of
    // two type tables; the z-pair join itself must be hash-keyed on word
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert("BroadcastHashJoin \\[_bd_t".r.findFirstIn(plan).isDefined,
      s"pair join should hash on the word key:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"top-k/moments should broadcast:\n$plan")
  }

  test("para_dedup: cross-doc test is a semi-join on the hash key") {
    val plan = planOf(SparkEntry.queries("para_dedup")(spark, sf))
    assert(plan.contains("LeftSemi"), s"dup gate should semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("char_entropy: row-local bag fold, evaluated once, no window") {
    val plan = planOf(SparkEntry.queries("char_entropy")(spark, sf))
    // round-11 optimization: the (doc, char) explode+count+join is gone —
    // one CharEntropyStatsExpr per row, wrapped in explode(array(...)) so
    // the n>0 absence filter cannot sink below it and double-evaluate
    assert(plan.contains("charentropystatsexpr"),
      s"row-local entropy expression expected:\n$plan")
    assert("charentropystatsexpr".r.findAllIn(plan).size <= 2, // tree + detail
      s"entropy expression must evaluate once, not per reference:\n$plan")
    assert(!plan.contains("Window"), s"char_entropy needs no window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("mattr_ttr: explode then partial hash agg, no window") {
    val plan = planOf(SparkEntry.queries("mattr_ttr")(spark, sf))
    assert(plan.contains("Generate"), s"mattr_ttr should explode:\n$plan")
    assert(!plan.contains("Window"), s"mattr_ttr needs no window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("mcc_eval: confusion algebra is type-table joins, no corpus reshuffle") {
    val plan = planOf(SparkEntry.queries("mcc_eval")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"class-count relations should broadcast:\n$plan")
  }

  test("anova_length / levene_test: group-moment folds with partial agg") {
    for (q <- Seq("anova_length", "levene_test")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$q cartesian leaked:\n$plan")
      assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
        s"$q moments should combine map-side:\n$plan")
    }
  }

  test("ljung_box: composes the autocorr panel, lag join stays equi-keyed") {
    val plan = planOf(SparkEntry.queries("ljung_box")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"span/lags should broadcast:\n$plan")
  }

  test("kendall_tau: corpus collapses to the grid; cell pairs broadcast") {
    val plan = planOf(SparkEntry.queries("kendall_tau")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"grid side should broadcast:\n$plan")
    assert("partial_count|partial count".r.findFirstIn(plan).isDefined,
      s"grid build should combine map-side:\n$plan")
  }

  test("collocation_llr: no join to build bigrams; top-N is a TakeOrdered") {
    val plan = planOf(SparkEntry.queries("collocation_llr")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N must not global-sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("extreme_value: block maxima fold with partial max, span broadcast") {
    val plan = planOf(SparkEntry.queries("extreme_value")(spark, sf))
    assert(plan.contains("BroadcastExchange"), s"span should broadcast:\n$plan")
    assert("partial_max|partial max".r.findFirstIn(plan).isDefined,
      s"block maxima should combine map-side:\n$plan")
  }

  test("clustering_coeff: wedge join equi-keyed, closure is a semi-join") {
    val plan = planOf(SparkEntry.queries("clustering_coeff")(spark, sf))
    assert(plan.contains("LeftSemi"), s"closure should semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("friedman_test: rank self-join is day-keyed over the type grid") {
    val plan = planOf(SparkEntry.queries("friedman_test")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(plan).isDefined, s"rank join should be equi-keyed:\n$plan")
  }

  test("theil_decomp: corpus totals broadcast back, one scan per layer") {
    val plan = planOf(SparkEntry.queries("theil_decomp")(spark, sf))
    assert(plan.contains("BroadcastExchange"),
      s"totals should broadcast:\n$plan")
    assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"terms should combine map-side:\n$plan")
  }

  test("hurst_exponent: block cumsums window inside (key,size,block) only") {
    val plan = planOf(SparkEntry.queries("hurst_exponent")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("Window"), s"cumdev needs the block window:\n$plan")
    // the only windows run partitioned — no global (empty-partition) sort
    assert(!"Window \\[[^\\]]*\\]$".r.findFirstIn(plan).exists(_.contains("PartitionBy: \\[\\]")),
      s"window must stay partitioned:\n$plan")
  }

  test("kruskal_wallis: histogram rank algebra, no per-row rank window") {
    val plan = planOf(SparkEntry.queries("kruskal_wallis")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"counts should combine map-side:\n$plan")
    // the only window runs over the distinct-value histogram AFTER a
    // hash agg — the fact scan itself is never globally sorted
    assert(plan.contains("Window"), s"cum-rank window expected:\n$plan")
  }

  test("jarque_bera: broadcast means back onto one deviation scan") {
    val plan = planOf(SparkEntry.queries("jarque_bera")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"group means should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("runs_test: lag window stays partitioned by key") {
    val plan = planOf(SparkEntry.queries("runs_test")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("Window"), s"lag window expected:\n$plan")
    assert(!"Window.*PartitionBy: \\[\\]".r.findFirstIn(plan).isDefined,
      s"window must not collapse to one partition:\n$plan")
  }

  test("map_panel: gated postings scan, broadcast stats, windowed per-query rank") {
    val plan = planOf(SparkEntry.queries("map_panel")(spark, sf))
    // per-query ranks come from a qid-partitioned window (bounded by the
    // panel's candidate set), never a single-partition global sort
    assert(plan.contains("Window"), s"per-query rank window expected:\n$plan")
    assert(!"Window.*PartitionBy: \\[\\]".r.findFirstIn(plan).isDefined,
      s"window must not collapse to one partition:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"doc-freq/corpus stats should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("permutation_test: one exploded scan, map-side combine to B rows") {
    val plan = planOf(SparkEntry.queries("permutation_test")(spark, sf))
    assert(plan.contains("Generate"), s"replica explode expected:\n$plan")
    assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"replica sums should combine map-side:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("silhouette_ivf: one scan, centroid literals, no joins at all") {
    val plan = planOf(SparkEntry.queries("silhouette_ivf")(spark, sf))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"silhouette must not shuffle-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert("partial_count|partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"per-cluster fold should combine map-side:\n$plan")
  }

  test("cohort_ltv: cumulative window partitioned by cohort, sizes broadcast") {
    val plan = planOf(SparkEntry.queries("cohort_ltv")(spark, sf))
    assert(plan.contains("Window"), s"cumulative window expected:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"cohort sizes should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("pareto_share: percentile thresholds broadcast, no key sort") {
    val plan = planOf(SparkEntry.queries("pareto_share")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"thresholds should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(!plan.contains("Window"), s"no rank window should appear:\n$plan")
  }

  test("tukey_hsd: pair layer joins the group relation, not rows") {
    val plan = planOf(SparkEntry.queries("tukey_hsd")(spark, sf))
    assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"group moments should combine map-side:\n$plan")
    // the k² pair join rides the tiny group relation — broadcast, and the
    // only nested-loop is the one-row msw attach
    assert(!plan.contains("SortMergeJoin"),
      s"pair join must not shuffle the fact relation:\n$plan")
  }

  test("woe_iv: category-bounded counts, totals broadcast back") {
    val plan = planOf(SparkEntry.queries("woe_iv")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"totals should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("basket_lift: distinct collapse first, marginals broadcast, no cartesian") {
    val plan = planOf(SparkEntry.queries("basket_lift")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"marginals should broadcast:\n$plan")
    assert("partial_count|partial count".r.findFirstIn(plan).isDefined ||
      "partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"pair counts should combine map-side:\n$plan")
  }

  test("pot_tail: per-key thresholds broadcast back onto the day grid") {
    val plan = planOf(SparkEntry.queries("pot_tail")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"thresholds should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("churn_hazard: lifetimes are one hash agg; window rides the age relation") {
    val plan = planOf(SparkEntry.queries("churn_hazard")(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert("partial_min|partial_max|partial min|partial max".r
      .findFirstIn(plan).isDefined,
      s"lifetime agg should combine map-side:\n$plan")
    assert(plan.contains("Window"), s"reverse-cum window expected:\n$plan")
  }

  test("post_strat: one per-user pass, strata layer is agg-bounded") {
    val plan = planOf(SparkEntry.queries("post_strat")(spark, sf))
    assert(!plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"only the one-row total may nest:\n$plan")
    assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"user pass should combine map-side:\n$plan")
  }

  test("active_users: bounded fan-out explode, distinct aggs combine map-side") {
    val plan = planOf(SparkEntry.queries("active_users")(spark, sf))
    assert(plan.contains("Generate"), s"28-day fan-out explode expected:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
    assert("partial_count|partial count".r.findFirstIn(plan).isDefined,
      s"window counts should combine map-side:\n$plan")
  }

  test("effect_sizes: two one-row arm rollups, broadcast-composed") {
    val plan = planOf(SparkEntry.queries("effect_sizes")(spark, sf))
    assert(!plan.contains("SortMergeJoin"),
      s"one-row relations must not shuffle-join:\n$plan")
    assert("partial_sum|partial sum".r.findFirstIn(plan).isDefined,
      s"moments should combine map-side:\n$plan")
  }

  test("simpson_diversity: one explode, hash agg with map-side partials") {
    val plan = planOf(SparkEntry.queries("simpson_diversity")(spark, sf))
    assert(plan.contains("Generate"), s"tokens should explode once:\n$plan")
    assert(!plan.contains("Join"), s"diversity is join-free:\n$plan")
    assert("partial_count|partial count|HashAggregate".r.findFirstIn(plan).isDefined,
      s"token counts should combine map-side:\n$plan")
  }
}
