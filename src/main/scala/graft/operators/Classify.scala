package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based corpus classification — the fastText-classifier stage of a
  * CCNet/RefinedWeb-style pipeline (language ID, quality scoring against a
  * curated slice) as a multinomial Naive Bayes over unigram counts:
  * `argmax_c  log P(c) + Σ_t tf(t,d)·log P(t|c)` with Laplace smoothing
  * `P(t|c) = (n_tc+1)/(n_c+V)`. Linear-model scoring is exactly what runs
  * at pretraining scale (fastText is a linear bag-of-ngrams model); NB
  * gives the same scan-shaped scoring pass with closed-form training — no
  * SGD state, one aggregation builds the model.
  *
  * Plan shape at 100 TB: ONE explode pass builds the (doc, token, tf)
  * relation; the model — class-conditional token counts, class totals,
  * vocabulary size, class priors — derives from that same relation
  * restricted to the training split (a per-doc predicate riding the rows,
  * no second scan). The weight table is at most V×C rows and broadcasts
  * back onto the tf relation; scoring is a broadcast join + one
  * id-keyed aggregation. Tokens outside the training vocabulary are
  * ignored (the fastText convention for OOV ngrams without subword
  * fallback).
  *
  * Cross-engine exactness: every log weight is rounded to 6 decimals and
  * accumulated as DECIMAL weighted by the exact integer tf (the [[Dsir]]
  * convention), so per-(doc,class) scores are order-independent and
  * bit-equal in any engine; argmax ties break on the class label.
  */
object Classify {

  /** Train on docs where `idCol % trainMod != 0`, score ALL docs. Output:
    * (idCol, <labelCol>, pred_<labelCol>, score) — score is the winning
    * class's DECIMAL-exact log-posterior cast to double at the edge.
    */
  def nbClassify(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainMod: Int = 5): DataFrame = {
    val scores = posteriorScores(df, idCol, textCol, labelCol, trainMod)
    val id = col(idCol)
    // argmax as a hash aggregation, not a sort window: min of
    // (-post, class) orders by post DESC then class ASC — identical
    // tie-break to the row_number formulation it replaces, without the
    // per-doc sort (the scores relation is docs×C rows; at corpus scale
    // the extra window sort was the only non-hash stage left)
    scores
      .groupBy(id, col(labelCol))
      .agg(min(struct((-col("_nb_post")).as("_nb_neg"), col("_nb_c"))).as("_nb_w"))
      .select(id, col(labelCol), col("_nb_w._nb_c").as(s"pred_$labelCol"),
        (-col("_nb_w._nb_neg")).cast("double").as("score"))
  }

  /** The docs×C log-posterior relation (id, label, _nb_c, _nb_post) both
    * [[nbClassify]] and [[nbReliability]] consume — train on the
    * id % trainMod != 0 split; `heldOutOnly` restricts SCORING to the
    * held-out split (training input is unaffected): [[nbReliability]]
    * evaluates only held-out docs, so scoring the other (trainMod−1)/trainMod
    * of the corpus was pure waste — the filter sits below the weights join,
    * cutting the scoring join and the docs×C aggregation to 1/trainMod of
    * the corpus. Per-doc posteriors are unchanged by construction (the
    * model is fit before any scoring row exists). */
  private def posteriorScores(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainMod: Int, heldOutOnly: Boolean = false): DataFrame = {
    require(trainMod >= 2, s"nbClassify: trainMod must be >= 2, got $trainMod")
    val id = col(idCol)
    val isTrain: Column = id % trainMod =!= 0
    // barrier: the scaladoc's "ONE explode pass builds the (doc, token,
    // tf) relation" only holds with a materialization — tf feeds the
    // training aggregations AND the scoring join, and classCnt feeds
    // classTot/vocab/vSize/weights; without barriers each consumer
    // re-expanded the corpus explode (measured 26-Exchange plan, the tf
    // subtree evaluated 5x)
    val tf = Dedup.parallelize(df)
      .select(id, col(labelCol), isTrain.as("_nb_train"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("_nb_tok"))
      .groupBy(id, col(labelCol), col("_nb_train"), col("_nb_tok"))
      .agg(count(lit(1)).as("_nb_tf"))
      .localCheckpoint()
    val trainTf = tf.where(col("_nb_train"))
    // class-conditional counts, class totals, vocabulary — all V×C-bounded
    val classCnt = trainTf.groupBy(col(labelCol).as("_nb_c"), col("_nb_tok"))
      .agg(sum(col("_nb_tf")).as("_nb_ntc"))
      .localCheckpoint()
    val classTot = classCnt.groupBy("_nb_c").agg(sum(col("_nb_ntc")).as("_nb_nc"))
    val vocab = classCnt.select("_nb_tok").distinct()
    val vSize = vocab.agg(count(lit(1)).as("_nb_v"))
    val weights = vocab
      .crossJoin(broadcast(classTot))
      .crossJoin(broadcast(vSize))
      .join(classCnt, Seq("_nb_tok", "_nb_c"), "left")
      .select(col("_nb_tok"), col("_nb_c"),
        round(log((coalesce(col("_nb_ntc"), lit(0L)).cast("double") + lit(1.0)) /
                  (col("_nb_nc") + col("_nb_v")).cast("double")), 6)
          .cast("decimal(18,6)").as("_nb_logp"))
    // priors from the training split's per-class DOC counts
    // barrier: consumed by the prior projection AND its own total — C rows
    val docCnt = df.where(isTrain).groupBy(col(labelCol).as("_nb_c"))
      .agg(count(lit(1)).as("_nb_dc"))
      .localCheckpoint()
    val priors = docCnt
      .crossJoin(broadcast(docCnt.agg(sum(col("_nb_dc")).as("_nb_dt"))))
      .select(col("_nb_c"),
        round(log(col("_nb_dc").cast("double") / col("_nb_dt").cast("double")), 6)
          .cast("decimal(18,6)").as("_nb_prior"))
    val scoreTf = if (heldOutOnly) tf.where(!col("_nb_train")) else tf
    val scores = scoreTf
      .join(broadcast(weights), "_nb_tok")
      .groupBy(id, col(labelCol), col("_nb_c"))
      .agg(sum(col("_nb_tf").cast("decimal(18,6)") * col("_nb_logp")).as("_nb_s"))
      .join(broadcast(priors), "_nb_c")
      .select(id, col(labelCol), col("_nb_c"), (col("_nb_s") + col("_nb_prior")).as("_nb_post"))
    scores
  }

  /** Reliability diagram + expected calibration error (ECE — Naeini et al.,
    * AAAI 2015; Guo et al., ICML 2017) of the [[nbClassify]] model on its
    * HELD-OUT split: softmax the per-doc log-posteriors, bin the winning
    * confidence into `bins` fixed-width bins, and compare each bin's mean
    * confidence against its empirical accuracy. A classifier gating corpus
    * admission ("keep if P(good) > .8") is only as meaningful as this
    * curve — NB is notoriously over-confident, and ECE is the number that
    * says by how much.
    *
    * Exactness: confidence = 1/Σ exp(post_c − post_max) from the same
    * DECIMAL posteriors as the classifier, rounded to 6 BEFORE binning and
    * DECIMAL-summed per bin; accuracy from integer counts; the final ECE
    * folds gap·n as DECIMAL (order-free) with one double division at the
    * edge. One extra docs×C aggregation over the shared scores relation,
    * everything after is bins-bounded.
    */
  def nbReliability(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainMod: Int = 5, bins: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol)
    // heldOutOnly: only the evaluation split is ever read below, so only
    // it is scored. The argmax is a doc-keyed WINDOW over the same
    // relation the softmax folds — min(struct) over the window is the
    // identical order-free argmax the former groupBy+self-join computed,
    // but the window's hashpartitioning(id) already satisfies the
    // following aggregation's clustering (id ⊆ group key), so the whole
    // confidence pass costs ONE exchange instead of an aggregate exchange
    // plus a docs×C self-join (round-11 optimization; oracle unchanged —
    // the groups and every operand are identical by construction). With a
    // single consumer chain the former multi-consumer localCheckpoint on
    // `scores` is dead weight and dropped.
    val scores = posteriorScores(df, idCol, textCol, labelCol, trainMod,
        heldOutOnly = true)
    val byDoc = Window.partitionBy(id)
    val conf = scores
      .withColumn("_nb_w",
        min(struct((-col("_nb_post")).as("_nb_neg"), col("_nb_c"))).over(byDoc))
      .select(id, col(labelCol), col("_nb_w._nb_c").as("_nb_pred"),
        (-col("_nb_w._nb_neg")).as("_nb_maxpost"), col("_nb_post"))
      .groupBy(id, col(labelCol), col("_nb_pred"), col("_nb_maxpost"))
      .agg(sum(exp((col("_nb_post") - col("_nb_maxpost")).cast("double"))).as("_nb_z"))
      .where(id % trainMod === 0)
      .select(id,
        (col("_nb_pred") === col(labelCol)).cast("long").as("correct"),
        round(lit(1.0) / col("_nb_z"), 6).as("conf"))
    val per = conf
      .withColumn("bin",
        least(floor(col("conf") * bins), lit(bins - 1)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("conf").cast("decimal(18,6)")).as("_sconf"),
        sum(col("correct")).as("_scorr"))
      .select(col("bin"), col("n"),
        round(col("_sconf").cast("double") / col("n").cast("double"), 6)
          .as("avg_conf"),
        round(col("_scorr").cast("double") / col("n").cast("double"), 6)
          .as("accuracy"))
    val w = Window.partitionBy()
    per
      .withColumn("gap",
        round(abs(col("accuracy") - col("avg_conf")), 6).cast("decimal(18,6)"))
      .withColumn("ece",
        round(sum(col("gap") * col("n")).over(w).cast("double") /
          sum(col("n")).over(w).cast("double"), 6))
      .select(col("bin"), col("n"), col("avg_conf"), col("accuracy"),
        col("gap").cast("double").as("gap"), col("ece"))
  }

  /** DuckDB mirror of [[nbClassify]] — same smoothing, rounding points,
    * DECIMAL accumulation, and tie-break.
    */
  def nbClassifySql(table: String, idCol: String, textCol: String,
      labelCol: String, trainMod: Int = 5): String =
    s"""WITH ${nbCtes(table, idCol, textCol, labelCol, trainMod)},
       rk AS (SELECT *, row_number() OVER (PARTITION BY $idCol
               ORDER BY post DESC, c) AS rn FROM sc)
       SELECT $idCol, $labelCol, c AS pred_$labelCol, CAST(post AS DOUBLE) AS score
       FROM rk WHERE rn = 1 ORDER BY $idCol"""

  /** DuckDB mirror of [[nbReliability]]. */
  def nbReliabilitySql(table: String, idCol: String, textCol: String,
      labelCol: String, trainMod: Int = 5, bins: Int = 10): String =
    s"""WITH ${nbCtes(table, idCol, textCol, labelCol, trainMod)},
       best AS (SELECT $idCol, $labelCol, c AS pred, post AS maxpost FROM (
           SELECT *, row_number() OVER (PARTITION BY $idCol
             ORDER BY post DESC, c) AS rn FROM sc) WHERE rn = 1),
       cf AS (SELECT sc.$idCol,
           MAX(CASE WHEN best.pred = best.$labelCol THEN 1 ELSE 0 END) AS correct,
           round(1.0 / SUM(exp(CAST(sc.post - best.maxpost AS DOUBLE))), 6) AS conf
         FROM sc JOIN best ON sc.$idCol = best.$idCol
         WHERE sc.$idCol % $trainMod = 0
         GROUP BY sc.$idCol),
       per AS (SELECT least(CAST(floor(conf * $bins) AS INT), ${bins - 1}) AS bin,
           COUNT(*) AS n,
           SUM(CAST(conf AS DECIMAL(18,6))) AS sconf,
           SUM(correct) AS scorr
         FROM cf GROUP BY 1),
       g AS (SELECT bin, CAST(n AS BIGINT) AS n,
           round(CAST(sconf AS DOUBLE) / CAST(n AS DOUBLE), 6) AS avg_conf,
           round(CAST(scorr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy
         FROM per),
       g2 AS (SELECT *,
           CAST(round(abs(accuracy - avg_conf), 6) AS DECIMAL(18,6)) AS gap
         FROM g)
       SELECT bin, n, avg_conf, accuracy, CAST(gap AS DOUBLE) AS gap,
         round(CAST(SUM(gap * n) OVER () AS DOUBLE)
           / CAST(SUM(n) OVER () AS DOUBLE), 6) AS ece
       FROM g2 ORDER BY bin"""

  /** Shared CTE chain through `sc` (the docs×C posterior relation) — same
    * smoothing, rounding points, DECIMAL accumulation as the Spark side. */
  /** Multiclass Matthews correlation (Gorodkin 2004, R_K) plus accuracy
    * and macro-F1 from a (label, prediction) relation — the single-number
    * classifier card that, unlike accuracy, stays honest under class
    * imbalance (a majority-class guesser scores MCC 0, accuracy 0.9).
    *
    *   R_K = (c·s − Σ_k p_k t_k) / sqrt((s² − Σp_k²)(s² − Σt_k²))
    *
    * Everything folds from the confusion matrix (a classes² type table):
    * counts are integers, the cross products go DECIMAL(38,0), and floats
    * appear only in the two final sqrt/divisions. Macro-F1 averages
    * per-TRUE-class F1 (prediction-only classes contribute to precision
    * denominators, not to the class mean), each rounded to 9 then
    * DECIMAL-folded.
    */
  def mccEval(labeled: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val conf = labeled.groupBy(col(labelCol).as("y"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
    val t = conf.groupBy(col("y").as("k")).agg(sum(col("n")).as("tk"))
    val pc = conf.groupBy(col("p").as("k")).agg(sum(col("n")).as("pk"))
    val tot = conf.agg(sum(col("n")).as("s"),
      sum(when(col("y") === col("p"), col("n")).otherwise(lit(0L))).as("c"))
    val kj = t.join(pc, Seq("k"), "full_outer")
      .select(col("k"), coalesce(col("tk"), lit(0L)).as("tk"),
        coalesce(col("pk"), lit(0L)).as("pk"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    val sums = kj.agg(
      sum((dec(col("tk")) * dec(col("pk"))).cast("decimal(38,0)")).as("spt"),
      sum((dec(col("pk")) * dec(col("pk"))).cast("decimal(38,0)")).as("spp"),
      sum((dec(col("tk")) * dec(col("tk"))).cast("decimal(38,0)")).as("stt"))
    val tp = conf.where(col("y") === col("p"))
      .select(col("y").as("k"), col("n").as("tp"))
    def d(c: Column) = c.cast("double")
    val f1k = kj.where(col("tk") > 0)
      .join(tp, Seq("k"), "left")
      .select(round(lit(2.0) * d(coalesce(col("tp"), lit(0L))) /
        (d(col("tk")) + d(col("pk"))), 9).cast("decimal(18,9)").as("f1"))
      .agg(count(lit(1)).as("n_classes"), sum(col("f1")).as("sf1"))
    val s2 = d(col("s")) * d(col("s"))
    val num = d(col("c")) * d(col("s")) - d(col("spt"))
    val den = sqrt((s2 - d(col("spp"))) * (s2 - d(col("stt"))))
    tot.crossJoin(broadcast(sums)).crossJoin(broadcast(f1k))
      .select(col("s").as("n"), col("c").as("correct"), col("n_classes"),
        round(d(col("c")) / d(col("s")), 6).as("accuracy"),
        round(d(col("sf1")) / d(col("n_classes")), 6).as("macro_f1"),
        when(den > 0, round(num / den, 6)).as("mcc"))
  }

  /** DuckDB mirror of [[mccEval]]; `labeledSql` yields (labelCol, predCol). */
  def mccEvalSql(labeledSql: String, labelCol: String,
      predCol: String): String =
    s"""WITH lab AS ($labeledSql),
       conf AS (SELECT $labelCol AS y, $predCol AS p, COUNT(*) AS n
         FROM lab GROUP BY 1, 2),
       t AS (SELECT y AS k, SUM(n) AS tk FROM conf GROUP BY y),
       pc AS (SELECT p AS k, SUM(n) AS pk FROM conf GROUP BY p),
       tot AS (SELECT CAST(SUM(n) AS BIGINT) AS s,
           CAST(SUM(CASE WHEN y = p THEN n ELSE 0 END) AS BIGINT) AS c FROM conf),
       kj AS (SELECT COALESCE(t.k, pc.k) AS k,
           CAST(COALESCE(tk, 0) AS BIGINT) AS tk,
           CAST(COALESCE(pk, 0) AS BIGINT) AS pk
         FROM t FULL OUTER JOIN pc ON t.k = pc.k),
       sums AS (SELECT
           SUM(CAST(CAST(tk AS DECIMAL(19,0)) * CAST(pk AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS spt,
           SUM(CAST(CAST(pk AS DECIMAL(19,0)) * CAST(pk AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS spp,
           SUM(CAST(CAST(tk AS DECIMAL(19,0)) * CAST(tk AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS stt
         FROM kj),
       tp AS (SELECT y AS k, n AS tp FROM conf WHERE y = p),
       f1k AS (SELECT COUNT(*) AS n_classes,
           SUM(CAST(round(2.0 * CAST(COALESCE(tp, 0) AS DOUBLE)
             / (CAST(tk AS DOUBLE) + CAST(pk AS DOUBLE)), 9) AS DECIMAL(18,9))) AS sf1
         FROM kj LEFT JOIN tp ON kj.k = tp.k WHERE tk > 0)
       SELECT s AS n, c AS correct, n_classes,
         round(CAST(c AS DOUBLE) / CAST(s AS DOUBLE), 6) AS accuracy,
         round(CAST(sf1 AS DOUBLE) / CAST(n_classes AS DOUBLE), 6) AS macro_f1,
         CASE WHEN sqrt((CAST(s AS DOUBLE) * CAST(s AS DOUBLE) - CAST(spp AS DOUBLE))
                * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE) - CAST(stt AS DOUBLE))) > 0
           THEN round((CAST(c AS DOUBLE) * CAST(s AS DOUBLE) - CAST(spt AS DOUBLE))
             / sqrt((CAST(s AS DOUBLE) * CAST(s AS DOUBLE) - CAST(spp AS DOUBLE))
                  * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE) - CAST(stt AS DOUBLE))), 6)
           END AS mcc
       FROM tot CROSS JOIN sums CROSS JOIN f1k"""

  private def nbCtes(table: String, idCol: String, textCol: String,
      labelCol: String, trainMod: Int): String =
    s"""w AS (SELECT $idCol, $labelCol, $idCol % $trainMod <> 0 AS is_train,
             string_split_regex(trim(lower($textCol)),'\\s+') AS ws FROM $table),
       tk AS (SELECT $idCol, $labelCol, is_train, unnest(ws) AS tok FROM w),
       tf AS (SELECT $idCol, $labelCol, is_train, tok, COUNT(*) AS tf
           FROM tk GROUP BY 1, 2, 3, 4),
       cc AS (SELECT $labelCol AS c, tok, SUM(tf) AS ntc
           FROM tf WHERE is_train GROUP BY 1, 2),
       ct AS (SELECT c, SUM(ntc) AS nc FROM cc GROUP BY c),
       vocab AS (SELECT DISTINCT tok FROM cc),
       v AS (SELECT COUNT(*) AS vs FROM vocab),
       wt AS (SELECT vocab.tok, ct.c,
             CAST(round(ln((CAST(COALESCE(cc.ntc, 0) AS DOUBLE) + 1.0)
               / CAST(ct.nc + v.vs AS DOUBLE)), 6) AS DECIMAL(18,6)) AS logp
           FROM vocab CROSS JOIN ct CROSS JOIN v
           LEFT JOIN cc ON cc.tok = vocab.tok AND cc.c = ct.c),
       dc AS (SELECT $labelCol AS c, COUNT(*) AS n FROM $table
           WHERE $idCol % $trainMod <> 0 GROUP BY 1),
       pr AS (SELECT c, CAST(round(ln(CAST(n AS DOUBLE)
               / CAST((SELECT SUM(n) FROM dc) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS prior
           FROM dc),
       sc AS (SELECT tf.$idCol, tf.$labelCol, wt.c,
             SUM(CAST(tf.tf AS DECIMAL(18,6)) * wt.logp) + ANY_VALUE(pr.prior) AS post
           FROM tf JOIN wt ON tf.tok = wt.tok JOIN pr ON pr.c = wt.c
           GROUP BY 1, 2, 3)"""
}
