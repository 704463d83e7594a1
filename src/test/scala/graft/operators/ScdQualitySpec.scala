package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 session-5 operators: SCD2 merge, histogram-CDF quality blend,
  * MinHash calibration audit.
  */
class ScdQualitySpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("scd-quality-spec")
    .getOrCreate()
  private lazy val sf = "/root/testdata/sf0.001"

  // ---------------------------------------------------------------- SCD2

  test("scd2: changed id yields closed v0 + open v1; no-op and new ids covered") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val upd = Seq((2L, "beta v2"), (3L, "gamma"), (9L, "delta")).toDF("id", "text")
    val out = Scd.merge2(base, upd, "id", "text")
      .select($"id", $"version", $"valid_from", $"valid_to")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 0L, 0L, None),          // untouched
      (2L, 0L, 0L, Some(1L)),      // superseded, closed at batch 1
      (2L, 1L, 1L, None),          // new current version
      (3L, 0L, 0L, None),          // idempotent redelivery: no new version
      (9L, 0L, 1L, None)           // insert, valid from batch 1
    ))
  }

  test("scd2: empty update batch carries every base row open and unversioned") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val upd = Seq.empty[(Long, String)].toDF("id", "text")
    val out = Scd.merge2(base, upd, "id", "text")
      .select($"id", $"version", $"valid_from", $"valid_to")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(out == Set((1L, 0L, 0L, None), (2L, 0L, 0L, None)))
  }

  test("scd2: exactly one open row per id at all times") {
    val docs = graft.Tables.documents(spark, sf)
    val changed = docs.where(col("doc_id") % 7 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" [rev2]")).as("text"))
    val out = Scd.merge2(docs, changed, "doc_id", "text")
    val openPerId = out.where(col("valid_to").isNull)
      .groupBy("id").count().where(col("count") =!= 1)
    assert(openPerId.count() == 0)
    // history: closed rows exist exactly for the changed ids
    assert(out.where(col("valid_to").isNotNull).count() ==
      docs.where(col("doc_id") % 7 === 0).count())
  }

  // ------------------------------------------------------- quality blend

  test("quality blend: scores in [0,1], deciles in [0,9], one row per doc") {
    val docs = graft.Tables.documents(spark, sf)
    val out = QualityBlend.blend(docs, "doc_id", "text").cache()
    try {
      assert(out.count() == docs.count())
      assert(out.where(col("blend") < 0 || col("blend") > 1).count() == 0)
      assert(out.where(col("decile") < 0 || col("decile") > 9).count() == 0)
    } finally out.unpersist()
  }

  test("quality blend: monotone — higher raw signals never get a lower CDF") {
    import spark.implicits._
    // one-signal-dominant corpus: token count strictly increases with id
    // while the other signals stay constant — doc i holds the first i of 40
    // DISTINCT fixed-width tokens (ttr = 1, mean length = 3 for every doc),
    // so blend must be nondecreasing in id
    val docs = (1 to 40)
      .map(i => (i.toLong, (1 to i).map(j => f"t$j%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = QualityBlend.blend(docs, "doc_id", "text")
      .orderBy("doc_id").select("blend").as[Double].collect()
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b })
  }

  // ------------------------------------------------- incremental agg merge

  test("incr agg merge: merge of split states equals the direct aggregate") {
    import spark.implicits._
    val evts = graft.Tables.events(spark, sf)
    val half = pmod(col("event_id"), lit(2))
    val merged = Incremental.present(Incremental.merge(
      Incremental.aggState(evts.where(half === 0), "event_type", "value"),
      Incremental.aggState(evts.where(half === 1), "event_type", "value"),
      "event_type"), "event_type")
    val direct = evts.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 6).as("total"),
        round(min("value"), 6).as("vmin"), round(max("value"), 6).as("vmax"))
      .orderBy("event_type")
    assert(merged.collect().toSeq == direct.collect().toSeq)
  }

  test("incr agg merge: keys unique to either side carry through") {
    import spark.implicits._
    val a = Seq(("x", 1.0), ("x", 2.0)).toDF("k", "v")
    val b = Seq(("y", 5.0)).toDF("k", "v")
    val out = Incremental.present(Incremental.merge(
        Incremental.aggState(a, "k", "v"), Incremental.aggState(b, "k", "v"), "k"),
        "k")
      .select($"k", $"n", $"total", $"vmin", $"vmax")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("x", 2L, 3.0, 1.0, 2.0), ("y", 1L, 5.0, 5.0, 5.0)))
  }

  test("incr agg merge: merge is closed over the state schema and chains") {
    import spark.implicits._
    val a = Seq(("x", 1.0), ("x", 2.0)).toDF("k", "v")
    val b = Seq(("y", 5.0), ("x", 0.5)).toDF("k", "v")
    val c = Seq(("z", 7.0), ("y", 0.25)).toDF("k", "v")
    // three-way chained fold == direct aggregate over the union
    val chained = Incremental.present(
      Incremental.merge(
        Incremental.merge(
          Incremental.aggState(a, "k", "v"), Incremental.aggState(b, "k", "v"), "k"),
        Incremental.aggState(c, "k", "v"), "k"),
      "k")
    val direct = Incremental.present(
      Incremental.aggState(a.union(b).union(c), "k", "v"), "k")
    assert(chained.collect().toSeq == direct.collect().toSeq)
    // and the merged state keeps the exact-DECIMAL column for further folds
    val st = Incremental.merge(
      Incremental.aggState(a, "k", "v"), Incremental.aggState(b, "k", "v"), "k")
    assert(st.schema("s").dataType.typeName.startsWith("decimal"))
  }

  // ----------------------------------------------------- filter agreement

  test("filter agreement: independent gates score kappa 0, identical gates 1") {
    import spark.implicits._
    // 2x2 balanced: po = 0.5 equals chance agreement pe = 0.5 -> kappa 0
    val a = Seq((1L, true), (2L, true), (3L, false), (4L, false)).toDF("id", "ka")
    val b = Seq((1L, true), (2L, false), (3L, true), (4L, false)).toDF("id", "kb")
    val r0 = Audit.filterAgreement(a, b, "id", "ka", "kb").collect().head
    assert(r0.getAs[Double]("kappa") == 0.0 && r0.getAs[Long]("n") == 4L &&
      r0.getAs[Long]("n11") == 1L && r0.getAs[Long]("n00") == 1L)
    // identical mixed gates -> po = 1, pe < 1 -> kappa 1
    val r1 = Audit.filterAgreement(a, a.withColumnRenamed("ka", "kb"), "id", "ka", "kb")
      .collect().head
    assert(r1.getAs[Double]("kappa") == 1.0)
    // degenerate: both gates all-true -> pe = 1, kappa pinned to 1
    val t = Seq((1L, true), (2L, true)).toDF("id", "ka")
    val r2 = Audit.filterAgreement(t, t.withColumnRenamed("ka", "kb"), "id", "ka", "kb")
      .collect().head
    assert(r2.getAs[Double]("kappa") == 1.0)
  }

  // ------------------------------------------------------ threshold sweep

  test("dedup sweep: monotone nonincreasing curve; zero-survivor thresholds drop out") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L, 0.95), (3L, 4L, 0.80), (5L, 6L, 0.80), (7L, 8L, 0.40))
      .toDF("id_a", "id_b", "jaccard")
    val out = Dedup.thresholdSweep(pairs, Seq(0.3, 0.5, 0.9, 0.99))
      .select($"threshold", $"n_pairs", $"n_docs_affected")
      .as[(Double, Long, Long)].collect().toSeq
    // 0.99 has zero survivors and drops out of the curve entirely
    assert(out == Seq((0.3, 4L, 8L), (0.5, 3L, 6L), (0.9, 1L, 2L)), s"got $out")
  }

  // --------------------------------------------------- minhash calibration

  test("minhash calibration: bucket-bounded output, means in [0,1], pairs conserved") {
    val docs = graft.Tables.documents(spark, sf)
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
      k = 8, rowsPerBand = 2, threshold = 0.2).localCheckpoint()
    val out = Dedup.minhashCalibration(pairs, docs, "doc_id", "text").cache()
    try {
      val rows = out.collect()
      assert(rows.nonEmpty && rows.length <= 4)
      assert(rows.map(_.getAs[Long]("n_pairs")).sum == pairs.count())
      rows.foreach { r =>
        assert(r.getAs[Double]("mean_est") >= 0 && r.getAs[Double]("mean_est") <= 1)
        assert(r.getAs[Double]("mean_exact") >= 0 && r.getAs[Double]("mean_exact") <= 1)
        assert(r.getAs[Double]("mae") >= 0 && r.getAs[Double]("mae") <= 1)
      }
    } finally out.unpersist()
  }
}
