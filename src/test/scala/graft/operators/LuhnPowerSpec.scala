package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-7 session-3 batch 3: Luhn PII validation, held-out perplexity,
  * power planning, MASE forecast eval.
  */
class LuhnPowerSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("luhn-power-spec")
    .getOrCreate()
  private lazy val sf = "/root/testdata/sf0.001"

  test("luhn: textbook-valid card accepted, any single-digit flip rejected") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 4539578763621486 is Luhn-valid (standard test vector)
    val valid = "4539578763621486"
    val flipped = valid.updated(3, '8') // 9 -> 8
    val docs = Seq((1L, s"pay with $valid now"), (2L, s"pay with $flipped now"))
      .toDF("id", "body")
    val out = Privacy.luhnScan(docs, "id", "body")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && !out(2L))
  }

  test("luhn board synthesis: even ids validate, odd ids fail, one candidate each") {
    val out = graft.SparkEntry.queries("pii_luhn")(spark, sf).collect()
    assert(out.length == graft.Tables.documents(spark, sf).count())
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Boolean]("luhn_valid") == (id % 2 == 0), s"doc $id")
      assert(r.getString(1).length == 16)
    }
  }

  test("held-out ppl: only eval-split docs scored; OOV text prices higher") {
    import spark.implicits._
    val common = "alpha beta gamma delta"
    val docs = (1L to 40L).map { i =>
      // doc 10 (held-out) is pure unseen vocabulary
      val t = if (i == 10) "zz1 zz2 zz3 zz4" else common
      (i, t)
    }.toDF("doc_id", "text")
    val out = TextAnalysis.heldoutPpl(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_nll")).toMap
    assert(out.keySet.forall(_ % 5 == 0))
    assert(out(10L) > out(5L) + 1.0,
      s"unseen vocab must price above train vocab: ${out(10L)} vs ${out(5L)}")
  }

  test("power planner: quadrupling the target lift divides required n by ~16") {
    val ev = graft.Tables.events(spark, sf)
    def nReq(lift: Double) =
      EventSeq.powerPlanner(ev, "user_id", "value", liftFrac = lift)
        .collect().head.getAs[Long]("n_required_per_arm")
    val n5 = nReq(0.05); val n20 = nReq(0.20)
    assert(n5 > 0 && n20 > 0)
    val ratio = n5.toDouble / n20.toDouble
    assert(ratio > 14.0 && ratio < 18.0, s"n ∝ 1/δ²: ratio $ratio")
  }

  test("shard digest: partitioning-invariant; one mutated doc flips only its shard") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val assign = Sharding.packShards(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 10000)
    def digest(d: org.apache.spark.sql.DataFrame) =
      Sharding.shardContentDigest(assign, d, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val base = digest(docs)
    assert(base == digest(docs.repartition(7)), "digest must not see partitioning")
    val mutatedId = 3L
    val mutShard = assign.where(col("doc_id") === mutatedId)
      .collect().head.getAs[Long]("shard")
    val mutated = digest(docs.withColumn("text",
      when(col("doc_id") === mutatedId, concat(col("text"), lit(" tampered")))
        .otherwise(col("text"))))
    assert(mutated(mutShard) != base(mutShard), "tampered shard must flip")
    (base.keySet - mutShard).foreach(s =>
      assert(mutated(s) == base(s), s"untouched shard $s must not flip"))
  }

  test("mase: perfect weekly cycle scores 0, linear growth scores 7") {
    import spark.implicits._
    def ts(d: Int, i: Int) = new Timestamp(d * 86400000L + i * 1000L)
    val weekly = (0 until 28).flatMap { d =>
      (0 until (3 + d % 7)).map(i => ("weekly", ts(d, i)))
    }
    val linear = (0 until 28).flatMap { d =>
      (0 until (d + 1)).map(i => ("linear", ts(d, i)))
    }
    val out = Temporal.maseEval((weekly ++ linear).toDF("k", "ts"), "k", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mase"), r.getAs[Double]("mae_seasonal"))).toMap
    assert(out("weekly")._2 == 0.0 && out("weekly")._1 == 0.0)
    assert(out("linear")._1 == 7.0, s"linear growth: ${out("linear")}")
  }
}
