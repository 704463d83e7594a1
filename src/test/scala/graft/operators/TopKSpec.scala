package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("topk-spec")
    .getOrCreate()

  test("salted two-phase perKey equals the single-window form, all salt counts") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // skewed keys: key 0 holds half the rows (the case the salting exists for)
    val rows = (0 until 4000).map { i =>
      val k = if (rnd.nextBoolean()) 0 else rnd.nextInt(20)
      (i.toLong, s"k$k", rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("id", "key", "score").repartition(8)

    val naive = df
      .withColumn("rank",
        row_number().over(
          Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)).cast("long"))
      .where(col("rank") <= 7)
      .select("key", "rank", "id", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    for (salts <- Seq(1, 3, 32)) {
      val fast = TopK.perKey(df, Seq("key"),
          Seq(col("score").desc, col("id").asc), saltFrom = col("id"), n = 7, salts = salts)
        .select("key", "rank", "id", "score")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == naive, s"salts=$salts diverged")
    }
  }

  test("keys with fewer than n rows keep everything, ranked") {
    import spark.implicits._
    val df = Seq((1L, "a", 5.0), (2L, "a", 9.0), (3L, "b", 1.0)).toDF("id", "key", "score")
    val out = TopK.perKey(df, Seq("key"), Seq(col("score").desc, col("id").asc),
        saltFrom = col("id"), n = 10)
      .select("key", "rank", "id").as[(String, Long, Long)].collect().toSet
    assert(out == Set(("a", 1L, 2L), ("a", 2L, 1L), ("b", 1L, 3L)))
  }

  test("stage-1 window partitions by (key, salt), never by key alone over the input") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"k${i % 3}", i.toDouble)).toDF("id", "key", "score")
    val plan = TopK.perKey(df, Seq("key"), Seq(col("score").desc, col("id").asc),
        saltFrom = col("id"), n = 5).queryExecution.optimizedPlan.toString
    // Catalyst pre-projects the pmod(xxhash64(id)) salt into a _w0 column;
    // the stage-1 Window (and its WindowGroupLimit rank pushdown) must
    // partition by BOTH key and that salt column
    assert(plan.matches("(?s).*Window \\[row_number.*\\], \\[key#\\d+, _w0#\\d+L?\\].*"),
      s"salted cell window missing:\n$plan")
    assert(plan.contains("WindowGroupLimit [key"),
      s"rank-limit pushdown missing:\n$plan")
  }
}
