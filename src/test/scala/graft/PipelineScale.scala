package graft

import org.apache.spark.sql.functions._

/** Honest scale anchor for the `pipeline_e2e` composite (diagnostic main,
  * not a spec): ScaleSmoke's generic document replica salts every word with
  * a `_rN` suffix, which pushes mean word length past the Gopher gate's
  * ≤ 10 bound — the gate (correctly) rejects most replicas and the
  * composite's 10× point measures the gate, not the composition. This main
  * builds a LENGTH-PRESERVING replica instead: each word's last character
  * is replaced by the replica digit, so word-length statistics (the gate's
  * features) are exactly the original's while cross-replica content
  * differs (near-dup/decontam tiers see distinct text).
  *
  *   sbt "Test/runMain graft.PipelineScale"
  */
object PipelineScale {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_PIPE_DIR", "/root/repo/tmp/pipe-smoke")
    val spark = Sessions.builder("local[32]", 32).appName("pipeline-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = spark.read.parquet(s"$base/documents.parquet")
    val span = docs1.agg(max(col("doc_id"))).head().getLong(0) + 1

    def time(dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("pipeline_e2e")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    println("| reps | n_docs | shards | t(pipeline_e2e) s |")
    println("|---|---|---|---|")
    for (reps <- Seq(1, 10)) {
      val repDf = spark.range(reps).select(col("id").as("rep"))
      // words of length <= 4 stay verbatim (the Gopher stopword feature —
      // "the"/"and" must survive the salt or every replica fails the gate);
      // longer words swap their last char for the replica digit: word-length
      // stats and stopword counts are exactly the original's, content
      // differs across replicas
      val docsN = docs1.crossJoin(broadcast(repDf))
        .withColumn("text",
          concat_ws(" ", transform(split(col("text"), " "),
            w => when(length(w) <= 4, w).otherwise(
              concat(substring(w, lit(1), length(w) - 1), pmod(col("rep"), lit(10)))))))
        .withColumn("doc_id", col("doc_id") + col("rep") * span)
        .drop("rep")
      val dir = s"$out/r$reps"
      docsN.repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val n = spark.read.parquet(s"$dir/documents.parquet").count()
      // one warm-up, then min-of-2
      time(dir)
      val t = math.min(time(dir), time(dir))
      val shards = SparkEntry.queries("pipeline_e2e")(spark, dir).count()
      println(f"| ${reps}x | $n | $shards | $t%.1f |")
    }
    spark.stop()
  }
}
