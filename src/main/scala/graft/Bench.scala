package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  *
  * Methodology:
  *   - results are fully materialized through the `noop` sink — a bare
  *     `.count()` would let Catalyst prune the projections and eliminate the
  *     sorts, timing a row-count scan instead of the query;
  *   - one discarded warmup pass (cheap `.count()`) primes JVM/codegen/
  *     Parquet footers so per-query numbers aren't ordering-biased;
  *   - a failed query reports -1 (and is excluded from the total) instead of
  *     masquerading as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions
      .builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toList.sortBy(_._1)
    // warmup (not timed)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
