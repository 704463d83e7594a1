package graft

/** Temporary profiling main — NOT part of the library; deleted before commit.
  * Usage: sbt "runMain graft.Prof <queryName> [reps]"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dup_spans_strip")
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).appName("graft-prof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warmup
    fn(spark, sfDir).count()
    val gcBetween = sys.env.get("PROF_GC").contains("1")
    (1 to reps).foreach { i =>
      if (gcBetween) { System.gc(); Thread.sleep(500) }
      val rt = Runtime.getRuntime
      val usedBefore = (rt.totalMemory - rt.freeMemory) / (1 << 20)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val usedAfter = (rt.totalMemory - rt.freeMemory) / (1 << 20)
      println(f"[prof] $name rep $i: $dt%.2f s  heap ${usedBefore}M -> ${usedAfter}M")
    }
    spark.stop()
  }
}
