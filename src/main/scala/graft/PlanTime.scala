package graft

/** Optimization-round diagnostic: per-query Catalyst phase timings
  * (parsing/analysis/optimization/planning) from the QueryPlanningTracker,
  * plus wall time of the noop execution — separates driver planning cost
  * from execution cost. Usage: sbt "runMain graft.PlanTime <query...>|ALL"
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-plantime").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.isEmpty || args(0) == "ALL") SparkEntry.queries.keys.toList.sorted
      else args.toList
    println("query,wall_s,analysis_ms,optimization_ms,planning_ms")
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          val phases = df.queryExecution.tracker.phases
          def ms(k: String): Long =
            phases.get(k).map(p => p.endTimeMs - p.startTimeMs).getOrElse(-1L)
          println(f"$name,$dt%.3f,${ms("analysis")},${ms("optimization")},${ms("planning")}")
        } catch {
          case e: Exception => System.err.println(s"[plantime] FAILED $name: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
