package graft

/** Plan-dump main for the optimization rounds: writes the
  * `.explain("formatted")` output of named board queries to
  * `plans/<tag>/<query>_<suffix>.txt` so plan-shape claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: sbt "runMain graft.PlanDump <tag> <suffix> <query> [query ...]"
  *   e.g. sbt "runMain graft.PlanDump r11 before pipeline_e2e map_panel"
  * `<query>` may be `ALL` to dump the whole board (slow — planning only,
  * no execution, but 377 queries still take a few minutes).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query...>")
    val tag = args(0)
    val suffix = args(1)
    val names =
      if (args(2) == "ALL") SparkEntry.queries.keys.toList.sorted
      else args.drop(2).toList
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions
      .builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-plandump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = java.nio.file.Paths.get(
      sys.props.getOrElse("user.dir", "."), "plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            // queryExecution.explainString gives exactly what
            // .explain("formatted") prints, as a string
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              outDir.resolve(s"${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote ${name}_$suffix.txt")
          } catch {
            case e: Exception =>
              System.err.println(s"[plandump] FAILED $name: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
