package graft

/** Standalone protocol server — the runnable a basenine Go client connects
  * to unchanged (reference: server/server.go:33-48; same default port 9099).
  *
  * Usage: `sbt "runMain graft.ServerMain [port] [dataDir] [ingestShards]"`
  *   - port: TCP port (default 9099, the reference's default)
  *   - dataDir: engine log directory (default ./graft-data)
  *   - ingestShards: >1 routes /insert through the executor-side
  *     distributed pipeline (default 1 = strict single-writer parity)
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.lift(0).map(_.toInt).getOrElse(9099)
    val dataDir = args.lift(1).getOrElse("graft-data")
    val shards = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions
      .builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-server")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val eng = new graft.engine.Engine(spark, dataDir)
    val srv = new graft.server.ProtocolServer(eng, port, shards)
    val bound = srv.start()
    // the accept loop runs on a daemon thread; block the main thread like
    // the reference's server main
    println(s"graft listening on :$bound (data: $dataDir, ingestShards: $shards)")
    Thread.currentThread().join()
  }
}
