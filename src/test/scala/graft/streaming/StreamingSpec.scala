package graft.streaming

import java.nio.file.Files
import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine

/** Live-tail semantics: history is replayed, then NEW inserts keep arriving
  * through the same query (reference behavior of `/query`,
  * native.go:369-523 + watchPartitions).
  */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("streaming-spec")
    .getOrCreate()

  test("tail replays history then picks up new inserts, with redact applied") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-tail").toString
    val engine = new Engine(spark, dir)
    engine.insert((0 until 10).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""))

    val seen = mutable.ArrayBuffer[(Long, String)]()
    var lastLeftOff = -1L
    val q = Streaming.startTail(spark, dir, """keep == true and redact("n")""",
      (rows, leftOff) => { seen.synchronized { seen ++= rows }; lastLeftOff = leftOff })
    try {
      q.processAllAvailable()
      assert(seen.map(_._1).toSet == Set(0L, 2L, 4L, 6L, 8L))
      assert(seen.forall(_._2.contains("\"n\":\"[REDACTED]\"")))

      engine.insert((10 until 16).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""))
      q.processAllAvailable()
      assert(seen.map(_._1).toSet == Set(0L, 2L, 4L, 6L, 8L, 10L, 12L, 14L))
      assert(lastLeftOff == 14L)
    } finally q.stop()
  }

  test("streaming ingest drains a memory stream through the insertion filter") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ingest").toString
    val engine = new Engine(spark, dir)
    engine.setInsertionFilter("""keep == true""")

    implicit val sctx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = Streaming.startIngest(source.toDS(), engine)
    try {
      source.addData((0 until 10).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""): _*)
      q.processAllAvailable()
      assert(engine.totalRecords == 5)
      source.addData("""{"n":100,"keep":true}""", """{"n":101,"keep":false}""")
      q.processAllAvailable()
      assert(engine.totalRecords == 6)
    } finally q.stop()
  }
}
