package graft.client

import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine
import graft.server.ProtocolServer

/** The client library driven against a live server — the reference's
  * client_test.go scenarios through the Scala API (connect, insert mode,
  * streaming query + metadata, single, fetch both directions, validate,
  * macro, insertion filter, limit, flush, reset).
  */
class ClientSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("client-spec")
    .getOrCreate()

  private def withServer(f: (Engine, Int) => Unit): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-client").toString
    val engine = new Engine(spark, dir)
    val srv = new ProtocolServer(engine, 0, 1)
    val port = srv.start()
    try f(engine, port)
    finally srv.stop()
  }

  private def awaitRecords(engine: Engine, n: Long): Unit = {
    var tries = 0
    while (engine.totalRecords < n && tries < 300) { Thread.sleep(100); tries += 1 }
    assert(engine.totalRecords == n, s"ingest stalled at ${engine.totalRecords}/$n")
  }

  test("insert mode + single + validate round-trip") {
    withServer { (engine, port) =>
      val c = Client.connect("127.0.0.1", port)
      c.insertMode()
      (0 until 5).foreach(i => c.sendText(s"""{"n":$i,"tag":"t$i"}"""))
      awaitRecords(engine, 5)
      c.close()

      val got = Client.single("127.0.0.1", port, "3")
      assert(got.isRight)
      assert(got.toOption.get.contains("\"n\":3"))
      assert(got.toOption.get.contains("\"id\":\"000000000000000000000003\""))

      val missing = Client.single("127.0.0.1", port, "99")
      assert(missing.isLeft)

      assert(Client.validate("127.0.0.1", port, "n > 2").isRight)
      val bad = Client.validate("127.0.0.1", port, "n >")
      assert(bad.isLeft)
    }
  }

  test("streaming query delivers matching records and progress metadata") {
    withServer { (engine, port) =>
      val ins = Client.connect("127.0.0.1", port)
      ins.insertMode()
      (0 until 10).foreach(i => ins.sendText(s"""{"n":$i}"""))
      awaitRecords(engine, 10)
      ins.close()

      val data = new ConcurrentLinkedQueue[String]()
      val metas = new ConcurrentLinkedQueue[Client.Metadata]()
      val done = new CountDownLatch(5) // n in 5..9
      val q = Client.connect("127.0.0.1", port)
      try {
        q.query("", "n >= 5")(
          l => { data.add(l); done.countDown() },
          m => metas.add(m))
        assert(done.await(30, TimeUnit.SECONDS),
          s"only ${data.size} records arrived")
        val ns = data.toArray(Array.empty[String]).toSeq
        assert(ns.forall(_.contains("\"n\":")))
        assert(ns.size == 5)
        // progress metadata counted every scanned record up to the total
        assert(!metas.isEmpty)
        assert(metas.toArray(Array.empty[Client.Metadata]).last.total == 10)
      } finally q.close()
    }
  }

  test("fetch pages both directions with first/last metadata") {
    withServer { (engine, port) =>
      val ins = Client.connect("127.0.0.1", port)
      ins.insertMode()
      (0 until 10).foreach(i => ins.sendText(s"""{"n":$i}"""))
      awaitRecords(engine, 10)
      ins.close()

      // forward limited page: 3 matches, offsets remain → no %quit%; the
      // client must exit on the trailing-metadata rule, not the timeout
      val t0 = System.nanoTime()
      val (fwd, f1, fl) = Client.fetch("127.0.0.1", port, "-1", 1, "n >= 5", 3)
      assert((System.nanoTime() - t0) < 15L * 1000 * 1000 * 1000,
        "limited page waited for the timeout instead of the metadata exit")
      assert(fwd.size == 3)
      assert(fwd.head.contains("\"n\":5") && fwd.last.contains("\"n\":7"))
      assert(f1.nonEmpty && fl.nonEmpty)
      assert(fl.get.leftOff == "000000000000000000000008")

      // backward from latest — EXCLUSIVE of leftOff (index 9), so ids 8..0
      val (bwd, _, bl) = Client.fetch("127.0.0.1", port, "latest", -1, "", 100)
      assert(bwd.size == 9)
      assert(bwd.head.contains("\"n\":8") && bwd.last.contains("\"n\":0"))
      assert(bl.nonEmpty)
    }
  }

  test("macro + insertion filter + limit + flush + reset verbs") {
    withServer { (engine, port) =>
      assert(Client.defineMacro("127.0.0.1", port, "big", "n > 7").isRight)
      assert(Client.insertionFilter("127.0.0.1", port, "n >= 2").isRight)
      assert(Client.limit("127.0.0.1", port, 1000000L).isRight)

      val ins = Client.connect("127.0.0.1", port)
      ins.insertMode()
      (0 until 10).foreach(i => ins.sendText(s"""{"n":$i}"""))
      awaitRecords(engine, 8) // insertion filter dropped n=0,1
      ins.close()

      // the macro expands inside a fetch query
      val (viaMacro, _, _) = Client.fetch("127.0.0.1", port, "-1", 1, "big", 100)
      assert(viaMacro.size == 2) // n=8,9

      assert(Client.flush("127.0.0.1", port).isRight)
      assert(engine.totalRecords == 0)
      // flush keeps the insertion filter; reset clears it
      assert(Client.reset("127.0.0.1", port).isRight)
      val ins2 = Client.connect("127.0.0.1", port)
      ins2.insertMode()
      ins2.sendText("""{"n":0}""")
      awaitRecords(engine, 1) // would have been dropped pre-reset
      ins2.close()
    }
  }
}
