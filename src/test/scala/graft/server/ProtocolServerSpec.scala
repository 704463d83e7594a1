package graft.server

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine

/** Wire-protocol e2e, modeled on the reference's server tests over net.Pipe
  * (reference: server/server_test.go:19-605). Each connection speaks the
  * line protocol through a real socket.
  */
class ProtocolServerSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("protocol-spec")
    .getOrCreate()

  private def withServer(f: (Engine, Int) => Unit): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-proto").toString
    val engine = new Engine(spark, dir)
    val srv = new ProtocolServer(engine, 0)
    val port = srv.start()
    try f(engine, port)
    finally srv.stop()
  }

  private def connect(port: Int): (Socket, BufferedReader, PrintWriter) = {
    val s = new Socket("127.0.0.1", port)
    (s, new BufferedReader(new InputStreamReader(s.getInputStream)),
      new PrintWriter(s.getOutputStream, true))
  }

  private val car = """{"brand":{"name":"Chevrolet"},"model":"Camaro","year":2021}"""

  test("insert then single via wire protocol") {
    withServer { (engine, port) =>
      val (s, _, w) = connect(port)
      w.println("/insert")
      (0 until 5).foreach(_ => w.println(car))
      w.flush()
      // inserts are async on the conn thread; wait for them
      var tries = 0
      while (engine.totalRecords < 5 && tries < 300) { Thread.sleep(100); tries += 1 }
      assert(engine.totalRecords == 5)
      s.close()

      val (s2, r2, w2) = connect(port)
      w2.println("/single")
      w2.println("3")
      w2.println("")
      val got = r2.readLine()
      assert(got.contains("\"id\":\"000000000000000000000003\""))
      s2.close()
    }
  }

  test("validate, macro, flush respond OK / error text") {
    withServer { (_, port) =>
      val (s, r, w) = connect(port)
      w.println("/macro")
      w.println("""chevy~brand.name == "Chevrolet"""")
      assert(r.readLine() == "OK")
      s.close()

      val (s2, r2, w2) = connect(port)
      w2.println("/validate")
      w2.println("chevy and year > 2000")
      assert(r2.readLine() == "OK")
      w2.println("chevy ==")
      assert(r2.readLine() != "OK")
      s2.close()

      val (s3, r3, w3) = connect(port)
      w3.println("/flush")
      assert(r3.readLine() == "OK")
      s3.close()
    }
  }

  test("insert-filter over the wire drops and transforms stored records") {
    withServer { (engine, port) =>
      val (s, r, w) = connect(port)
      w.println("/insert-filter")
      w.println("""brand.name == "Chevrolet" and redact("year")""")
      assert(r.readLine() == "OK")
      s.close()
      engine.insert(Seq(car, """{"brand":{"name":"Ford"},"year":1999}"""))
      assert(engine.totalRecords == 1)
      assert(engine.single(0L, "").get.contains("\"year\":\"[REDACTED]\""))
    }
  }

  test("fetch streams records + metadata + %quit%") {
    withServer { (engine, port) =>
      engine.insert((0 until 10).map(i => s"""{"n":$i}"""))
      val (s, r, w) = connect(port)
      w.println("/fetch")
      w.println("-1") // leftOff: from the beginning (exclusive)
      w.println("1")
      w.println("n >= 5")
      w.println("3")
      val lines = Iterator.continually(r.readLine()).takeWhile(l => l != null && l != "%quit%").toList
      s.close()
      val records = lines.filterNot(_.startsWith("/metadata"))
      val metas = lines.filter(_.startsWith("/metadata"))
      assert(records.length == 3)
      assert(records.head.contains("\"n\":5"))
      assert(metas.nonEmpty)
      // resume point is one past the last scanned record
      assert(metas.last.contains("\"leftOff\":\"000000000000000000000008\""))
    }
  }

  test("query with limit(N) ends the stream once satisfied") {
    // reference matrix: server_test.go:123-132 — limit stops /query
    withServer { (engine, port) =>
      engine.insert((0 until 20).map(i => s"""{"n":$i}"""))
      val (s, r, w) = connect(port)
      s.setSoTimeout(60000)
      w.println("/query")
      w.println("")
      w.println("n >= 4 and limit(3)")
      val lines = (0 until 6).map(_ => r.readLine()) // 3 records + 3 metadata
      val records = lines.filterNot(_.startsWith("/metadata"))
      assert(records.length == 3)
      assert(records.head.contains("\"n\":4"))
      assert(records.last.contains("\"n\":6"))
      s.close()
    }
  }

  test("query streams history then live-tails new inserts") {
    withServer { (engine, port) =>
      engine.insert((0 until 6).map(i => s"""{"n":$i,"keep":${i % 2 == 0}}"""))
      val (s, r, w) = connect(port)
      w.println("/query")
      w.println("")
      w.println("keep == true")
      val first = (0 until 6).map(_ => r.readLine()) // 3 records + 3 metadata
      assert(first.count(l => !l.startsWith("/metadata")) == 3)
      // now a live insert must arrive through the open connection
      engine.insert(Seq("""{"n":100,"keep":true}"""))
      s.setSoTimeout(30000)
      val tailed = Iterator.continually(r.readLine())
        .take(2).filterNot(_.startsWith("/metadata")).toList
      assert(tailed.exists(_.contains("\"n\":100")))
      s.close()
    }
  }
}
