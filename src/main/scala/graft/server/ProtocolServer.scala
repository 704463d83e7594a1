package graft.server

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

import graft.bfl.JsonTree
import graft.engine.Engine
import graft.streaming.Streaming

/** The reference's line-based TCP protocol over the Spark engine, so a
  * basenine Go client can talk to this server unchanged
  * (reference: server/server.go:100-280, server/lib/structs.go:43-87).
  *
  * Wire behavior preserved: connection modes set by the first `/command`
  * line; `OK` / error-text / `%quit%` responses; record lines as raw JSON;
  * `/metadata {json}` progress lines with
  * {current,total,numberOfWritten,leftOff,truncatedTimestamp,noMoreData};
  * `/query` streams history then keeps following new inserts (live tail).
  */
final class ProtocolServer(engine: Engine, port: Int) {

  @volatile private var server: ServerSocket = _
  private val running = new AtomicBoolean(false)

  def start(): Int = {
    server = new ServerSocket(port)
    running.set(true)
    val t = new Thread(() => acceptLoop(), "graft-protocol-accept")
    t.setDaemon(true)
    t.start()
    server.getLocalPort
  }

  def stop(): Unit = {
    running.set(false)
    if (server != null) server.close()
  }

  private def acceptLoop(): Unit =
    while (running.get()) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "graft-protocol-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => /* socket closed */ }
    }

  private def send(out: OutputStream, msg: String): Unit = {
    out.write((msg + "\n").getBytes(StandardCharsets.UTF_8))
    out.flush()
  }

  /** `/metadata {json}` progress line (reference: native.go:497-511). */
  private def metadataJson(current: Long, total: Long, written: Long,
      leftOff: Long, truncated: Long, noMore: Boolean): String = {
    val m = new JsonTree.Obj
    m.put("current", current)
    m.put("total", total)
    m.put("numberOfWritten", written)
    m.put("leftOff", Engine.indexToId(leftOff))
    m.put("truncatedTimestamp", truncated)
    m.put("noMoreData", noMore)
    "/metadata " + JsonTree.serialize(m)
  }

  /** pull the injected 24-digit id back out of a stored doc */
  private def extractId(doc: String): Option[Long] = {
    val m = java.util.regex.Pattern
      .compile("\"id\":\"(\\d{24})\"")
      .matcher(doc)
    if (m.find()) Some(m.group(1).toLong) else None
  }

  // one connection = one mode, like the reference's handleConnection
  private def handle(sock: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = sock.getOutputStream
    var mode = "NONE"
    val args = scala.collection.mutable.ArrayBuffer[String]()
    try {
      var line = in.readLine()
      while (line != null) {
        if (mode == "NONE" && line.startsWith("/")) {
          line.split(" ", 2)(0) match {
            case "/insert"        => mode = "INSERT"
            case "/insert-filter" => mode = "INSERTION_FILTER"
            case "/query"         => mode = "QUERY"
            case "/single"        => mode = "SINGLE"
            case "/fetch"         => mode = "FETCH"
            case "/validate"      => mode = "VALIDATE"
            case "/macro"         => mode = "MACRO"
            case "/limit"         => mode = "LIMIT"
            case "/flush"         => engine.flush(); send(out, "OK")
            case "/reset"         => engine.reset(); send(out, "OK")
            case _                => send(out, "Unrecognized command.")
          }
        } else {
          mode match {
            case "INSERT" =>
              // drain everything already buffered on the connection into ONE
              // engine batch — one Parquet append per burst instead of one
              // Spark job per line (the reference appends per line because
              // its append is a cheap WriteAt; ours is a columnar batch)
              val batch = scala.collection.mutable.ListBuffer(line)
              while (in.ready()) {
                val more = in.readLine()
                if (more != null) batch += more
              }
              engine.insert(batch.toSeq)
            case "INSERTION_FILTER" =>
              engine.setInsertionFilter(line) match {
                case Right(_) => send(out, "OK")
                case Left(e)  => send(out, e)
              }
            case "VALIDATE" =>
              engine.validate(line) match {
                case Right(_) => send(out, "OK")
                case Left(e)  => send(out, e)
              }
            case "MACRO" =>
              val s = line.split("~")
              if (s.length != 2) send(out, "Error: Provide only two expressions!")
              else { engine.addMacro(s(0).trim, s(1).trim); send(out, "OK") }
            case "LIMIT" =>
              line.toLongOption match {
                case Some(n) => engine.setLimit(n); send(out, "OK")
                case None => send(out, s"Error: While converting the limit to integer: $line")
              }
            case "SINGLE" =>
              args += line
              if (args.length == 2) {
                engine.single(args(0).toLong, args(1)) match {
                  case Some(doc) => send(out, doc)
                  case None      => send(out, "Record does not exist!")
                }
              }
            case "FETCH" =>
              args += line
              if (args.length == 4) {
                val leftOff = args(0).toLong
                val dir = args(1).toInt
                val (docs, m) = engine.fetch(leftOff, dir, args(2), args(3).toInt)
                // `current` counts records SCANNED since the last metadata
                // line (reference resets `queried` per emission,
                // native.go:794-806); derivable from id deltas here
                var written = 0L
                var prevId = leftOff + (if (dir < 0) 0L else -1L)
                docs.foreach { d =>
                  val id = extractId(d).getOrElse(prevId)
                  val scanned = math.abs(id - prevId)
                  send(out, metadataJson(scanned, m.total, written, m.leftOff,
                    m.truncatedTimestamp, m.noMoreData))
                  send(out, d)
                  prevId = id
                  written += 1
                }
                send(out, metadataJson(0, m.total, written, m.leftOff,
                  m.truncatedTimestamp, m.noMoreData))
                send(out, "%quit%")
              }
            case "QUERY" =>
              args += line
              if (args.length == 2)

                streamQuery(out, args(0), args(1))
            case _ => ()
          }
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally sock.close()
  }

  /** `/query`: history + live tail. History is served in id order from the
    * engine; then a Structured Streaming tail keeps pushing new matches until
    * the client disconnects (reference: native.go:369-523).
    */
  private def streamQuery(out: OutputStream, leftOff: String, query: String): Unit = {
    var written = 0L
    // the tail must start after everything the HISTORY phase scanned —
    // matched or not — and never before leftOff (the client asked to skip
    // those); seed from both
    val histHighWater = engine.highWater - 1
    val leftOffSeed = leftOff match {
      case "" | null => -1L
      case "latest"  => engine.highWater - 2 // history = last record only
      case s         => s.toLong
    }
    @volatile var last = math.max(histHighWater, leftOffSeed)
    @volatile var dead = false
    def sendSafe(msg: String): Unit =
      if (!dead) {
        try send(out, msg)
        catch { case _: Exception => dead = true } // client disconnected
      }
    // expand macros ONCE: limit extraction, the history scan, and the tail
    // all evaluate the same query text even if /macro runs concurrently
    val expanded = engine.expandMacros(query)
    val limit: Long = graft.bfl.Parser.parse(expanded) match {
      case Right(q) => q.limit.getOrElse(0L)
      case Left(_)  => 0L
    }
    // history; `current` counts scanned-since-last-metadata via id deltas,
    // like the FETCH handler
    var prevId = leftOffSeed
    val hist = engine.queryExpanded(leftOff, expanded).orderBy("id")
      .select("id", "doc").collect()
    hist.foreach { r =>
      sendSafe(r.getString(1))
      written += 1
      val id = r.getLong(0)
      sendSafe(metadataJson(math.abs(id - prevId), engine.totalRecords, written, id,
        engine.truncatedTimestamp, noMore = false))
      prevId = id
      // a record inserted DURING the history scan can exceed the pre-scan
      // high-water snapshot; advancing `last` here keeps the tail from
      // re-sending it
      last = math.max(last, id)
    }
    // `limit(N)` ends the stream once satisfied — no live tail
    // (reference: native.go:513-517 returns from StreamRecords)
    if (limit != 0 && written >= limit) return
    // live tail (the streaming source replays the log; ids ≤ last are
    // already-written history and skipped)
    @volatile var done = false
    val tailQ = Streaming.startTail(engine.spark, engine.dir, expanded,
      (rows, hw) => {
        var prevTail = last
        rows.filter(_._1 > last).foreach { case (id, doc) =>
          if (!done) {
            sendSafe(doc)
            written += 1
            sendSafe(metadataJson(math.abs(id - prevTail), engine.totalRecords, written, id,
              engine.truncatedTimestamp, noMore = false))
            prevTail = id
            if (limit != 0 && written >= limit) done = true
          }
        }
        last = math.max(last, hw)
      })
    // hold the connection open until the client goes away (first failed
    // write flips `dead`, like the reference's conn.Write error break) or
    // the limit is reached
    try while (!dead && !done && tailQ.isActive) Thread.sleep(100)
    catch { case _: Exception => () }
    finally tailQ.stop()
  }
}
