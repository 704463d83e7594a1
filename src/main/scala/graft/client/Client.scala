package graft.client

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetSocketAddress, Socket}
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import graft.bfl.JsonTree

/** Scala client library for the graft wire protocol — the API twin of the
  * reference's Go client (reference: client/go/client.go:62-427): connect,
  * insert mode, streaming query with per-record metadata, and the one-shot
  * verbs (single, fetch, validate, macro, insertion filter, limit, flush,
  * reset). A basenine user's client code maps call-for-call.
  *
  * Framing (identical to the reference client's `readConnection`):
  * newline-delimited lines; `/metadata {json}` lines route to the metadata
  * callback, `%...%` control lines terminate the stream, everything else is
  * a record. Queries have line feeds escaped to spaces before sending
  * (`escapeLineFeed`), and one-shot verbs expect a literal `OK` line —
  * anything else comes back as the error.
  */
object Client {

  /** `/metadata` payload (reference: client/go/client.go:21-28). */
  final case class Metadata(current: Long, total: Long, numberOfWritten: Long,
      leftOff: String, truncatedTimestamp: Long, noMoreData: Boolean)

  object Metadata {
    def parse(json: String): Option[Metadata] =
      JsonTree.tryParse(json).collect {
        case m: scala.collection.mutable.LinkedHashMap[_, _] =>
          val f = m.asInstanceOf[scala.collection.mutable.LinkedHashMap[String, Any]]
          def num(k: String): Long = f.get(k) match {
            case Some(n: java.lang.Number) => n.longValue()
            case _                         => 0L
          }
          Metadata(num("current"), num("total"), num("numberOfWritten"),
            f.get("leftOff").map(String.valueOf).getOrElse(""),
            num("truncatedTimestamp"),
            f.get("noMoreData").contains(true))
      }
  }

  private val ControlLine = "^%.*%$".r
  private def escapeLineFeed(q: String): String = q.replace("\n", " ")

  /** A live connection. Not thread-safe for concurrent writers (matches the
    * reference client's contract).
    */
  final class Connection private[client] (socket: Socket) extends AutoCloseable {
    private val out = new PrintWriter(socket.getOutputStream, true)
    private[client] val in =
      new BufferedReader(new InputStreamReader(socket.getInputStream))
    @volatile private var reader: Thread = _

    def sendText(text: String): Unit = { out.println(text); out.flush() }

    /** Switch this connection into INSERT mode; every subsequent
      * [[sendText]] line is a document to append.
      */
    def insertMode(): Unit = sendText("/insert")

    /** Stream records matching `query` from `leftOff` (`""` = beginning,
      * `"latest"` = tail only). Runs history + live tail until [[close]];
      * records hit `onData`, progress lines hit `onMeta`, and a server
      * `%quit%`/`%close%` stops the stream (onControl fires once).
      */
    def query(leftOff: String, query: String)(
        onData: String => Unit,
        onMeta: Metadata => Unit,
        onControl: String => Unit = _ => ()): Unit = {
      sendText("/query")
      sendText(leftOff)
      sendText(escapeLineFeed(query))
      reader = new Thread(() => {
        try {
          var line = in.readLine()
          var live = true
          while (live && line != null) {
            if (line.startsWith("/metadata ")) {
              Metadata.parse(line.stripPrefix("/metadata ")).foreach(onMeta)
            } else if (ControlLine.matches(line)) {
              onControl(line); live = false
            } else onData(line)
            if (live) line = in.readLine()
          }
        } catch { case _: java.io.IOException => () } // closed mid-read
      }, "graft-client-query-reader")
      reader.setDaemon(true)
      reader.start()
    }

    override def close(): Unit = socket.close()
  }

  def connect(host: String, port: Int, connectTimeoutMs: Int = 3000): Connection = {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    new Connection(s)
  }

  // ---------- one-shot verbs (one connection each, like the reference) ----

  private def oneShot(host: String, port: Int, timeoutMs: Int,
      lines: Seq[String]): Either[String, Unit] = {
    val c = connect(host, port)
    try {
      lines.foreach(c.sendText)
      val reply = readLineWithTimeout(c, timeoutMs)
      if (reply.contains("OK")) Right(())
      else Left(reply.getOrElse("timed out waiting for server reply"))
    } finally c.close()
  }

  private def readLineWithTimeout(c: Connection, timeoutMs: Int): Option[String] = {
    val q = new LinkedBlockingQueue[String](1)
    val t = new Thread(() => {
      try Option(c.in.readLine()).foreach(q.put) catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    Option(q.poll(timeoutMs, TimeUnit.MILLISECONDS))
  }

  /** Point read by record id; `Left` carries the server's error text. */
  def single(host: String, port: Int, id: String, query: String = "",
      timeoutMs: Int = 5000): Either[String, String] = {
    val c = connect(host, port)
    try {
      c.sendText("/single")
      c.sendText(id)
      c.sendText(escapeLineFeed(query))
      readLineWithTimeout(c, timeoutMs) match {
        case None                              => Left("timed out")
        case Some(l) if ControlLine.matches(l) => Left("connection closed")
        // records are JSON objects; anything else is the server's error
        // text ("Record does not exist", "Index out of range", "Error: …")
        case Some(l) if l.startsWith("{")      => Right(l)
        case Some(l)                           => Left(l)
      }
    } finally c.close()
  }

  /** Bidirectional page: ≤ `limit` matching records from `leftOff` in
    * `direction` (+1 forward / -1 backward), with the first and last
    * `/metadata` snapshots (reference: client/go/client.go:164-245).
    */
  def fetch(host: String, port: Int, leftOff: String, direction: Int,
      query: String, limit: Int, timeoutMs: Int = 20000)
      : (Seq[String], Option[Metadata], Option[Metadata]) = {
    val c = connect(host, port)
    try {
      c.sendText("/fetch")
      c.sendText(leftOff)
      c.sendText(direction.toString)
      c.sendText(escapeLineFeed(query))
      c.sendText(limit.toString)
      val data = Seq.newBuilder[String]
      var count = 0
      var first: Option[Metadata] = None
      var last: Option[Metadata] = None
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var live = true
      while (live && System.nanoTime() < deadline) {
        readLineWithTimeout(c,
          math.max(1, (deadline - System.nanoTime()) / 1000000L).toInt) match {
          case None => live = false
          case Some(l) if l.startsWith("/metadata ") =>
            val m = Metadata.parse(l.stripPrefix("/metadata "))
            if (first.isEmpty) first = m
            last = m
          case Some(l) if ControlLine.matches(l) => live = false
          case Some(l) =>
            data += l; count += 1
            // a page cut short by its limit with offsets unscanned
            // deliberately sends no %quit% (the replicated reference-server
            // quirk), and each /metadata line PRECEDES its record — so the
            // limit-th record is the page's final line and ends the read
            // (the analog of the reference client's counter/meta exit,
            // client.go:216-233, adjusted for the metadata-first framing)
            if (count >= limit) live = false
        }
      }
      (data.result(), first, last)
    } finally c.close()
  }

  /** Syntax-check `query`; `Left` carries the parser's error text. */
  def validate(host: String, port: Int, query: String,
      timeoutMs: Int = 5000): Either[String, Unit] =
    oneShot(host, port, timeoutMs, Seq("/validate", escapeLineFeed(query)))

  /** Define (or overwrite) a macro: `name` expands to `expanded`. */
  def defineMacro(host: String, port: Int, name: String, expanded: String,
      timeoutMs: Int = 5000): Either[String, Unit] =
    oneShot(host, port, timeoutMs, Seq("/macro", s"$name~$expanded"))

  /** Install an insertion filter applied to every subsequent insert. */
  def insertionFilter(host: String, port: Int, query: String,
      timeoutMs: Int = 5000): Either[String, Unit] =
    oneShot(host, port, timeoutMs, Seq("/insert-filter", escapeLineFeed(query)))

  /** Set the on-disk size hard-limit in bytes (soft-limit = half). */
  def limit(host: String, port: Int, bytes: Long,
      timeoutMs: Int = 5000): Either[String, Unit] =
    oneShot(host, port, timeoutMs, Seq("/limit", bytes.toString))

  /** Remove all records. */
  def flush(host: String, port: Int, timeoutMs: Int = 5000): Either[String, Unit] =
    oneShot(host, port, timeoutMs, Seq("/flush"))

  /** Remove all records and reset macros/filters/limits to initial state. */
  def reset(host: String, port: Int, timeoutMs: Int = 5000): Either[String, Unit] =
    oneShot(host, port, timeoutMs, Seq("/reset"))
}
