package graft.server

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine

/** Long-run trickle soak: wire ingest + retention budget + background
  * compaction + a live `/query` tail + periodic `/fetch` pages, ALL
  * CONCURRENTLY against one engine — the steady state a long-running
  * basenine deployment actually sits in (the reference runs its insertion
  * listener, periodicPartitioner and watchers as goroutines over shared
  * storage; server.go:100-170, native.go:1046-1108). The trickle-ingest
  * properties only show up with every background daemon live at once:
  *
  *   - the records/ listing stays BOUNDED while one-doc wire inserts land
  *     continuously (the compaction ticker must keep consuming the run of
  *     tiny batch dirs that the 1-per-insert append produces);
  *   - the live tail loses nothing and duplicates nothing across
  *     compaction swaps and retention evictions (ids strictly increasing,
  *     exact match-set coverage once the writer drains);
  *   - tail latency stays STABLE: the delivery delay of the last third of
  *     the run must not drift away from the first third (an unbounded
  *     listing shows up here first, as planning time);
  *   - no storage churn error ever reaches a client (FileNotFound from an
  *     evicted/compacted dir racing a scan is the classic leak);
  *   - the engine is still fully consistent and queryable afterwards.
  *
  * Runtime is `SPARK_GRAFT_SOAK_SECONDS` (default 45 — suite-friendly;
  * the round-note numbers come from a manual 10+ minute run:
  * `SPARK_GRAFT_SOAK_SECONDS=630 sbt "testOnly graft.server.LongRunSoakSpec"`).
  */
class LongRunSoakSpec extends AnyFunSuite {

  private val soakSeconds = sys.env.getOrElse("SPARK_GRAFT_SOAK_SECONDS", "45").toInt

  private lazy val spark = graft.Sessions
    .builder("local[4]", 4)
    .appName("longrun-soak-spec")
    .getOrCreate()

  private def connect(port: Int): (Socket, BufferedReader, PrintWriter) = {
    val s = new Socket("127.0.0.1", port)
    s.setSoTimeout(180000)
    (s, new BufferedReader(new InputStreamReader(s.getInputStream)),
      new PrintWriter(s.getOutputStream, true))
  }

  private def p95(xs: Seq[Long]): Long =
    if (xs.isEmpty) 0L else xs.sorted.apply(math.min(xs.size - 1, (xs.size * 95) / 100))

  test(s"$soakSeconds s trickle soak: bounded listing, lossless stable tail, clean storage churn") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = Files.createTempDirectory("graft-longsoak").toString
    // aggressive-but-real policy: background ticker ON (the production
    // path), short age grace so compaction actually chases a 45 s run,
    // and a retention budget small enough that eviction fires mid-soak
    val eng = new Engine(spark, dir,
      compactMinRun = 8, compactKeepRecent = 2,
      compactTargetBytes = 128L << 20, compactMinAgeMs = 1500L,
      compactInBackground = true)
    val srv = new ProtocolServer(eng, 0)
    val port = srv.start()
    val errors = new ConcurrentLinkedQueue[String]()
    // EVERYTHING below runs inside try/finally: a failing mid-soak assert
    // must still stop the server and the engine's background ticker, or the
    // leaked 1 s compaction/eviction loop over a ~1k-dir log keeps burning
    // fds and Spark jobs under every suite that runs after this one
    try {

    // --- live tail client: subscribes BEFORE the first insert ---
    val (tailSock, tailIn, tailOut) = connect(port)
    tailOut.println("/query")
    tailOut.println("") // leftOff "" = from the beginning
    tailOut.println("""kind == "a"""")
    val gotIds = new ConcurrentLinkedQueue[Long]()
    val latencies = new ConcurrentLinkedQueue[(Long, Long)]() // (id, deliverMs)
    @volatile var tailError: Option[Throwable] = None
    val idRe = "\"id\":\"(\\d+)\"".r
    val tsRe = "\"sent\":(\\d+)".r
    val tailThread = new Thread(() =>
      try {
        var l = tailIn.readLine()
        while (l != null) {
          if (!l.startsWith("/metadata")) {
            if (l.contains("FileNotFound") || l.contains("Exception") || l.startsWith("Error"))
              errors.add(s"tail: $l")
            else {
              idRe.findFirstMatchIn(l).foreach { m =>
                val id = java.lang.Long.parseLong(m.group(1))
                gotIds.add(id)
                tsRe.findFirstMatchIn(l).foreach { t =>
                  latencies.add((id, System.currentTimeMillis() - t.group(1).toLong))
                }
              }
            }
          }
          l = tailIn.readLine()
        }
      } catch {
        case _: java.net.SocketException => ()
        case e: Throwable                => tailError = Some(e)
      }, "soak-tail")
    tailThread.setDaemon(true)
    tailThread.start()

    // --- writer: one-doc wire inserts, trickle cadence ---
    val (wSock, _, wOut) = connect(port)
    wOut.println("/insert")
    // retention budget: enforced by the same 1 s ticker as compaction;
    // sized so the oldest consolidated dirs get evicted mid-run while the
    // tail (500 ms trigger) has long consumed them
    val (lSock, lIn, lOut) = connect(port)
    lOut.println("/limit"); lOut.println((512 * 1024).toString)
    assert(lIn.readLine() == "OK"); lSock.close()

    val deadline = System.currentTimeMillis() + soakSeconds * 1000L
    var sent = 0L
    val aIds = scala.collection.mutable.ArrayBuffer[Long]()
    val dirSamples = scala.collection.mutable.ArrayBuffer[Int]()
    val fetchLat = scala.collection.mutable.ArrayBuffer[Long]()
    var lastSample = 0L
    var lastFetch = 0L
    def listDirs(): Int =
      Files.list(Paths.get(dir, "records")).iterator().asScala
        .count(_.getFileName.toString.startsWith("batch_"))
    while (System.currentTimeMillis() < deadline) {
      // burst-shaped trickle, like a real client: 8 docs per ~200 ms wire
      // write (the server coalesces a burst into ONE batch dir — 5 dirs/s,
      // the envelope the reference's paced ingest also produces). One doc
      // per TCP write would make every doc its own parquet dir: 40 dirs/s,
      // outrunning any 1 Hz compactor by construction.
      val burst = (0 until 8).map { _ =>
        val kind = if (sent % 3 == 0) "a" else "b"
        if (kind == "a") aIds += sent
        sent += 1
        s"""{"n":${sent - 1},"kind":"$kind","sent":${System.currentTimeMillis()}}"""
      }
      wOut.println(burst.mkString("\n"))
      val now = System.currentTimeMillis()
      if (now - lastSample > 2000) {
        lastSample = now
        dirSamples += listDirs()
      }
      // a bounded fetch page mid-churn: must answer, never leak an error.
      // Gated on sent >= 90 (≈30 "kind:b" records): an EMPTY page emits
      // nothing on the wire (reference semantics), which a timeout-based
      // reader can't tell from a hang
      if (now - lastFetch > 10000 && sent >= 90) {
        lastFetch = now
        val (fs, fin, fout) = connect(port)
        fs.setSoTimeout(60000)
        try {
          val f0 = System.currentTimeMillis()
          fout.println("/fetch"); fout.println("latest"); fout.println("-1")
          fout.println("""kind == "b""""); fout.println("10")
          // read to the FIRST non-metadata line and stop — reading past it
          // blocks when the page ends exactly there (a cold engine may
          // legitimately serve an empty page: just "%quit%")
          var seen = 0
          while (seen < 1) {
            val fl = fin.readLine()
            if (fl == null) seen = 1
            else {
              if (fl.contains("FileNotFound") || fl.startsWith("Error")) errors.add(s"fetch: $fl")
              if (!fl.startsWith("/metadata")) seen += 1
            }
          }
          fetchLat += (System.currentTimeMillis() - f0)
        } catch {
          case _: java.net.SocketTimeoutException =>
            errors.add("fetch: page did not answer within 60 s")
        } finally fs.close()
      }
      Thread.sleep(200)
    }
    wSock.close()

    // drain: every matching id must arrive (nothing lost to a swap/evict)
    val expect = aIds.toSet
    val drainDeadline = System.currentTimeMillis() + 60000
    while (gotIds.size < expect.size && System.currentTimeMillis() < drainDeadline)
      Thread.sleep(200)
    tailSock.close()

    val received = gotIds.asScala.toVector
    assert(tailError.isEmpty, s"tail reader died: $tailError")
    assert(errors.isEmpty, s"storage churn leaked to a client: ${errors.asScala.take(5)}")
    assert(received == received.sorted && received.distinct == received,
      "tail ids must be strictly increasing with no re-sends")
    assert(received.toSet == expect,
      s"tail lost records: missing ${(expect -- received.toSet).toSeq.sorted.take(10)}, " +
        s"extra ${(received.toSet -- expect).toSeq.sorted.take(10)}")

    // bounded on-disk footprint: steady state = (burst rate × GC grace)
    // lingering replaced dirs + the young live region + consolidated dirs
    // ≈ 5/s × 15 s + ~15 ≈ 90; 130 gives slack for a slow tick, but a
    // broken compactor (dirs never consumed) grows linearly and blows past
    // it within the first minute of a longer run
    assert(dirSamples.nonEmpty && dirSamples.max <= 130,
      s"records/ on-disk dir count unbounded under trickle ingest: samples=$dirSamples")
    // bounded PLAN cost: queries list the manifest, not the filesystem —
    // the live batch set must stay compaction-consolidated
    assert(eng.records().inputFiles.length <= 40,
      s"manifest unbounded: ${eng.records().inputFiles.length} live files")

    // latency stability: last third vs first third of delivered ids
    val lats = latencies.asScala.toVector.sortBy(_._1).map(_._2)
    assert(lats.size >= 30, s"not enough latency samples: ${lats.size}")
    val third = lats.size / 3
    val (p95First, p95Last) = (p95(lats.take(third)), p95(lats.takeRight(third)))
    info(s"soak ${soakSeconds}s: sent=$sent tailMatches=${received.size} " +
      s"dirs(max=${dirSamples.max},final=${dirSamples.last}) " +
      s"latency p95 first/last third = $p95First/$p95Last ms " +
      s"(p50=${lats.sorted.apply(lats.size / 2)} ms) " +
      s"fetch pages=${fetchLat.size} maxLat=${if (fetchLat.isEmpty) 0 else fetchLat.max} ms")
    assert(p95Last <= math.max(3 * p95First, 5000L),
      s"tail latency drifted: p95 first=$p95First ms last=$p95Last ms")

    // engine still consistent and queryable after the churn
    assert(eng.totalRecords <= sent && eng.highWater == sent)
    val back = eng.query("", """kind == "a"""").select("id").collect().map(_.getLong(0))
    assert(back.toSet.subsetOf(expect), "post-soak query returned a non-inserted id")
    } finally { srv.stop(); eng.close() }
  }
}
