package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** Machine-generated protocol parity matrix (round-7 verdict #7): one row
  * per (verb, behavior) with the spec test that pins it. The test FAILS if
  * a cited test name no longer exists in its spec source or a dispatch
  * verb disappears from ProtocolServer — so `PROTOCOL_PARITY.md` can never
  * silently drift from the suite — then regenerates the artifact.
  */
class ProtocolParitySpec extends AnyFunSuite {

  private case class Pin(verb: String, behavior: String, spec: String, testName: String)

  // testName is a verbatim substring of the cited spec source (distinctive
  // prefix is enough; escaped quotes in source make full names awkward)
  private val matrix = Seq(
    Pin("/insert", "stores the line; ids are monotone 24-digit zero-padded",
      "ProtocolServerSpec", "insert then single via wire protocol"),
    Pin("/insert", "reference Go client scenario end-to-end (ingest volume + query-back)",
      "GoClientInteropSpec", "reference client scenario end-to-end"),
    Pin("/insert-filter", "subsequent inserts are dropped/transformed by the compiled filter",
      "ProtocolServerSpec", "insert-filter over the wire drops and transforms stored records"),
    Pin("/query", "limit(N) ends the stream once satisfied",
      "ProtocolServerSpec", "query with limit(N) ends the stream once satisfied"),
    Pin("/query", "streams history then live-tails new inserts",
      "ProtocolServerSpec", "query streams history then live-tails new inserts"),
    Pin("/query", "history larger than one driver batch streams incrementally",
      "ProtocolServerSpec", "query history far larger than one driver batch streams incrementally"),
    Pin("/query", "retention racing the scan resumes without re-sends",
      "ProtocolServerSpec", "query history survives retention racing the scan"),
    Pin("/query", "concurrent tails/writers: no cross-talk, ordered ids",
      "MultiClientSoakSpec", "concurrent tails + writers + fetch + macro"),
    Pin("/single", "point lookup by index returns the stored record",
      "ProtocolServerSpec", "insert then single via wire protocol"),
    Pin("/fetch", "streams records + /metadata; bounded page sends NO %quit%",
      "ProtocolServerSpec", "fetch streams records + metadata; limit-bounded page sends NO %quit%"),
    Pin("/fetch", "exhausting the log closes with %quit%",
      "ProtocolServerSpec", "fetch that exhausts the log DOES close with %quit%"),
    Pin("/fetch", "leftOff \"\" starts at 0; \"latest\" at the last index",
      "ProtocolServerSpec", "fetch leftOff specials"),
    Pin("/fetch", "numeric args are 64-bit (direction sign past int32)",
      "ProtocolServerSpec", "fetch numeric args are 64-bit"),
    Pin("/fetch", "leftOff beyond high-water replies Index out of range",
      "ProtocolServerSpec", "fetch leftOff beyond the high-water mark replies Index out of range"),
    Pin("/validate", "ok / reference error text",
      "ProtocolServerSpec", "validate, macro, flush respond OK / error text"),
    Pin("/validate", "ALL reference-asserted participle error strings " +
      "byte-equal over the socket (stray-token, bracket-expected clause; " +
      "multi-line positions and literal-not-terminated lex precedence " +
      "pinned parser-level in bfl ParserSpec)",
      "GoClientInteropSpec", "reference client scenario end-to-end"),
    Pin("/macro", "macro definitions expand in later queries",
      "ProtocolServerSpec", "validate, macro, flush respond OK / error text"),
    Pin("/macro", "macros hold under concurrent clients",
      "MultiClientSoakSpec", "concurrent tails + writers + fetch + macro"),
    Pin("/limit", "retention limit accepted and enforced over a long run",
      "LongRunSoakSpec", "trickle soak: bounded listing, lossless stable tail"),
    Pin("/limit", "reference client sets the limit as part of the scenario",
      "GoClientInteropSpec", "reference client scenario end-to-end"),
    Pin("/flush", "clears records, responds OK",
      "ProtocolServerSpec", "validate, macro, flush respond OK / error text"),
    Pin("/reset", "clears records AND macros/filters, responds OK",
      "GoClientInteropSpec", "reference client scenario end-to-end"),
    Pin("/metadata", "per-scan progress lines with reference cadence/fields",
      "GoClientInteropSpec", "reference client scenario end-to-end"),
    Pin("/metadata", "fetch pages interleave records with /metadata lines",
      "ProtocolServerSpec", "fetch streams records + metadata"),
    Pin("(connection)", "line over the 200 MB scanner cap kills only that connection",
      "ProtocolServerSpec", "line over the scanner cap kills the connection; normal lines survive"),
    Pin("(connection)", "malformed numeric args: reference error text, connection stays up",
      "ProtocolServerSpec", "malformed numeric args get reference error text, connection stays up"))

  private val dispatchVerbs = Seq("/insert", "/insert-filter", "/query", "/single",
    "/fetch", "/validate", "/macro", "/limit", "/flush", "/reset")

  private def read(path: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")

  test("11/11 verbs pinned; every cited test exists; artifact regenerated") {
    val repoRoot = new java.io.File(".").getCanonicalFile
    assume(new java.io.File(repoRoot, "src/main/scala/graft/server/ProtocolServer.scala").exists(),
      "run from the repo root")
    // every dispatch verb is really dispatched, and /metadata really emitted
    val serverSrc = read("src/main/scala/graft/server/ProtocolServer.scala")
    dispatchVerbs.foreach(v =>
      assert(serverSrc.contains("\"" + v + "\""), s"verb $v not dispatched"))
    assert(serverSrc.contains("\"/metadata "), "/metadata emission missing")
    // 11/11 verbs appear in the matrix
    val covered = matrix.map(_.verb).toSet
    (dispatchVerbs :+ "/metadata").foreach(v =>
      assert(covered.contains(v), s"verb $v has no parity row"))
    // every cited test name exists verbatim in its spec source
    matrix.foreach { p =>
      val src = read(s"src/test/scala/graft/server/${p.spec}.scala")
      assert(src.contains(p.testName),
        s"${p.spec} no longer contains a test matching: ${p.testName}")
    }
    // regenerate the artifact (deterministic: no timestamps)
    // rows are appended OUTSIDE the stripMargin template: their leading
    // table pipes would otherwise be consumed as margin characters
    val rows = matrix.map(p =>
      s"| `${p.verb}` | ${p.behavior} | ${p.spec}: “${p.testName}” |")
    val md =
      s"""# Protocol parity matrix
         |
         |Generated by `ProtocolParitySpec` — do not edit by hand. The spec
         |fails if a cited test disappears or a dispatch verb is removed,
         |so this table is only ever as stale as the last green test run.
         |
         |Verbs covered: ${dispatchVerbs.size} dispatch verbs + `/metadata`
         |(11/11, reference `server.go` / `native.go` surface).
         |
         || Verb | Behavior | Pinned by |
         ||---|---|---|
         |""".stripMargin + rows.mkString("\n") + "\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get("PROTOCOL_PARITY.md"), md.getBytes("UTF-8"))
    ()
  }
}
