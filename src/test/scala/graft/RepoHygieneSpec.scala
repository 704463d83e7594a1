package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI-style hygiene gate: no editor/backup debris may be TRACKED in git.
  * (Round 6 shipped a stray `ScaleSmoke.scala.tmp`; this makes the mistake
  * impossible to repeat silently.)
  */
class RepoHygieneSpec extends AnyFunSuite {

  test("no tracked *.tmp / *.orig / *.rej / *~ files") {
    import scala.sys.process._
    val repoRoot = new java.io.File(".").getCanonicalFile
    val gitDir = new java.io.File(repoRoot, ".git")
    assume(gitDir.exists(), "not a git checkout — nothing to audit")
    val tracked =
      try Process(Seq("git", "ls-files"), repoRoot).!!.linesIterator.toVector
      catch { case _: Exception => cancel("git unavailable") }
    val debris = tracked.filter(f =>
      f.endsWith(".tmp") || f.endsWith(".orig") || f.endsWith(".rej") || f.endsWith("~"))
    assert(debris.isEmpty, s"tracked debris files: $debris")
  }

  /** Oracle output-type gate (round-7 verdict #1): DESCRIBE every
    * `SparkEntry.oracleSql` entry in DuckDB and assert no
    * HUGEINT/UHUGEINT/DECIMAL OUTPUT column anywhere on the board. Those
    * types hash differently between the driver's canonicalizer and the
    * local fetchall() replica — 4 of round 7's 5 type-dirty queries were
    * exactly the round's 4 driver-red rows while passing locally. Internal
    * DECIMAL arithmetic is fine; landed columns must be BIGINT/DOUBLE.
    */
  test("no HUGEINT/DECIMAL output column in any oracle (DuckDB DESCRIBE)") {
    import scala.sys.process._
    val sfDir = new java.io.File("/root/testdata/sf0.001")
    assume(sfDir.isDirectory, "testdata not present — gate runs on the build box")
    val duck =
      try Process(Seq("python3", "-c", "import duckdb")).! == 0
      catch { case _: Exception => false }
    assume(duck, "python3+duckdb unavailable — gate runs on the build box")
    val tmp = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(tmp, Verify.oracleSqlJson)
    val out = new StringBuilder
    val logger = ProcessLogger(l => { out.append(l).append('\n'); () },
      l => { out.append(l).append('\n'); () })
    val rc = Process(
      Seq("python3", "tools/type_gate.py", sfDir.getAbsolutePath, tmp.toString),
      new java.io.File(".").getCanonicalFile).!(logger)
    java.nio.file.Files.deleteIfExists(tmp)
    assert(rc == 0, s"type gate failed:\n$out")
  }
}
