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
}
