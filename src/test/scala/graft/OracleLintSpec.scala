package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-artifact lint as a BUILD gate, not a by-hand step: every
  * declared oracle is checked for the two DuckDB representation hazards
  * (HUGEINT reaching output columns, −0.0 reaching FLOAT/DOUBLE values)
  * that have produced value-equal driver hash mismatches. A seeded
  * violation fails this suite — the lint's own `--selftest` (asserted
  * first) proves the detector goes red.
  *
  * Environment-gated: cancels (never silently passes) when python3/duckdb
  * is absent. [[Verify]] also runs the same lint on every dump it writes.
  */
class OracleLintSpec extends AnyFunSuite {

  private def run(args: String*): (Int, String) = {
    val cmd = Seq("python3", "tools/oracle_lint.py") ++ args
    val p = new ProcessBuilder(cmd: _*)
      .directory(new java.io.File(".").getAbsoluteFile.getParentFile)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  private lazy val duckdbAvailable: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start().waitFor() == 0
    } catch { case _: Exception => false }

  test("every declared oracle passes the HUGEINT / signed-zero lint") {
    assume(duckdbAvailable, "python3+duckdb not on this box — the driver runs the lint via Verify")
    // a lint that cannot go red gates nothing: prove the detector first
    val (selfRc, selfOut) = run("--selftest")
    assert(selfRc == 0, s"oracle_lint --selftest broke:\n$selfOut")

    val dir = Files.createTempDirectory("oracle_lint_spec")
    try {
      Verify.writeOracleJson(dir.toString)
      val (rc, out) = run("/root/testdata/sf0.01", dir.toString)
      assert(rc == 0, s"oracle lint found violations:\n$out")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }
}
