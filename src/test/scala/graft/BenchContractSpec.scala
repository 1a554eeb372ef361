package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench→driver stdout contract: the driver keeps only the LAST
  * 2000 chars of stdout, so the final line Bench prints must be a
  * complete, parseable JSON summary well under that budget — the full
  * 276-query record line (~8 KB) has been truncated out of every
  * driver artifact since round 12.
  */
class BenchContractSpec extends AnyFunSuite {

  private val sample = Bench.compactSummary(
    total = 218.0521, nQueries = 276, sfDir = "/root/testdata/sf0.1",
    boot = "f07e4adc-d17f-4755-9e82-6aa451cfe450",
    calib = 0.4078392, calibPar = 0.6596053, calibParPre = 1.2940222,
    calibOk = false, cpus = 32)

  test("compact summary fits a 2000-char stdout tail with a wide margin") {
    assert(sample.length <= 300, s"compact line is ${sample.length} chars: $sample")
    assert(!sample.contains("\n"))
  }

  test("compact summary is one complete JSON object with the driver's fields") {
    // minimal structural parse: balanced single-level object, no nesting
    assert(sample.head == '{' && sample.last == '}')
    assert(sample.count(_ == '{') == 1 && sample.count(_ == '}') == 1)
    for (k <- Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"", "\"sf\":",
        "\"boot_id\":", "\"calib_sec\":", "\"calib_par_sec\":", "\"calib_ok\":",
        "\"calib_par_threads\":"))
      assert(sample.contains(k), s"missing $k in $sample")
    // values are rounded, not raw doubles
    assert(sample.contains("\"value\":218.052"))
    assert(sample.contains("\"calib_ok\":false"))
  }
}
