package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's witness/retry tier logic (round 10): which windows
  * earn a second attempt and in what priority. Pure-function tests —
  * no SparkSession — so the thresholds that decide what the committed
  * artifact looks like can't drift silently under a refactor.
  *
  * Tier semantics under test (Bench.Timed):
  *   - jvm_degraded: cpu_inflation > 4 AND ≥5 extra cpu-s (the JVM's
  *     self-incrimination; external load cannot inflate executor CPU)
  *   - contended: steal >5%, sys >20%, foreign-user >25%, or load
  *     >1.5× cores (the environment's fault, not the plan's)
  *   - suspect: cpu_inflation 1.8–4× with ≥1 extra cpu-s (round-9
  *     advice: the gray band that hid q60's 2.01× blip)
  *   - priority: jvm_degraded > contended > suspect (a degraded JVM
  *     explains the wall better than ambient load does)
  */
class BenchWitnessSpec extends AnyFunSuite {

  private val cores = 32

  /** A quiet window: idle machine, cpu at baseline. */
  private def quiet(name: String = "q", cpuSec: Double = 10.0,
      cpuBase: Double = 10.0): Bench.Timed =
    Bench.Timed(name, secs = 2.0, spill = 0, shuffle = 0, peakMem = 0,
      cpuSec = cpuSec, gcSec = 0.1, load = 2.0,
      userPct = 100.0 * cpuSec / (2.0 * cores), sysPct = 3.0, stealPct = 0.0,
      codeCache = 20.0, metaMb = 150.0, cpuBase = cpuBase)

  test("a quiet window earns no retry") {
    assert(quiet().retryReason(cores).isEmpty)
  }

  test("jvm_degraded needs BOTH >4x inflation AND >=5 extra cpu-s") {
    // 5x inflation but only 2 extra cpu-s: small-query noise, not a flag
    val small = quiet(cpuSec = 2.5, cpuBase = 0.5)
    assert(!small.jvmDegraded)
    // 4.5x inflation with 35 extra cpu-s: the r8 JIT-death shape
    val dead = quiet(cpuSec = 45.0, cpuBase = 10.0)
    assert(dead.jvmDegraded)
    assert(dead.retryReason(cores).contains("jvm_degraded"))
  }

  test("suspect tier catches the 1.8-4x gray band and not 1x noise") {
    assert(quiet(cpuSec = 20.0, cpuBase = 10.0).suspect) // 2.0x, q60's shape
    assert(!quiet(cpuSec = 12.0, cpuBase = 10.0).suspect) // 1.2x: clean
    assert(!quiet(cpuSec = 45.0, cpuBase = 10.0).suspect) // 4.5x: degraded, not suspect
    assert(quiet(cpuSec = 20.0, cpuBase = 10.0)
      .retryReason(cores).contains("suspect_cpu_inflation"))
    // sub-0.5-cpu-s baselines have no meaningful ratio: never suspect
    assert(!quiet(cpuSec = 2.0, cpuBase = 0.3).suspect)
    assert(quiet(cpuSec = 2.0, cpuBase = 0.3).cpuInflation == -1.0)
  }

  test("contended triggers on steal, sys, foreign user, or run queue") {
    assert(quiet().copy(stealPct = 6.0).contended(cores))
    assert(quiet().copy(sysPct = 25.0).contended(cores))
    assert(quiet().copy(load = 1.6 * cores).contended(cores))
    // foreign user: machine 80% user while our own tasks account for ~16%
    assert(quiet().copy(userPct = 80.0).contended(cores))
    // unknown (-1) witnesses never flag
    assert(!quiet().copy(userPct = -1.0, sysPct = -1.0, stealPct = -1.0,
      load = -1.0).contended(cores))
  }

  test("retry priority: a degraded JVM outranks ambient contention") {
    val both = quiet(cpuSec = 45.0, cpuBase = 10.0).copy(stealPct = 10.0)
    assert(both.retryReason(cores).contains("jvm_degraded"))
    val contendedOnly = quiet().copy(stealPct = 10.0)
    assert(contendedOnly.retryReason(cores).contains("contended"))
  }

  test("baselineCpu parses the committed snapshot's cpu_sec object") {
    val base = Bench.baselineCpu()
    assert(base.nonEmpty, "docs/BENCH_local_sf0.1.json must carry cpu_sec")
    assert(base.contains("q85_pagerank"))
    assert(base.values.forall(v => v >= 0 && v < 10000))
    // a missing/garbled file degrades to empty, never throws
    assert(Bench.baselineCpu("docs/definitely_missing.json").isEmpty)
  }
}
