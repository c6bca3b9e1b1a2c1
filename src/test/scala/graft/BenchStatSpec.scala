package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contention classifier (round-16 verdict #1): wall
  * time growing while process CPU stays flat is host contention; both
  * growing together is a real slowdown and must NOT be acquitted.
  */
class BenchStatSpec extends AnyFunSuite {
  import Bench.{Sample, contendedIn}

  test("wall >2x with flat cpu flags contended (the q127 phantom shape)") {
    // r16's q127: probe wall 0.18s -> 0.88s on unchanged code, gc 0,
    // same work — cpu flat
    val s = Seq(Sample(0.18, 0, 5.0), Sample(0.88, 0, 5.2),
      Sample(0.19, 0, 5.1), Sample(0.20, 0, 5.0), Sample(0.74, 0, 5.3))
    assert(contendedIn(s))
  }

  test("wall and cpu growing together is NOT contended (real regression)") {
    val s = Seq(Sample(0.18, 0, 5.0), Sample(0.88, 0, 25.0),
      Sample(0.90, 0, 26.0))
    assert(!contendedIn(s))
  }

  test("normal jitter under 2x is not contended") {
    val s = Seq(Sample(0.18, 0, 5.0), Sample(0.25, 0, 5.5),
      Sample(0.30, 0, 6.0))
    assert(!contendedIn(s))
  }

  test("failed samples and missing cpu counters never classify") {
    assert(!contendedIn(Seq(Sample(-1.0, 0, 5.0), Sample(-1.0, 0, 5.0))))
    // cpuS = -1 means the counter was unavailable — cannot adjudicate
    assert(!contendedIn(Seq(Sample(0.18, 0, -1.0), Sample(0.88, 0, -1.0))))
    assert(!contendedIn(Seq.empty))
  }

  test("tiny-cpu entries use the absolute epsilon, not just the ratio") {
    // cpu ~0 on both samples (driver-coordinated wait): 0.05s epsilon
    // keeps the flat-cpu test meaningful instead of 1.25 * 0 = 0
    val s = Seq(Sample(0.10, 0, 0.01), Sample(0.30, 0, 0.04))
    assert(contendedIn(s))
  }
}
