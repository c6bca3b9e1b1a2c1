package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contention classifier (round-16 verdict #1, hardened
  * per round-17 advice, witness re-anchored per round-18 advice): wall
  * time growing while process CPU stays flat is the CANDIDATE signature
  * for host contention, but a wait-bound engine regression (spill, disk
  * I/O, a lock, a driver-side wait) has exactly that shape — so
  * contended=true additionally requires an external witness. Since r19
  * the witness is `otherCores` — non-self busy CPU cores measured from
  * /proc/stat across exactly the slow sample's window — because the
  * previous witness (1-min loadavg) is damped on a minutes scale and a
  * transient burst competing with a sub-second sample barely moved it,
  * so the witness rarely fired and the phantom class reverted to
  * reading as a regression. Both wall and cpu growing together is a
  * real slowdown and must NOT be acquitted; flat-cpu WITHOUT the
  * witness must not be either.
  */
class BenchStatSpec extends AnyFunSuite {
  import Bench.{Sample, contendedIn}

  /** cpus/4 on the 32-cpu bench host, in external-core units. */
  private val Bar = 8.0

  test("wall >2x, flat cpu, external-CPU witness flags contended (the q127 phantom shape)") {
    // r16's q127: probe wall 0.18s -> 0.88s on unchanged code, gc 0,
    // same work — cpu flat — and the host demonstrably running 11 and
    // 9.3 external cores during the slow samples (the corroboration
    // round-17 advice requires, at the sample granularity round-18
    // advice requires)
    val s = Seq(Sample(0.18, 0, 5.0, 0.4, 0.2),
      Sample(0.88, 0, 5.2, 0.9, 11.0),
      Sample(0.19, 0, 5.1, 0.9, 0.3), Sample(0.20, 0, 5.0, 0.9, 0.1),
      Sample(0.74, 0, 5.3, 1.0, 9.3))
    assert(contendedIn(s, Bar))
  }

  test("a sub-second burst the damped loadavg missed still witnesses (round-18 advice)") {
    // the exact shape the loadavg witness failed on: a competing burst
    // saturates the box for 0.9s — 1-min load barely moves (stays ~0.5)
    // but other_cores over the sample window reads the burst directly
    val s = Seq(Sample(0.18, 0, 5.0, 0.5, 0.2),
      Sample(0.88, 0, 5.2, 0.5, 24.0),
      Sample(0.19, 0, 5.0, 0.5, 0.2))
    assert(contendedIn(s, Bar))
  }

  test("wall >2x with flat cpu but a QUIET witness is NOT contended (wait-bound regression)") {
    // added spill / lock / driver wait: wall grows, cpu flat, but the
    // external witness sees nothing competing — a real regression
    // class that must not self-acquit (round-17 advice)
    val s = Seq(Sample(0.18, 0, 5.0, 0.4, 0.2),
      Sample(0.88, 0, 5.2, 0.5, 0.3),
      Sample(0.90, 0, 5.1, 0.6, 0.2))
    assert(!contendedIn(s, Bar))
  }

  test("witness unavailable (other_cores=-1) cannot corroborate — NOT contended") {
    val s = Seq(Sample(0.18, 0, 5.0, 0.4), Sample(0.88, 0, 5.2, 11.0))
    assert(!contendedIn(s, Bar))
  }

  test("a loaded 1-min average alone is NOT a witness — only sample-window CPU is") {
    // loadavg high (stale spike from before the bench) but the slow
    // sample's own window saw no external CPU: the damped counter must
    // not acquit what the sharp counter contradicts
    val s = Seq(Sample(0.18, 0, 5.0, 9.0, 0.1),
      Sample(0.88, 0, 5.2, 9.0, 0.2))
    assert(!contendedIn(s, Bar))
  }

  test("wall and cpu growing together is NOT contended even under load (real regression)") {
    val s = Seq(Sample(0.18, 0, 5.0, 0.4, 0.2),
      Sample(0.88, 0, 25.0, 12.0, 12.0),
      Sample(0.90, 0, 26.0, 12.0, 12.0))
    assert(!contendedIn(s, Bar))
  }

  test("normal jitter under 2x is not contended") {
    val s = Seq(Sample(0.18, 0, 5.0, 9.0, 9.0),
      Sample(0.25, 0, 5.5, 9.0, 9.0),
      Sample(0.30, 0, 6.0, 9.0, 9.0))
    assert(!contendedIn(s, Bar))
  }

  test("failed samples and missing cpu counters never classify") {
    assert(!contendedIn(Seq(Sample(-1.0, 0, 5.0, 9.0, 9.0),
      Sample(-1.0, 0, 5.0, 9.0, 9.0)), Bar))
    // cpuS = -1 means the counter was unavailable — cannot adjudicate
    assert(!contendedIn(Seq(Sample(0.18, 0, -1.0, 9.0, 9.0),
      Sample(0.88, 0, -1.0, 9.0, 9.0)), Bar))
    assert(!contendedIn(Seq.empty, Bar))
  }

  test("tiny-cpu entries use the absolute epsilon, not just the ratio") {
    // cpu ~0 on both samples (driver-coordinated wait): 0.05s epsilon
    // keeps the flat-cpu test meaningful instead of 1.25 * 0 = 0
    val s = Seq(Sample(0.10, 0, 0.01, 0.3, 0.2),
      Sample(0.30, 0, 0.04, 0.9, 10.0))
    assert(contendedIn(s, Bar))
  }
}
