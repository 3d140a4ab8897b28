package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention-normalization arithmetic, pinned standalone (no
  * session): the cpu-pressure model and the canary interpolation feed the
  * judged `value_normalized`, so their edge behavior — quiet box reads
  * exactly 1.0, degenerate /proc reads never correct, the cap binds —
  * must not drift under refactors.
  */
class BenchMathSpec extends AnyFunSuite {

  test("cpuFactor: quiet box is exactly 1.0") {
    // 10s wall on 32 cores; box busy == own process busy (no external)
    assert(Bench.cpuFactor((1000L, 500L), (33000L, 32500L), 10.0, 32) == 1.0)
  }

  test("cpuFactor: 24 external cores on 32 models a 4x slowdown") {
    // 10s wall: external = (busy delta 56000 - own 32000) = 24000 ticks
    // = 24 cores -> 32 / (32 - 24) = 4
    val f = Bench.cpuFactor((0L, 0L), (56000L, 32000L), 10.0, 32)
    assert(math.abs(f - 4.0) < 1e-9, s"got $f")
  }

  test("cpuFactor: saturation caps at maxCpuFactor, never diverges") {
    // external ~= all 32 cores -> uncapped model divides by ~0
    val f = Bench.cpuFactor((0L, 0L), (32000L, 100L), 10.0, 32)
    assert(f <= Bench.maxCpuFactor + 1e-9 && f > 10.0, s"got $f")
  }

  test("cpuFactor: unreadable /proc or degenerate interval reads 1.0") {
    assert(Bench.cpuFactor((-1L, -1L), (56000L, 0L), 10.0, 32) == 1.0)
    assert(Bench.cpuFactor((0L, 0L), (-1L, -1L), 10.0, 32) == 1.0)
    assert(Bench.cpuFactor((0L, 0L), (56000L, 0L), 0.0, 32) == 1.0)
  }

  test("cpuFactor: own process busier than the box clamps to 1.0") {
    // tick-sampling jitter can make own-delta exceed box-delta slightly;
    // the factor must clamp, not go sub-1 and inflate the normalized wall
    assert(Bench.cpuFactor((0L, 0L), (1000L, 1200L), 10.0, 32) == 1.0)
  }

  test("canaryFactorAt: flat series means no correction anywhere") {
    val ss = Seq((0, 0.2), (8, 0.2), (16, 0.2))
    (0 until 16).foreach(i => assert(Bench.canaryFactorAt(ss, 0.2, i) == 1.0))
  }

  test("canaryFactorAt: interpolates between bracketing samples") {
    // floor 0.2; samples 0.2 -> 0.6 across positions 0..8: row 3 sits at
    // p = 3.5 -> wall = 0.2 + 0.4 * 3.5/8 = 0.375 -> factor 1.875
    val f = Bench.canaryFactorAt(Seq((0, 0.2), (8, 0.6)), 0.2, 3)
    assert(math.abs(f - 1.875) < 1e-9, s"got $f")
  }

  test("canaryFactorAt: clamps outside the sampled range and below 1") {
    val ss = Seq((4, 0.4), (8, 0.8))
    // row 0 (p=0.5) precedes the first sample -> nearest sample, 0.4/0.2
    assert(Bench.canaryFactorAt(ss, 0.2, 0) == 2.0)
    // row 20 (p=20.5) past the last sample -> 0.8/0.2
    assert(Bench.canaryFactorAt(ss, 0.2, 20) == 4.0)
    // a sample below the floor can't produce a sub-1 factor
    assert(Bench.canaryFactorAt(Seq((0, 0.1), (8, 0.1)), 0.2, 3) == 1.0)
  }
}
