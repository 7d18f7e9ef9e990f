package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the battery-level contamination trigger arithmetic
  * (Bench.batteryContaminated / Bench.passSkewMedian). Pure functions —
  * no Spark session needed. The trigger exists because a uniformly
  * degraded host window inflates every query below the per-query
  * 3×-best threshold (round 11's driver recut: q89 at ~2.1× with zero
  * solo reruns fired, loadavg_start 9.92 on a 32-cpu box).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("load trigger: fires above ncpus/4, not at or below it") {
    assert(!Bench.batteryContaminated(8.0, 32, 1.0))   // exactly ncpus/4
    assert(Bench.batteryContaminated(8.01, 32, 1.0))
    assert(Bench.batteryContaminated(9.92, 32, 1.14))  // the r11 recut window
    assert(!Bench.batteryContaminated(1.78, 32, 1.14)) // the r11 clean window
  }

  test("skew trigger: fires above 1.4 median, not at or below it") {
    assert(!Bench.batteryContaminated(0.5, 32, 1.4))
    assert(Bench.batteryContaminated(0.5, 32, 1.41))
    assert(Bench.batteryContaminated(0.5, 32, 1.52))   // the r11 recut skew
  }

  test("either signal alone is sufficient") {
    assert(Bench.batteryContaminated(20.0, 32, 1.0))
    assert(Bench.batteryContaminated(0.0, 32, 2.0))
    assert(!Bench.batteryContaminated(0.0, 32, 1.0))
  }

  test("passSkewMedian: median of per-query max/min over shared keys") {
    val p1 = Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0)
    val p2 = Map("a" -> 2.0, "b" -> 2.0, "c" -> 3.3)
    // ratios: a=2.0, b=1.0, c=1.1 → sorted [1.0, 1.1, 2.0] → median 1.1
    assert(math.abs(Bench.passSkewMedian(p1, p2) - 1.1) < 1e-9)
  }

  test("passSkewMedian: failed runs (non-positive) are excluded") {
    val p1 = Map("a" -> 1.0, "b" -> -1.0)
    val p2 = Map("a" -> 1.2, "b" -> 5.0)
    assert(math.abs(Bench.passSkewMedian(p1, p2) - 1.2) < 1e-9)
  }

  test("passSkewMedian: empty comparable set reads 1.0 (never triggers)") {
    assert(Bench.passSkewMedian(Map.empty, Map.empty) == 1.0)
    assert(Bench.passSkewMedian(Map("a" -> -1.0), Map("a" -> 1.0)) == 1.0)
  }
}
