package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the canary's work loop: if the xorshift spin changes, "canary
  * seconds" silently changes unit and every cross-artifact speed
  * comparison breaks — so the checksum is pinned to the literal value,
  * not recomputed. */
class BoxCanarySpec extends AnyFunSuite {

  test("the spin checksum is pinned (the unit of canary seconds)") {
    assert(BoxCanary.spin(1000L)._1 === 6248290529083013365L)
    // zero work leaves the seed untouched
    assert(BoxCanary.spin(0L)._1 === 0x9E3779B97F4A7C15L)
  }

  test("timings are positive and all-core wall is not faster than one core's work") {
    val (one, all) = BoxCanary.sample()
    assert(one > 0.0 && all > 0.0)
    // n threads each do the one-thread work concurrently: wall can't
    // beat a single thread's time by more than scheduler noise
    assert(all >= one * 0.5, s"one=$one all=$all")
  }
}
