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

  test("CANARY.json mirrors the code's iteration constant and pinned checksum") {
    // the committed reference file is what tools normalize against; if
    // the code's spin constant drifts from it, every mechanical
    // normalization silently compares different units
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("CANARY.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(txt.contains(s""""iters": ${BoxCanary.Iters}"""),
      s"CANARY.json iters != BoxCanary.Iters (${BoxCanary.Iters})")
    assert(txt.contains(""""checksumAt1000": 6248290529083013365"""),
      "CANARY.json checksumAt1000 != the spec-pinned spin checksum")
  }

  test("timings reflect real work and all-core wall is not faster than one core's") {
    val (one, all) = BoxCanary.sample()
    // ABSOLUTE floor, not just > 0: the xorshift chain is serially
    // dependent (~3 cycles/iteration minimum), so 5e8 iterations cannot
    // finish in 50 ms on any real CPU — but a JIT that eliminated the
    // loop would report ~1e-5 s. This is the assertion that actually
    // pins the unit of canary seconds (measured ~1.05 s on this box).
    assert(one >= 0.05, s"one-core spin impossibly fast ($one s): loop eliminated?")
    assert(all >= 0.05, s"all-core spin impossibly fast ($all s): loop eliminated?")
    // n threads each do the one-thread work concurrently: wall can't
    // beat a single thread's time by more than scheduler noise
    assert(all >= one * 0.5, s"one=$one all=$all")
    // the checksum sink is observably live after sampling
    assert(BoxCanary.sink != 0L)
  }
}
