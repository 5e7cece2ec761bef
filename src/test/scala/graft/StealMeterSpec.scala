package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the /proc/stat parse and the stolen-fraction arithmetic that
  * annotate every Bench artifact — a mis-parse here would silently
  * mislabel environmental noise as plan regressions (or vice versa).
  */
class StealMeterSpec extends AnyFunSuite {

  // user nice system idle iowait irq softirq steal guest guest_nice —
  // the guest fields (40, 2) are already inside user/nice per the
  // kernel's accounting, so the total must stop at steal (fields 0-7)
  private val line = "cpu  100 0 50 800 10 0 5 35 40 2"

  test("aggregate cpu line parses to (steal, total), excluding guest") {
    assert(StealMeter.ticksFrom(Some(Some(line))) === Some((35L, 1000L)))
  }

  test("pre-2.6.11 line without a steal field reads steal 0") {
    assert(StealMeter.ticksFrom(Some(Some("cpu  100 0 50 800 10 0 5"))) ===
      Some((0L, 965L)))
  }

  test("garbage and absent lines parse to None") {
    assert(StealMeter.ticksFrom(Some(Some("cpu  abc def"))) === None)
    assert(StealMeter.ticksFrom(Some(None)) === None)
    assert(StealMeter.ticksFrom(None) === None)
    assert(StealMeter.ticksFrom(Some(Some("cpu "))) === None)
  }

  test("stolen fraction over a window is delta-steal over delta-total") {
    val frac = StealMeter.stealFrac(Some((35L, 1000L)), Some((135L, 2000L)))
    assert(math.abs(frac - 0.1) < 1e-12)
  }

  test("missing snapshots or an empty window report -1, not 0") {
    assert(StealMeter.stealFrac(None, Some((1L, 2L))) === -1.0)
    assert(StealMeter.stealFrac(Some((1L, 2L)), None) === -1.0)
    // no ticks elapsed: a sub-jiffy window has no signal
    assert(StealMeter.stealFrac(Some((35L, 1000L)), Some((35L, 1000L))) === -1.0)
  }

  test("live read on this Linux box returns a plausible snapshot") {
    StealMeter.cpuTicks() match {
      case Some((steal, total)) =>
        assert(steal >= 0L)
        assert(total > 0L)
        assert(steal <= total)
      case None => // non-Linux or restricted /proc — the -1 path covers it
    }
  }
}
