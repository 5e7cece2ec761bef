package graft

/** Fixed-work CPU canary for bench artifacts.
  *
  * Round 11 found the hole StealMeter cannot cover: two full-suite
  * runs at indistinguishable measured steal (~2%) differed by 21%
  * run-for-run — host-level slowness (frequency, co-tenant contention)
  * that never books as guest steal. The canary closes it with an
  * ABSOLUTE speed number: a deterministic xorshift64 spin of fixed
  * iteration count, timed single-threaded and on all cores, sampled at
  * run start and end. Two artifacts are speed-comparable by their
  * canary seconds alone — no same-window rerun needed to detect that a
  * window was slow (the rerun protocol in BASELINE.md remains the
  * adjudicator for WHICH plan changed).
  */
object BoxCanary {

  /** ~1.05 s one-core on this 2.7 GHz box (round-11 reference window,
    * BASELINE.md) — cheap enough to sample twice per run. Mirrored in
    * the committed CANARY.json (spec-pinned match) so normalization is
    * mechanical: total × (reference oneCore / run oneCore). */
  private[graft] val Iters = 500_000_000L

  /** xorshift64 spin: (checksum, seconds) for `iters` rounds. The
    * checksum is returned so the loop is not dead code to the JIT, and
    * is spec-pinned so an accidental edit to the work loop (which would
    * silently change the unit of "canary seconds") breaks the suite. */
  private[graft] def spin(iters: Long): (Long, Double) = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < iters) {
      x ^= x << 13
      x ^= x >>> 7
      x ^= x << 17
      i += 1
    }
    (x, (System.nanoTime() - t0) / 1e9)
  }

  /** Observably-live sink for every spin's checksum: a discarded
    * result would leave the loop dead code the JIT may one day
    * eliminate — which would silently change the unit of canary
    * seconds while every timing assertion still passed. */
  @volatile private[graft] var sink = 0L

  /** (oneCoreSec, allCoresSec): the same fixed work per thread, first
    * on one thread, then on every available core at once (wall time).
    * One-core reads per-core speed; all-cores reads it under the
    * all-core load a Spark pass actually applies (turbo/frequency
    * behavior differs). A short untimed spin first absorbs JIT. */
  def sample(): (Double, Double) = {
    sink ^= spin(1_000_000L)._1
    val (c1, one) = spin(Iters)
    sink ^= c1
    val n = math.max(1, Runtime.getRuntime.availableProcessors)
    val t0 = System.nanoTime()
    val ts = (1 to n).map { _ =>
      val t = new Thread(() => { sink ^= spin(Iters)._1 })
      t.start(); t
    }
    ts.foreach(_.join())
    val all = (System.nanoTime() - t0) / 1e9
    (one, all)
  }
}
