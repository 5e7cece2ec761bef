package graft

/** Host-CPU-steal sampling for bench artifacts.
  *
  * This box is a VM, and host-level steal arrives in windows that can
  * inflate identical-plan wall times by an order of magnitude (round-10
  * adjudication: the same isolated q69 invocation measured 188.1 s and
  * 17.2 s thirty minutes apart; q157 ran 530/57/137 s back-to-back in
  * ONE JVM on identical final plans). Recording the stolen fraction per
  * query turns that adjudication from a rerun ritual into a field in
  * the artifact: a slow entry with high steal is the host's noise, not
  * a plan regression.
  *
  * Fraction = Δsteal / Δtotal ticks across all cpus, read from the
  * aggregate `cpu` line of /proc/stat (USER_HZ cancels in the ratio);
  * -1 when /proc/stat is unavailable (non-Linux) or the window is
  * empty.
  */
object StealMeter {

  /** (steal, total) jiffies from /proc/stat's aggregate cpu line —
    * fields are user nice system idle iowait irq softirq steal ... and
    * steal exists since Linux 2.6.11; absent → 0. */
  def cpuTicks(): Option[(Long, Long)] = ticksFrom(
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try Some(src.getLines().find(_.startsWith("cpu ")))
      finally src.close()
    } catch { case _: Throwable => None })

  /** Pure parse seam for the spec: the aggregate cpu line → (steal,
    * total). */
  private[graft] def ticksFrom(line: Option[Option[String]]): Option[(Long, Long)] =
    line.flatten.flatMap { l =>
      try {
        val f = l.trim.split("\\s+").drop(1).map(_.toLong)
        if (f.isEmpty) None
        // total = fields 0-7 only: the kernel already counts guest /
        // guest_nice (fields 8-9) inside user/nice, so summing them too
        // would double-count guest time and understate the fraction on
        // a hypervisor host (this guest VM reports them as 0)
        else Some((if (f.length > 7) f(7) else 0L, f.take(8).sum))
      } catch { case _: Throwable => None }
    }

  /** Stolen fraction of machine ticks between two snapshots; -1 when
    * either snapshot is missing or no ticks elapsed (a sub-jiffy window
    * has no signal — reporting 0 there would claim a measurement that
    * never happened). */
  def stealFrac(before: Option[(Long, Long)],
                after: Option[(Long, Long)]): Double =
    (before, after) match {
      case (Some((s0, t0)), Some((s1, t1))) if t1 > t0 =>
        (s1 - s0).toDouble / (t1 - t0)
      case _ => -1.0
    }
}
