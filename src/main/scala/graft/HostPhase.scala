package graft

/** Host-phase meter for benchmark artifacts.
  *
  * This sandbox is a microVM whose host steals CPU in multi-minute phases
  * (BENCH.md documents identical jobs swinging 2-7x). A slow run in a
  * stolen phase looks exactly like a plan regression from wall-clock
  * alone — low in-guest CPU, no GC, no extra shuffle — so every published
  * timing should carry the steal share measured OVER THE SAME INTERVAL.
  * The guest-visible signal is /proc/stat's aggregate `cpu` line: field 8
  * (steal) counts ticks the guest's vCPUs were runnable but the host ran
  * something else.
  *
  * `stealShare` reports steal as a fraction of DEMANDED cpu time
  * (busy + steal, i.e. total minus idle+iowait): "of the CPU this JVM
  * asked for, how much did the host take". Demand-relative, not
  * total-relative, because an idle vCPU accrues no steal — a 32-core box
  * running a 4-thread job would otherwise dilute a fully-stolen phase
  * to ~12%.
  *
  * Returns -1 when /proc/stat is unavailable (non-Linux) — callers
  * publish the -1 rather than omitting the field, so "not measured" is
  * distinguishable from "measured zero".
  */
object HostPhase {
  final case class Snap(busy: Long, steal: Long)

  def snap(): Option[Snap] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        // user nice system idle iowait irq softirq steal guest guest_nice
        val idle = f(3) + (if (f.length > 4) f(4) else 0L)
        val steal = if (f.length > 7) f(7) else 0L
        Some(Snap(f.sum - idle - steal, steal))
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Steal share (0..1) of demanded cpu ticks between two snapshots;
    * -1 when either snapshot is missing or no ticks elapsed. */
  def stealShare(a: Option[Snap], b: Option[Snap]): Double = (a, b) match {
    case (Some(x), Some(y)) =>
      val demand = (y.busy - x.busy) + (y.steal - x.steal)
      if (demand > 0) (y.steal - x.steal).toDouble / demand else -1.0
    case _ => -1.0
  }

  /** Run `body`, returning (result, stealShare over the body's interval). */
  def measured[T](body: => T): (T, Double) = {
    val a = snap(); val r = body; (r, stealShare(a, snap()))
  }
}
