package graft.util

/** Process-CPU noise witness shared by Bench and Verify: stable CPU
  * seconds under varying wall-clock ⇒ the plan did the same work and
  * WAITED (machine noise); rising CPU ⇒ real plan cost. The single-thread
  * `cal` probe cannot witness multi-core/IO contention — this can.
  */
object CpuWitness {
  /** Process CPU time in seconds, or -1.0 when the platform bean doesn't
    * support it. */
  def processCpuSec: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        val t = os.getProcessCpuTime
        if (t < 0) -1.0 else t / 1e9
      case _ => -1.0
    }

  /** CPU seconds elapsed between two [[processCpuSec]] samples, or -1.0 if
    * either sample was unsupported — the sentinel must PROPAGATE: a 0 from
    * (-1) − (-1) would read as "the plan only waited" and auto-exonerate a
    * real regression. */
  def delta(t0: Double, t1: Double): Double =
    if (t0 < 0 || t1 < 0) -1.0 else t1 - t0
}
