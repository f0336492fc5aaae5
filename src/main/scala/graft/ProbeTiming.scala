package graft

/** Env-gated micro-profiler for the streaming increments' per-batch cost
  * attribution (`GRAFT_PROBE_TIMING=1`): wall seconds + Spark job count per
  * wrapped stage, printed as `SUBPROBE` lines. Off (the default) it is a
  * bare pass-through — no timer, no allocation — so the hooks stay wired
  * in the hot paths permanently. The job counter is fed by any listener
  * that wants to (Probe mains register one); without a feeder the counts
  * read 0 and the wall times remain valid.
  */
object ProbeTiming {
  private val on = sys.env.contains("GRAFT_PROBE_TIMING")
  val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
  def apply[T](name: String)(f: => T): T =
    if (!on) f
    else {
      val t0 = System.nanoTime(); val j0 = jobs.get()
      val r = f
      println(f"  SUBPROBE $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  jobs=${jobs.get() - j0}")
      r
    }
}
