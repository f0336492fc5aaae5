package graft

/** Env-gated micro-profiler for the streaming increments' per-batch cost
  * attribution (`GRAFT_PROBE_TIMING=1`): wall seconds + Spark job count per
  * wrapped stage, printed as `SUBPROBE` lines. Off (the default) it is a
  * bare pass-through — no timer, no allocation — so the hooks stay wired
  * in the hot paths permanently. The job counter is fed by any listener
  * that wants to (Probe mains register one); without a feeder the counts
  * read 0 and the wall times remain valid.
  *
  * Listener events are delivered ASYNCHRONOUSLY on the bus thread, so a
  * short stage can print before its own onJobStart events arrive (the
  * count then leaks into the next stage's delta). Probe mains therefore
  * also install `drain` — a listener-bus flush invoked AFTER the stage
  * timer stops and BEFORE the counter is read, so job attribution is
  * exact without distorting the wall time being measured.
  */
object ProbeTiming {
  private val on = sys.env.contains("GRAFT_PROBE_TIMING")
  val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var drain: () => Unit = () => ()
  def apply[T](name: String)(f: => T): T =
    if (!on) f
    else {
      drain()
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"  SUBPROBE $name%-26s $secs%7.2f s  jobs=${jobs.get() - j0}")
      r
    }
}
