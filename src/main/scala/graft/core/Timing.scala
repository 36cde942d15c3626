package graft.core

import java.util.concurrent.atomic.AtomicLong

/** Orchestration-overhead attribution for the streaming-twin queries
  * (the ds series, lm5, g2): their bodies run work a production pipeline never pays
  * per-batch — the INJECTED replays that prove exactly-once semantics,
  * table setup/teardown, rollback re-serves. That overhead dominates the
  * twins' run-to-run timing variance (r13's only gate flag was an
  * intermittent ds4 spike whose isolated loop is flat), so the bench
  * separates it: query bodies wrap those calls in [[overhead]], Bench
  * resets the accumulator per query and reports `stream_overhead_s`,
  * and the time-regression gate compares the OPERATOR component
  * (wall − overhead) when both sides carry the split.
  *
  * Single-JVM scope matches the Bench/Verify drivers (one query at a
  * time on the calling thread; the atomic makes concurrent spec usage
  * safe, attribution there is best-effort and unused).
  */
object Timing {
  private val overheadNanosAcc = new AtomicLong(0L)

  /** Zero the accumulator (Bench calls this before each query). */
  def reset(): Unit = overheadNanosAcc.set(0L)

  /** Seconds accumulated since the last [[reset]]. */
  def overheadSeconds: Double = overheadNanosAcc.get() / 1e9

  /** Run `f`, attributing its wall time to stream-orchestration overhead. */
  def overhead[A](f: => A): A = {
    val t0 = System.nanoTime()
    try f finally overheadNanosAcc.addAndGet(System.nanoTime() - t0)
  }
}
