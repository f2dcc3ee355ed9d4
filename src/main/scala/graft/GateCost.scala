package graft

/** Wall-clock accumulator for IN-QUERY VERDICT-GATE machinery — the
  * brute-force / full-probe self-check stages (CandVerdict's measure,
  * q384's planted-geometry truth, AnnVerdict's eager equality) that
  * exist to harden the small-SF oracle and are explicitly DROPPED in
  * the 100 TB plan. r14's artifact conflated them with operator cost:
  * 26 % of the cold total was gate machinery, so round-over-round cold
  * comparisons tracked the gates, not the operators. Bench drains this
  * around every timed run and publishes per-query `verdict_sec` plus an
  * `operator_cold_total` headline next to `value`.
  *
  * Thread-safe (queries run serially in Bench, but operators may
  * execute actions from multiple threads); REENTRANT-SAFE via a
  * per-thread depth guard so a gate stage that calls another wrapped
  * stage is not double-counted.
  */
object GateCost {
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val depth = ThreadLocal.withInitial[Integer](() => 0)

  /** Time `body` and add its wall nanos to the accumulator (outermost
    * wrapper only — nested timed blocks count once).
    */
  def timed[T](body: => T): T = {
    val d = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try body finally {
      depth.set(d)
      if (d == 0) acc.addAndGet(System.nanoTime() - t0): Unit
    }
  }

  /** Seconds accumulated since the last drain, and reset to zero. */
  def drainSec(): Double = acc.getAndSet(0L) / 1e9
}
