package graft.plans

/** Run independent driver-side thunks from a small fixed pool — guide
  * §2.6: Spark happily runs several jobs at once inside one
  * application; actions are only sequential because the driver calls
  * them sequentially. Used where a build/report fans out into
  * independent actions over shared (cached) inputs: the values are
  * untouched, only the schedule changes, and later jobs back-fill
  * executor capacity freed by earlier jobs' stragglers.
  *
  * Blocks until all complete; exceptions rethrow unwrapped; results
  * keep input order.
  */
object Par {
  def run[T](thunks: Seq[() => T], parallelism: Int = 4): Seq[T] = {
    if (thunks.isEmpty) return Seq.empty
    if (thunks.size == 1) return Seq(thunks.head())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, thunks.size)))
    try {
      val futs = thunks.map(f => pool.submit(
        new java.util.concurrent.Callable[T] { def call(): T = f() }))
      futs.map(fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause })
    } finally pool.shutdown()
  }
}
