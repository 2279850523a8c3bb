package graft.util

/** Overlap INDEPENDENT driver-side Spark actions (optimization guide
  * §2.6): Spark's scheduler runs several jobs at once inside one
  * application — actions are only sequential because driver code calls
  * them sequentially. A lifecycle operator that must materialize
  * several disjoint tables (or probe several independent frames) pays
  * one fixed job latency per action when serialized; submitting them
  * from a small pool lets the next job's tasks back-fill executors the
  * current job's tail leaves idle — and overlaps the driver-side
  * planning/commit time that is otherwise dead wall-clock between jobs.
  *
  * Contract: thunks must be INDEPENDENT — disjoint output tables,
  * no session-conf mutation (write options belong on the writer, not
  * the session), no ordering dependency. Results/exceptions propagate;
  * on any failure the first error is rethrown after all thunks finish
  * (no half-cancelled state — each thunk is a store mutation whose
  * caller's marker discipline expects it to either run or throw).
  *
  * The pool is CACHED (not fixed-size): callers NEST — a fold wave
  * parallelizes its store families and each family's initStore
  * parallelizes its own table writes — and threads in here spend
  * their time blocked on Spark job completion, not on CPU. A fixed
  * pool deadlocks under that nesting (every pool thread waits on a
  * task queued behind it); a cached pool grows to the actual fan-out
  * (bounded by the handful of tables a lifecycle op touches) and
  * shrinks back after 60 s idle. Spark bounds the real concurrency:
  * jobs queue in the scheduler, tasks in the task scheduler — extra
  * waiting threads here are cheap. Threads are daemons; job
  * descriptions stay per-thread (thread-local in Spark), so UI labels
  * remain correct. */
object Par {
  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    })

  /** Evaluate independent thunks concurrently; return results in input
    * order. Runs the FIRST thunk on the calling thread (inheriting its
    * job-group/description) so a single-element call degenerates to a
    * plain invocation with zero overhead. */
  def eval[A](thunks: Seq[() => A]): Seq[A] = {
    if (thunks.isEmpty) return Nil
    if (thunks.length == 1) return Seq(thunks.head())
    val tail = thunks.tail.map(t => pool.submit(
      new java.util.concurrent.Callable[A] { override def call(): A = t() }))
    // head on the caller's thread: one fewer context switch, and the
    // caller's thread is otherwise idle-waiting anyway
    val headR = scala.util.Try(thunks.head())
    val tailR = tail.map(f => scala.util.Try(f.get()).recoverWith {
      // unwrap the executor's wrapper so callers see the real failure
      case e: java.util.concurrent.ExecutionException =>
        scala.util.Failure(e.getCause)
    })
    val all = headR +: tailR
    all.collectFirst { case scala.util.Failure(e) => e }.foreach(throw _)
    all.map(_.get)
  }

  /** Run independent side-effecting actions concurrently. */
  def run(thunks: (() => Unit)*): Unit = { eval[Unit](thunks.toSeq); () }
}
