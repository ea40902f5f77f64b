package graft

/** Driver-side action overlap (optimization guide §2.6): Spark happily runs
  * several jobs at once inside one application — actions are sequential only
  * because driver code calls them sequentially. Independent metadata-plane
  * actions (stat scans, footer jobs, counts over checkpointed frames,
  * writes to disjoint directories) are submitted from a small daemon pool
  * so the next job's tasks back-fill executors freed by the current job's
  * tail. The pool is deliberately small — enough to fill the tail, not so
  * many that jobs fight for executors. */
object Par {
  // cached (not fixed) pool: par() calls may nest (a parallel lane that
  // itself fans out footer reads), and a bounded pool whose threads block
  // awaiting inner futures on the same pool can deadlock. Threads are
  // mostly blocked on Spark actions / FS I/O, so an elastic pool is cheap;
  // the caller keeps concurrency low (a handful of lanes per operator).
  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-par")
      t.setDaemon(true)
      t
    })

  lazy val ec: scala.concurrent.ExecutionContextExecutorService =
    scala.concurrent.ExecutionContext.fromExecutorService(pool)

  /** Run the thunks concurrently, return their results in order. Any
    * failure propagates (after all thunks have been started). */
  def par[A](fs: Seq[() => A]): Seq[A] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val e: scala.concurrent.ExecutionContext = ec
    val futs = fs.map(f => Future(f()))
    futs.map(Await.result(_, Duration.Inf))
  }

  /** Two-lane convenience overload. */
  def par2[A, B](fa: () => A, fb: () => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val e: scala.concurrent.ExecutionContext = ec
    val a = Future(fa())
    val b = Future(fb())
    (Await.result(a, Duration.Inf), Await.result(b, Duration.Inf))
  }
}
