package graft.sources

import java.util.concurrent.{Callable, Executors, Future => JFuture, ThreadFactory}

import org.apache.spark.sql.SparkSession

/** Driver-side overlap of INDEPENDENT Spark actions (optimization
  * guide §2.6 "Overlap independent jobs"): Spark's scheduler happily
  * runs several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially. Where two
  * materializations provably do not depend on each other (a snapshot
  * transaction's per-component staging writes, a recall gate's
  * independent training chains), submitting them from separate driver
  * threads lets the later job's tasks back-fill executors idled by the
  * earlier job's tail. Results are unchanged — each thunk computes
  * exactly what it computed sequentially; only the wall-clock overlap
  * is new — and FIFO scheduling (the default) keeps the earlier job's
  * resource priority.
  *
  * The pool is cached (not fixed): concurrency is bounded by the call
  * sites (2-5 thunks each), and a cached pool cannot deadlock if a
  * thunk itself fans out. Threads are daemons — an abandoned action
  * never blocks JVM exit.
  */
private[graft] object Par {

  private lazy val pool = Executors.newCachedThreadPool(new ThreadFactory {
    private val n = new java.util.concurrent.atomic.AtomicInteger(0)
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  })

  /** Thread-local Spark scheduling properties worth carrying onto the
    * pool thread so concurrent jobs keep the caller's UI label and
    * cancellation group.
    */
  private val carried = Seq("spark.job.description", "spark.jobGroup.id",
    "spark.job.interruptOnCancel", "spark.scheduler.pool")

  /** Submit one thunk for background execution. The returned future
    * rethrows the thunk's failure on `get`. The caller's session and
    * job-label properties are re-established on the pool thread.
    */
  def submit[T](spark: SparkSession)(thunk: () => T): JFuture[T] = {
    val props = carried.map(k =>
      k -> spark.sparkContext.getLocalProperty(k))
    pool.submit(new Callable[T] {
      override def call(): T = {
        SparkSession.setActiveSession(spark)
        props.foreach { case (k, v) =>
          spark.sparkContext.setLocalProperty(k, v)
        }
        thunk()
      }
    })
  }

  /** Run independent thunks concurrently, returning results in input
    * order. The first failure is rethrown (unwrapped from the executor)
    * after every thunk has been submitted — no partial-submission
    * ambiguity. A single thunk runs inline.
    */
  def run[T](spark: SparkSession)(thunks: Seq[() => T]): Seq[T] =
    if (thunks.sizeIs <= 1) thunks.map(_())
    else thunks.map(submit(spark)).map(await)

  /** `get` with the executor wrapper stripped, so callers see the same
    * exception type the sequential formulation threw.
    */
  def await[T](f: JFuture[T]): T =
    try f.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
}
