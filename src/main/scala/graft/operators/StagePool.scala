package graft.operators

import java.util.concurrent.{Callable, ExecutionException, Executors, Future}

import org.apache.spark.sql.SparkSession

/** Shared daemon pool for overlapping INDEPENDENT Spark jobs inside one
  * operator (guide §2.6: actions are only sequential because driver code
  * calls them sequentially) — used by the store grow paths to stage
  * multiple tables' append files concurrently while their manifest
  * commits stay in contract order. Small on purpose: 2-3 jobs in flight
  * fill the scheduler's tail without fighting the foreground job.
  */
private[graft] object StagePool {

  private lazy val pool = Executors.newFixedThreadPool(3, (r: Runnable) => {
    val t = new Thread(r, "graft-stage"); t.setDaemon(true); t
  })

  /** Job-scoping local properties a pool thread must inherit from its
    * submitter: pool threads are created lazily and keep whatever
    * inheritable locals the FIRST submitter had, so without an explicit
    * copy a streaming query's cancelJobGroup would never reach staged
    * jobs, and one caller's description would label every later caller's
    * jobs on that thread (round-17 advice fix).
    */
  private val scopedProps = Seq("spark.jobGroup.id", "spark.job.description",
    "spark.job.interruptOnCancel", "spark.scheduler.pool")

  /** Submit `f` with the caller's session as the pool thread's active one
    * (analysis on a bare thread would resolve against a session missing
    * the graft kernels — the F1Pipeline sink-pool discipline), and the
    * caller's job-scoping properties set for the duration of the task.
    */
  def submit[T](spark: SparkSession)(f: => T): Future[T] = {
    val sc = spark.sparkContext
    val props = scopedProps.map(k => k -> sc.getLocalProperty(k))
    pool.submit(new Callable[T] {
      def call(): T = {
        SparkSession.setActiveSession(spark)
        val saved = scopedProps.map(k => k -> sc.getLocalProperty(k))
        props.foreach { case (k, v) => sc.setLocalProperty(k, v) }
        try f
        finally saved.foreach { case (k, v) => sc.setLocalProperty(k, v) }
      }
    })
  }

  /** Await, unwrapping the ExecutionException to the real cause. */
  def get[T](fut: Future[T]): T =
    try fut.get()
    catch { case e: ExecutionException => throw e.getCause }

  /** Await ALL futures; if any failed, every other future is still
    * awaited (quietly) before the FIRST failure rethrows — the abort
    * discipline for Seq-shaped overlap sites: a caller that throws with
    * siblings still running would release frames those jobs read.
    */
  def getAll[T](futs: Seq[Future[T]]): Seq[T] = {
    val results = futs.map(f => try Right(get(f)) catch {
      case e: Throwable => Left(e)
    })
    results.collectFirst { case Left(e) => e }.foreach(e => throw e)
    results.collect { case Right(v) => v }
  }

  /** Await ignoring outcome — for abort paths that must not leave a
    * staging job running against state the caller is about to release.
    */
  def awaitQuietly(fut: Future[_]): Unit =
    try { fut.get(); () } catch { case _: Throwable => () }

  /** Await ignoring failure, returning the value when the future
    * SUCCEEDED — abort paths use this to release a successfully built
    * sibling's resources (e.g. a localCheckpoint's blocks) instead of
    * pinning them until context GC (round-17 advice fix).
    */
  def awaitValueQuietly[T](fut: Future[T]): Option[T] =
    try Some(fut.get()) catch { case _: Throwable => None }
}
