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

  /** Submit `f` with the caller's session as the pool thread's active one
    * (analysis on a bare thread would resolve against a session missing
    * the graft kernels — the F1Pipeline sink-pool discipline).
    */
  def submit[T](spark: SparkSession)(f: => T): Future[T] =
    pool.submit(new Callable[T] {
      def call(): T = { SparkSession.setActiveSession(spark); f }
    })

  /** Await, unwrapping the ExecutionException to the real cause. */
  def get[T](fut: Future[T]): T =
    try fut.get()
    catch { case e: ExecutionException => throw e.getCause }

  /** Await ignoring outcome — for abort paths that must not leave a
    * staging job running against state the caller is about to release.
    */
  def awaitQuietly(fut: Future[_]): Unit =
    try { fut.get(); () } catch { case _: Throwable => () }
}
