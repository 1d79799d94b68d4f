package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.SparkSession

/** Cooperative query-cancellation harness — the reference's core feature
  * (main.rs:56-105): run a query in a loop on a worker, wait `waitMs`,
  * signal cancellation, and measure how long until control returns.
  *
  * Spark semantics: the unit of cancellation is the *task* (thread
  * interrupt via job tags with interruptOnCancel), vs DataFusion's
  * await-point polling — mechanically different, but the measured
  * quantity (cancel-request → control-returned latency) maps 1:1
  * (SURVEY.md §3). One SparkSession is reused across runs (SparkContext
  * is a JVM singleton); each run is a fresh job group, preserving the
  * reference's fresh-runtime-per-test measurement intent (main.rs:64).
  */
object Cancel {

  final case class Result(waitMs: Long, cancelMs: Long)

  /** Run `query` in a loop on a worker thread under job tag `tag`; after
    * `waitMs` ms cancel and return elapsed ms from cancel request until
    * the worker observed it (reference main.rs:92-104). */
  def runWithCancel(spark: SparkSession, waitMs: Long,
      query: SparkSession => Unit, tag: String = "graft-cancel"): Result = {
    val sc = spark.sparkContext
    @volatile var cancelled = false
    @volatile var workerError: Throwable = null
    val done = new CountDownLatch(1)
    val worker = new Thread(() => {
      sc.addJobTag(tag)
      sc.setInterruptOnCancel(true)
      try {
        while (!cancelled) {
          try query(spark)
          catch {
            case _: Throwable if cancelled => // cancellation observed
            case e: Throwable =>
              // A genuine failure before cancellation would otherwise end
              // the loop and make the measured latency a meaningless ~0 ms
              // — record it so the caller fails loudly instead.
              workerError = e
              throw e
          }
        }
      } finally {
        sc.clearJobTags()
        done.countDown()
      }
    }, s"graft-cancel-worker-$waitMs")
    worker.setDaemon(true)
    worker.start()
    Thread.sleep(waitMs)
    val t0 = System.nanoTime()
    cancelled = true
    // A CancellationToken stays signalled (reference main.rs:61-97); a
    // single cancelJobsWithTag is a no-op if the query is still in
    // driver-side planning with no job launched yet. Re-signal until the
    // worker observes cancellation, so a job that starts after the first
    // cancel is still killed immediately.
    sc.cancelJobsWithTag(tag)
    while (!done.await(25, java.util.concurrent.TimeUnit.MILLISECONDS)) {
      sc.cancelJobsWithTag(tag)
    }
    if (workerError != null) {
      throw new IllegalStateException(
        s"query failed before cancellation (wait=$waitMs ms) — latency not measured",
        workerError)
    }
    Result(waitMs, (System.nanoTime() - t0) / 1000000L)
  }

  /** Reference main.rs:34-54: sweep wait times, emit the markdown table. */
  def sweep(spark: SparkSession, waits: Seq[Long],
      query: SparkSession => Unit): Seq[Result] =
    waits.map(w => runWithCancel(spark, w, query, tag = s"graft-cancel-$w"))

  def markdownTable(results: Seq[Result]): String =
    ("| Wait time (ms) | Cancel duration (ms) |" ::
      "| --- | --- |" ::
      results.map(r => s"| ${r.waitMs} | ${r.cancelMs} |").toList)
      .mkString("\n")
}
