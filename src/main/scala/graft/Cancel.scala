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

  final case class IsolationResult(victim: Result, othersOk: Seq[Boolean],
    otherWallMs: Seq[Long])

  /** Multi-tenant isolation (round-7 verdict task #7): the reference
    * cancels the ONLY running query; a shared 100 TB cluster cancels one
    * tenant's job while others run. Launch `nOthers` concurrent queries
    * each under its OWN job tag (tags are thread-local to the submitting
    * thread, so each worker's jobs carry only its tag), plus one victim
    * under the cancel tag; cancel the victim after `waitMs` and assert
    * the blast radius: the victim's latency is measured as usual, the
    * others run to completion and report success + wall time. */
  def runConcurrentCancel(spark: SparkSession, waitMs: Long,
      query: SparkSession => Unit, nOthers: Int = 3,
      neighbor: SparkSession => Unit = null): IsolationResult = {
    val sc = spark.sparkContext
    val neighborQ = if (neighbor != null) neighbor else query
    val ok = Array.fill(nOthers)(false)
    val wall = Array.fill(nOthers)(0L)
    val done = new CountDownLatch(nOthers)
    val others = (0 until nOthers).map { i =>
      val t = new Thread(() => {
        sc.addJobTag(s"graft-other-$i")
        val t0 = System.nanoTime()
        try { neighborQ(spark); ok(i) = true }
        catch { case _: Throwable => ok(i) = false }
        finally {
          wall(i) = (System.nanoTime() - t0) / 1000000L
          sc.clearJobTags()
          done.countDown()
        }
      }, s"graft-other-$i")
      t.setDaemon(true)
      t
    }
    others.foreach(_.start())
    val victim = runWithCancel(spark, waitMs, query, tag = "graft-victim")
    done.await()
    IsolationResult(victim, ok.toSeq, wall.toSeq)
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
