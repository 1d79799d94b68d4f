package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming latency artifact (round-7 verdict task #6): the 30
  * `stream_*` operators are correctness-proven (oracle + bit-for-bit
  * batch equality) but sit off the headline bench (`bench=false` —
  * micro-batch fixed cost would swamp the batch comparisons), so their
  * performance was invisible round-over-round. This main runs each one
  * at sf0.01 with a StreamingQueryListener capturing every micro-batch's
  * `triggerExecution` duration and input rows, and writes a per-op
  * p50/p95/max batch-duration markdown table to STREAM_BENCH.md — a
  * committed artifact successive rounds can diff.
  *
  * Measurement notes: pass 1 warms (C2 tiering, state-store provider
  * init); pass 2 is reported. Batch counts are small (the sf corpus is
  * one parquet file, so the file source sees one batch per query plus
  * empty/commit batches; foreachBatch ops run one query per stage) —
  * the artifact is a fixed-cost latency record, not a throughput claim.
  * Attribution is by run order: listener events are drained until quiet
  * after each operator before snapshotting.
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
  *      SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_ONLY (subset).
  */
object StreamBench {

  /** Static event sink for [[StreamBenchListener]]. The listener is
    * registered through the `spark.sql.streaming.streamingQueryListeners`
    * conf rather than `spark.streams.addListener` because several
    * operators (the transformWithState family) run on `newSession()`
    * clones with their OWN StreamingQueryManager — a manager-level
    * listener on the outer session never sees their batches; the conf
    * applies to every session built from the same SparkConf. */
  private object BatchSink {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    /** Drain: wait until no new events for ~300 ms (the listener bus is
      * async; attribution by run order needs a quiet point). */
    def drain(): Seq[(Long, Long)] = {
      var last = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val n = batches.size()
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      import scala.jdk.CollectionConverters._
      val out = batches.asScala.toSeq
      batches.clear()
      out
    }
  }

  final class StreamBenchListener extends StreamingQueryListener {
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val d = e.progress.durationMs
      val ms = if (d != null && d.containsKey("triggerExecution"))
        d.get("triggerExecution").longValue() else 0L
      BatchSink.batches.add((ms, e.progress.numInputRows))
    }
    override def onQueryIdle(e: QueryIdleEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }

  private def pct(sorted: Seq[Long], p: Double): Long =
    if (sorted.isEmpty) 0L
    else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.StreamBench$StreamBenchListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defs = Registry.all.filter(_.name.startsWith("stream_"))
      .filter(d => only.forall(_.contains(d.name)))

    case class Row(name: String, wallS: Double, nBatches: Int,
      p50: Long, p95: Long, max: Long, rows: Long)
    var report = Vector.empty[Row]
    for (pass <- 1 to 2; d <- defs) {
      BatchSink.drain() // discard anything left from the previous op
      val t0 = System.nanoTime()
      val ok =
        try { d.run(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[streambench] FAILED ${d.name}: $e"); false }
      val wall = (System.nanoTime() - t0) / 1e9
      val evs = BatchSink.drain()
      val durs = evs.map(_._1).sorted
      System.err.println(f"[streambench] p$pass ${d.name}: $wall%.2f s " +
        f"ok=$ok batches=${evs.size} p50=${pct(durs, 0.5)}ms " +
        f"p95=${pct(durs, 0.95)}ms rows=${evs.map(_._2).sum}")
      if (pass == 2 && ok)
        report :+= Row(d.name, wall, evs.size, pct(durs, 0.5),
          pct(durs, 0.95), durs.lastOption.getOrElse(0L), evs.map(_._2).sum)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    val sb = new StringBuilder
    sb ++= "# STREAM_BENCH — micro-batch latency per streaming operator\n\n"
    sb ++= s"Corpus: `$sfDir`, local[$cpus], warm pass discarded, pass 2 " +
      "reported. Columns: operator wall (start -> final sink read), " +
      "micro-batches observed (incl. state-commit/empty batches), " +
      "per-batch `triggerExecution` p50/p95/max, total input rows.\n\n"
    sb ++= "| operator | wall s | batches | p50 ms | p95 ms | max ms | input rows |\n"
    sb ++= "|---|---|---|---|---|---|---|\n"
    report.foreach { r =>
      sb ++= f"| ${r.name} | ${r.wallS}%.2f | ${r.nBatches} | ${r.p50} " +
        f"| ${r.p95} | ${r.max} | ${r.rows} |\n"
    }
    sb ++= f"\nTotal pass-2 wall: ${report.map(_.wallS).sum}%.1f s over " +
      f"${report.size} operators.\n"
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"), "STREAM_BENCH.md")
    java.nio.file.Files.writeString(out, sb.toString)
    println(s"[streambench] wrote $out (${report.size} operators)")
    spark.stop()
  }
}
