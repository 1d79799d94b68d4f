package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming latency artifact (round-7 verdict task #6): the 30+
  * `stream_*` operators are correctness-proven (oracle + bit-for-bit
  * batch equality) but sit off the headline bench (`bench=false` —
  * micro-batch fixed cost would swamp the batch comparisons), so their
  * performance was invisible round-over-round. This main runs each one
  * at sf0.01 with a StreamingQueryListener capturing every micro-batch's
  * `triggerExecution` duration, input rows, AND state-store footprint
  * (rows + bytes from `StreamingQueryProgress.stateOperators` — at
  * 100 TB the state store is the streaming scale-killer, r12 verdict
  * task #3), and writes a per-op p50/p95/max batch-duration +
  * state-size markdown table to STREAM_BENCH.md — a committed artifact
  * successive rounds can diff.
  *
  * Decade discipline (r12): every op whose base run carries state
  * (max state rows > 0) is re-run at the decade corpus
  * (SPARK_GRAFT_SF_DIR_X10, default /root/testdata/sf0.1) and the
  * artifact gains a wall and state-rows growth column — the streaming
  * analog of GrowthBench's e(0.01→0.1). A stateful op whose state rows
  * grow faster than input rows is flagged in the table.
  *
  * fsync pre-check (standing protocol since r11): streaming micro-batch
  * walls are fsync-sensitive — a run in the page-flush wake of a big
  * data-gen inflates state-commit-heavy ops up to +265%. A 4 KB-fsync
  * probe runs BEFORE measuring and its median lands in the header;
  * healthy is sub-ms — treat a multi-ms probe as an environment mode
  * and re-run after dirty pages drain.
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
  *      SPARK_GRAFT_SF_DIR_X10 (decade corpus; "" disables the decade
  *      leg), SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_ONLY (subset).
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
    /** (triggerMs, inputRows, stateRows, stateBytes) per micro-batch. */
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    /** Drain: wait until no new events for ~300 ms (the listener bus is
      * async; attribution by run order needs a quiet point). */
    def drain(): Seq[(Long, Long, Long, Long)] = {
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
      val ops = e.progress.stateOperators
      val (srows, sbytes) =
        if (ops == null) (0L, 0L)
        else (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
      BatchSink.batches.add((ms, e.progress.numInputRows, srows, sbytes))
    }
    override def onQueryIdle(e: QueryIdleEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }

  private def pct(sorted: Seq[Long], p: Double): Long =
    if (sorted.isEmpty) 0L
    else sorted(math.min(sorted.size - 1, (p * sorted.size).toInt))

  /** 4 KB write+fsync probe: median of 21 rounds, in microseconds.
    * Runs on the SAME filesystem the state stores commit to (the
    * checkpoint dirs live under java.io.tmpdir). */
  private def fsyncProbeUs(): Long = {
    val f = java.io.File.createTempFile("graft_fsync", ".bin")
    f.deleteOnExit()
    val buf = java.nio.ByteBuffer.allocate(4096)
    val times = (1 to 21).map { _ =>
      val t0 = System.nanoTime()
      val ch = java.nio.channels.FileChannel.open(f.toPath,
        java.nio.file.StandardOpenOption.WRITE)
      try { buf.rewind(); ch.write(buf); ch.force(true) }
      finally ch.close()
      (System.nanoTime() - t0) / 1000
    }.sorted
    times(times.size / 2)
  }

  private case class Row(name: String, wallS: Double, nBatches: Int,
    p50: Long, p95: Long, max: Long, rows: Long,
    stateRows: Long, stateBytes: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val x10Dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_X10",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val fsyncUs = fsyncProbeUs()
    System.err.println(s"[streambench] fsync probe: $fsyncUs us median")
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

    /** One measured pass over `defs` at `dir` (pass 1 warms, pass 2
      * reported); returns pass-2 rows in run order. */
    def sweep(dir: String, subset: Set[String], tag: String): Vector[Row] = {
      var out = Vector.empty[Row]
      for (pass <- 1 to 2; d <- defs if subset.contains(d.name)) {
        BatchSink.drain() // discard anything left from the previous op
        val t0 = System.nanoTime()
        val ok =
          try {
            d.run(spark, dir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[streambench] FAILED ${d.name}: $e"); false
          }
        val wall = (System.nanoTime() - t0) / 1e9
        val evs = BatchSink.drain()
        val durs = evs.map(_._1).sorted
        val sRows = evs.map(_._3).maxOption.getOrElse(0L)
        val sBytes = evs.map(_._4).maxOption.getOrElse(0L)
        System.err.println(f"[streambench] $tag p$pass ${d.name}: $wall%.2f s " +
          f"ok=$ok batches=${evs.size} p50=${pct(durs, 0.5)}ms " +
          f"p95=${pct(durs, 0.95)}ms rows=${evs.map(_._2).sum} " +
          f"stateRows=$sRows stateMB=${sBytes / 1e6}%.1f")
        if (pass == 2 && ok)
          out :+= Row(d.name, wall, evs.size, pct(durs, 0.5),
            pct(durs, 0.95), durs.lastOption.getOrElse(0L),
            evs.map(_._2).sum, sRows, sBytes)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
      out
    }

    val report = sweep(sfDir, defs.map(_.name).toSet, "base")
    // decade leg: only the ops that actually carry state at base scale
    val stateful = report.filter(_.stateRows > 0).map(_.name).toSet
    val decade =
      if (x10Dir.nonEmpty && stateful.nonEmpty) sweep(x10Dir, stateful, "x10")
      else Vector.empty[Row]
    val decadeBy = decade.map(r => r.name -> r).toMap

    // Adversarial-corpus leg (r13, verdict task #5): the banding/ANN
    // state carriers re-run on same-SCALE adversarial corpora — a
    // viral-template family (clique mode) stresses per-bucket banding
    // state exactly where the batch side proved it matters, clustered
    // vectors stress the ANN probe state. SPARK_GRAFT_ADV_DIRS is a
    // comma list of tag=dir ("" disables); rows compare to the healthy
    // base at the SAME sf, so the interesting column is STATE growth
    // at flat input — does watermark eviction keep the template
    // family's bucket state bounded?
    val advDirs = sys.env.getOrElse("SPARK_GRAFT_ADV_DIRS", "")
      .split(',').toSeq.filter(_.contains('='))
      .map { kv => val a = kv.split("=", 2); (a(0).trim, a(1).trim) }
    val advOps = Set("stream_neardup", "stream_paragraph_dedup",
      "stream_ann_probe").intersect(defs.map(_.name).toSet)
    val advLegs = advDirs.map { case (tag, dir) =>
      (tag, dir, sweep(dir, advOps, s"adv-$tag")) }

    val sb = new StringBuilder
    sb ++= "# STREAM_BENCH — micro-batch latency per streaming operator\n\n"
    sb ++= s"Corpus: `$sfDir`, local[$cpus], warm pass discarded, pass 2 " +
      "reported. Columns: operator wall (start -> final sink read), " +
      "micro-batches observed (incl. state-commit/empty batches), " +
      "per-batch `triggerExecution` p50/p95/max, total input rows, and " +
      "the state-store footprint (max rows / MB across batches, summed " +
      "over the query's state operators).\n\n"
    sb ++= f"fsync pre-check (standing r11 protocol): 4 KB write+fsync " +
      f"median **$fsyncUs us** — healthy is sub-ms; a multi-ms probe " +
      "means the run sits in a page-flush wake and state-commit-heavy " +
      "walls are inflated (observed up to +265%).\n\n"
    sb ++= "| operator | wall s | batches | p50 ms | p95 ms | max ms " +
      "| input rows | state rows | state MB |\n"
    sb ++= "|---|---|---|---|---|---|---|---|---|\n"
    report.foreach { r =>
      sb ++= f"| ${r.name} | ${r.wallS}%.2f | ${r.nBatches} | ${r.p50} " +
        f"| ${r.p95} | ${r.max} | ${r.rows} | ${r.stateRows} " +
        f"| ${r.stateBytes / 1e6}%.2f |\n"
    }
    sb ++= f"\nTotal pass-2 wall: ${report.map(_.wallS).sum}%.1f s over " +
      f"${report.size} operators.\n"
    if (decade.nonEmpty) {
      sb ++= s"\n## Decade: stateful operators at `$x10Dir`\n\n"
      sb ++= "Every op with state at base scale, re-run one decade up " +
        "(same config, pass 2 of 2). `rows x` is input-row growth, " +
        "`state x` state-row growth; state growing FASTER than input " +
        "is the 100 TB state-store alarm and is flagged.\n\n"
      sb ++= "| operator | wall s | wall x | input rows | rows x " +
        "| state rows | state x | state MB | verdict |\n"
      sb ++= "|---|---|---|---|---|---|---|---|---|\n"
      report.filter(r => decadeBy.contains(r.name)).foreach { b =>
        val d = decadeBy(b.name)
        val wallX = if (b.wallS > 0) d.wallS / b.wallS else 0.0
        val rowsX =
          if (b.rows > 0) d.rows.toDouble / b.rows.toDouble else 0.0
        val stateX = if (b.stateRows > 0)
          d.stateRows.toDouble / b.stateRows.toDouble else 0.0
        // sublinear-vs-input state is healthy; allow 1.15x slack for
        // fixed-size state components before alarming
        val verdict =
          if (rowsX > 0 && stateX > rowsX * 1.15) "**SUPERLINEAR**"
          else "ok"
        sb ++= f"| ${b.name} | ${d.wallS}%.2f | $wallX%.1f | ${d.rows} " +
          f"| $rowsX%.1f | ${d.stateRows} | $stateX%.1f " +
          f"| ${d.stateBytes / 1e6}%.2f | $verdict |\n"
      }
    }
    val baseBy = report.map(r => r.name -> r).toMap
    advLegs.filter(_._3.nonEmpty).foreach { case (tag, dir, rows) =>
      sb ++= s"\n## Adversarial corpus `$tag`: dedup/ANN state carriers at `$dir`\n\n"
      sb ++= "Same scale as base (input-row x ≈ 1 expected) — the " +
        "column that matters is STATE rows/bytes vs the healthy " +
        "corpus: bounded state under a viral template / clustered " +
        "vectors is the 100 TB streaming claim.\n\n"
      sb ++= "| operator | wall s | wall x | input rows | rows x " +
        "| state rows | state x | state MB | verdict |\n"
      sb ++= "|---|---|---|---|---|---|---|---|---|\n"
      rows.filter(r => baseBy.contains(r.name)).foreach { a =>
        val b = baseBy(a.name)
        val wallX = if (b.wallS > 0) a.wallS / b.wallS else 0.0
        val rowsX =
          if (b.rows > 0) a.rows.toDouble / b.rows.toDouble else 0.0
        val stateX = if (b.stateRows > 0)
          a.stateRows.toDouble / b.stateRows.toDouble else 0.0
        // at equal input scale, state growing past ~2x the input ratio
        // means the adversarial structure is accumulating in the store
        val verdict =
          if (rowsX > 0 && stateX > rowsX * 2.0) "**STATE-HEAVY**"
          else "ok"
        sb ++= f"| ${a.name} | ${a.wallS}%.2f | $wallX%.1f | ${a.rows} " +
          f"| $rowsX%.1f | ${a.stateRows} | $stateX%.1f " +
          f"| ${a.stateBytes / 1e6}%.2f | $verdict |\n"
      }
    }
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"), "STREAM_BENCH.md")
    java.nio.file.Files.writeString(out, sb.toString)
    println(s"[streambench] wrote $out (${report.size} operators, " +
      s"${decade.size} decade rows)")
    spark.stop()
  }
}
