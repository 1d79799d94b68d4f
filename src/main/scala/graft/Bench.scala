package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every Registry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1), forcing full execution with a
  * noop sink (so projections/aggregations are not count-pruned), and
  * prints one JSON line for the driver.
  *
  * Each query is instrumented (stderr) with wall time, GC time, JIT
  * compilation time, code-cache occupancy, summed stage task/CPU time
  * and shuffle bytes — enough to tell an engine problem (plan too slow,
  * code-cache exhaustion → interpreted stages) from an environment
  * stall (wall ≫ process CPU with flat task time).
  *
  * Env knobs:
  *  - SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  *  - SPARK_GRAFT_CPUS     local[N] (default 32)
  *  - SPARK_GRAFT_BEST_OF  measured passes; per-query min is reported
  *                         (default 3 — one-off environment stalls on
  *                         this shared VM otherwise land on whichever
  *                         query they hit, and with only 2 passes a
  *                         single stall still decides half the samples;
  *                         see SCALE.md)
  */
object Bench {

  /** Single source of truth for the per-query artifact's location — the
    * warm-pass reader, the regression reader, and the writer all resolve
    * THIS path (round-7 advice: two hardcoded literals could drift, and
    * a checkout outside /root/repo silently disabled the warm pass). */
  private[graft] def benchLastPath: java.nio.file.Path =
    java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"), "BENCH_LAST.json")

  /** Accumulates per-stage totals across the whole app; per-query deltas
    * are taken by snapshotting before/after each run. */
  private final class StageMeter extends SparkListener {
    val taskMs = new AtomicLong
    val cpuMs = new AtomicLong
    val shufRd = new AtomicLong
    val shufWr = new AtomicLong
    val spill = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        taskMs.addAndGet(m.executorRunTime)
        cpuMs.addAndGet(m.executorCpuTime / 1000000L)
        shufRd.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWr.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def snap(): Array[Long] =
      Array(taskMs.get, cpuMs.get, shufRd.get, shufWr.get, spill.get)
  }

  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  private def jitMs: Long = {
    val c = ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported)
      c.getTotalCompilationTime
    else 0L
  }

  /** Used bytes across the three CodeHeap pools (JIT code cache). */
  private def codeCacheUsed: Long = {
    import scala.jdk.CollectionConverters._
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum
  }

  private def procCpuMs: Long =
    ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1000000L
      case _ => 0L
    }

  /** Cheap corpus fingerprint: per-table (rows, bytes) folded into one
    * 8-byte hex string. The driver REGENERATES /root/testdata between
    * rounds, so a per-query delta against last round's BENCH_LAST may
    * be measuring a different corpus, not a code change; the regression
    * report compares fingerprints first and suppresses per-query deltas
    * when they differ. Row counts come from parquet footers (metadata
    * count — no data scan), sizes from the filesystem. */
  private def corpusFingerprint(spark: SparkSession, sfDir: String): String = {
    val parts = Tables.names.map { n =>
      val p = java.nio.file.Paths.get(s"$sfDir/$n.parquet")
      val bytes =
        if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p) else -1L
      val rows =
        try Tables.load(spark, sfDir, n).count()
        catch { case _: Throwable => -1L }
      s"$n:$rows:$bytes"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString(",").getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** Execute one registry query to completion against the noop sink.
    * Returns (wall seconds, ok) — a query that throws reports ok=false
    * and its JSON entry must never masquerade as a fast success
    * (BenchSpec covers the failure path). */
  def runOne(spark: SparkSession, d: QueryDef, sfDir: String): (Double, Boolean) = {
    val t0 = System.nanoTime()
    val ok =
      try {
        d.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] FAILED ${d.name}: $e")
          false
      }
    ((System.nanoTime() - t0) / 1e9, ok)
  }

  /** Drop every persisted/localCheckpointed RDD and cached table left
    * behind by a finished query. Operators use localCheckpoint to reuse
    * expensive intermediates WITHIN one query; across a 150+-query
    * best-of-2 sweep those blocks are dead weight that accumulates in
    * the storage pool (hundreds of checkpointed RDDs by the late
    * queries) and steals execution memory — observed as late-sweep
    * queries burning multiples of their isolated task CPU. The result
    * is already fully materialized to the noop sink, so nothing still
    * references the blocks. */
  private def clearPersisted(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bestOf = sys.env.getOrElse("SPARK_GRAFT_BEST_OF", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle/spill files on tmpfs: disk writeback stalls on /tmp were
      // randomly charging 30-45s to whichever query shuffled at the
      // wrong moment (observed across repeated runs; GC and CPU steal
      // were ruled out by instrumentation)
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new StageMeter
    spark.sparkContext.addSparkListener(meter)

    // SPARK_GRAFT_ONLY=a,b,c restricts the sweep (iteration tool; the
    // driver never sets it, so official runs always cover the registry)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val defs = Registry.all.filter(_.bench)
      .filter(d => only.forall(_.contains(d.name)))

    // Warm every query once at sf0.01: whole-stage codegen classes are
    // cached by plan structure, and the HotSpot C2 compiler only tiers a
    // generated loop up to native code after ~10k invocations — sf0.001
    // (500 docs) never got the md5/shingle loops past the interpreter, so
    // the first sf0.1 execution burned 30x the steady-state CPU
    // (instrumented: dedup_simhash p1 taskCpu 146s vs p2 4.2s for the
    // same rows). sf0.01 is large enough to reach C2 thresholds and
    // small enough to keep warm-up under a minute. A warm-up failure is
    // loud: it predicts a measured-run failure.
    val warmDir = "/root/testdata/sf0.01"
    defs.foreach { d =>
      try d.run(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] WARMUP FAILED ${d.name}: $e")
      }
      clearPersisted(spark)
    }

    // Second, TARGETED warm pass at the measured scale: AQE shapes sf0.1
    // plans differently from sf0.01 (coalesced partitions, switched join
    // strategies → different whole-stage-codegen classes), so for a few
    // heavy shapes the sf0.01 warm-up never compiles the code pass 1
    // runs — observed as 10-50x pass-1/steady ratios (q_pivot 27.9 s vs
    // 0.54 steady in round 6). Warm exactly the queries whose previous
    // sweep (BENCH_LAST.json "passes") showed pass1 > 3x the later-pass
    // minimum: self-tuning, and costs only what pass 1 would have burned
    // anyway — the burn just stops landing in the measured samples.
    val prevPassHist: Map[String, List[Double]] =
      try {
        val lp = benchLastPath
        if (java.nio.file.Files.exists(lp)) {
          val txt = java.nio.file.Files.readString(lp)
          val ps = txt.indexOf("\"passes\":{")
          // bound the scan to the passes OBJECT: values are flat arrays,
          // so the first '}' after the opening brace closes it — without
          // the bound, any later key holding a numeric array would be
          // misread as pass history (round-7 advice)
          val pe = if (ps < 0) -1 else txt.indexOf('}', ps)
          if (ps < 0 || pe < 0) Map.empty
          else "\"([A-Za-z0-9_]+)\":\\[([0-9.eE+,-]+)\\]".r
            .findAllMatchIn(txt.substring(ps, pe + 1))
            .map(m => m.group(1) -> m.group(2).split(',').map(_.toDouble).toList)
            .toMap
        } else Map.empty
      } catch { case _: Exception => Map.empty }
    val coldShapes = defs.filter { d =>
      prevPassHist.get(d.name).exists { ps =>
        ps.size >= 2 && ps.tail.min > 0.0 && ps.head / ps.tail.min > 3.0
      }
    }
    if (coldShapes.nonEmpty) {
      System.err.println(s"[bench] full-scale warm for cold shapes: " +
        coldShapes.map(_.name).mkString(", "))
      coldShapes.foreach { d =>
        val t0 = System.nanoTime()
        try d.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] FULL-WARM FAILED ${d.name}: $e")
        }
        clearPersisted(spark)
        System.err.println(
          f"[bench] warm@sf ${d.name}: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    // best-successful, best-failed, and per-pass history per query, in
    // registry order. Best is tracked ONLY over successful passes — a
    // fast failing pass must never mask a later slower success (round-2
    // advice); the failed time is a fallback used when every pass failed.
    val bestOk = collection.mutable.LinkedHashMap[String, Double]()
    val bestFail = collection.mutable.LinkedHashMap[String, Double]()
    val passes = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)

    defs.foreach { d => bestFail.getOrElseUpdate(d.name, Double.NaN) }
    for (pass <- 1 to bestOf) {
      defs.foreach { d =>
        val g0 = gcMs; val j0 = jitMs; val c0 = procCpuMs
        val s0 = meter.snap()
        val (sec, ok) = runOne(spark, d, sfDir)
        clearPersisted(spark)
        val s1 = meter.snap()
        System.err.println(
          f"[bench] p$pass ${d.name}: $sec%.2f s ok=$ok gc=${gcMs - g0}ms " +
            f"jit=${jitMs - j0}ms cc=${codeCacheUsed / 1048576}MB " +
            f"procCpu=${procCpuMs - c0}ms task=${s1(0) - s0(0)}ms " +
            f"taskCpu=${s1(1) - s0(1)}ms shufRd=${(s1(2) - s0(2)) / 1048576}MB " +
            f"shufWr=${(s1(3) - s0(3)) / 1048576}MB spill=${(s1(4) - s0(4)) / 1048576}MB")
        passes(d.name) = sec :: passes(d.name)
        if (ok && (!bestOk.contains(d.name) || sec < bestOk(d.name)))
          bestOk(d.name) = sec
        if (!ok && (bestFail(d.name).isNaN || sec < bestFail(d.name)))
          bestFail(d.name) = sec
      }
    }

    defs.foreach { d =>
      val hist = passes(d.name).reverse.map(s => f"$s%.2f").mkString(" ")
      System.err.println(s"[bench] passes ${d.name}: $hist")
    }

    // per-query reported value: best successful pass; failed-pass time
    // only when the query never succeeded
    val best = defs.map { d =>
      d.name -> bestOk.getOrElse(d.name, bestFail(d.name))
    }
    val failed = defs.map(_.name).filterNot(bestOk.contains)
    val failures = failed.size
    val total = best.map(_._2).sum

    // per-query pass variance (max/min over the measured passes):
    // best-of-N masks swings like 10.1/13.4/4.0 s — a "regression"
    // computed from two noisy bests is noise, not a plan change, and
    // the report below must say so (round-5 task #5)
    val varRatio: Map[String, Double] = defs.map { d =>
      val ps = passes(d.name)
      d.name -> (if (ps.size >= 2 && ps.min > 0) ps.max / ps.min
                 else Double.NaN)
    }.toMap
    // per-family subtotals (dedup/sim/graph/mm/text/stream/q/...): with
    // 200+ queries a per-area regression is invisible in the total;
    // family = the operator-name prefix, the registry's own grouping
    def family(n: String): String = n.takeWhile(_ != '_')
    val famTotals: Seq[(String, Double)] = best
      .filterNot(_._2.isNaN)
      .groupBy { case (n, _) => family(n) }
      .map { case (f, qs) => f -> qs.map(_._2).sum }
      .toSeq.sortBy(_._1)

    // compact number: enough precision for a seconds-scale bench, short
    // enough that the whole per-query line survives the driver's
    // 2000-char stdout tail window (round 2's 4 KB line was truncated
    // mid-JSON and the official per-query numbers were lost)
    def fmt(v: Double): String =
      if (v.isNaN) "null"
      else {
        val s = f"$v%.2f"
        if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
        else s
      }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sfShort = sfDir.split('/').last

    // capture-proof artifacts: the full-precision result (with per-pass
    // history) goes to a repo file the driver's tail window can never
    // truncate, and the totals line is appended to a trend file so
    // round-over-round regressions stay visible without driver artifacts
    val fullQs = best.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val passesJson = defs.map { d =>
      "\"" + d.name + "\":" + passes(d.name).reverse.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val varianceJson = defs
      .filterNot(d => varRatio(d.name).isNaN)
      .map(d => "\"" + d.name + "\":" + fmt(varRatio(d.name)))
      .mkString("{", ",", "}")
    val familiesJson = famTotals
      .map { case (f, t) => "\"" + f + "\":" + fmt(t) }
      .mkString("{", ",", "}")
    val fp = corpusFingerprint(spark, sfDir)
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,""" +
        s""""passes":$passesJson,"variance":$varianceJson,""" +
        s""""families":$familiesJson,"failures":$failures,"failed":$failedJson,""" +
        s""""best_of":$bestOf,"sf":"$sfDir","corpus":"$fp"}"""
    // artifacts + regression report only for OFFICIAL full sweeps (the
    // driver's config: full registry at sf0.1) — a partial or small-sf
    // dev run must neither overwrite the committed sf0.1 per-query
    // baseline nor append an incomparable line to the trend file
    val official = only.isEmpty && sfShort == "sf0.1"
    try if (official) {
      // per-query regression report vs the previous run's BENCH_LAST:
      // with 160+ benched queries a single-query 2x regression hides
      // inside total noise (round-3 advice: q_fmt_csv 1.36->2.32 s was
      // only visible by manual diff). Parse the old per-query map
      // before overwriting and print the top-5 slowdowns.
      val lastPath = benchLastPath
      val prev: Map[String, Double] =
        if (java.nio.file.Files.exists(lastPath)) {
          val txt = java.nio.file.Files.readString(lastPath)
          val qStart = txt.indexOf("\"queries\":{")
          if (qStart < 0) Map.empty
          else {
            val body = txt.substring(qStart + 11, txt.indexOf('}', qStart))
            "\"([^\"]+)\":([0-9.eE+-]+)".r.findAllMatchIn(body)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
          }
        } else Map.empty
      // fingerprint gate: a regenerated corpus makes per-query deltas
      // incomparable (round-4 postmortem: x0.4-x2.0 swings on untouched
      // code tracked corpus regeneration, not code changes)
      val prevFp =
        if (java.nio.file.Files.exists(lastPath))
          "\"corpus\":\"([0-9a-f]+)\"".r
            .findFirstMatchIn(java.nio.file.Files.readString(lastPath))
            .map(_.group(1))
        else None
      if (prev.nonEmpty && !prevFp.contains(fp)) {
        System.err.println(
          s"[bench] corpus fingerprint changed (${prevFp.getOrElse("none")} " +
            s"-> $fp): per-query deltas measure a DIFFERENT corpus — " +
            "regression report suppressed")
      } else if (prev.nonEmpty) {
        val regressions = best
          .collect { case (name, v) if !v.isNaN && prev.contains(name) &&
              v > prev(name) + 0.25 => // ignore sub-noise-floor jitter
            (name, prev(name), v, v / prev(name))
          }
          .sortBy { case (_, _, _, ratio) => -ratio }
          .take(5)
        if (regressions.isEmpty)
          System.err.println("[bench] no per-query regressions vs previous run")
        else regressions.foreach { case (name, old, now, ratio) =>
          // a query whose own passes swing >1.5x this run is noise, not
          // a plan change — label it so a noisy best-vs-best delta is
          // never read as a regression (round-5 task #5)
          val vr = varRatio.getOrElse(name, Double.NaN)
          if (!vr.isNaN && vr > 1.5)
            System.err.println(
              f"[bench] HIGH-VARIANCE $name: $old%.2f -> $now%.2f s " +
                f"(${ratio}%.2fx) — pass max/min $vr%.2fx, delta unreliable")
          else System.err.println(
            f"[bench] REGRESSION $name: $old%.2f -> $now%.2f s (${ratio}%.2fx)")
        }
      }
      famTotals.foreach { case (f, t) =>
        System.err.println(f"[bench] family $f%-8s $t%8.1f s")
      }
      java.nio.file.Files.writeString(lastPath, full + "\n")
      // the trend file carries the per-query map too (round-3 task #5):
      // one compact-precision line per run, so any two rounds diff
      // per-query without needing the driver's artifacts
      java.nio.file.Files.writeString(
        benchLastPath.resolveSibling("BENCH_HISTORY.jsonl"),
        s"""{"total":${fmt(total)},"n_queries":${best.size},""" +
          s""""failures":$failures,"best_of":$bestOf,"sf":"$sfDir",""" +
          s""""corpus":"$fp","queries":$qs}""" + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] artifact write failed (non-fatal): $e")
    }

    // per-query compact map to stderr (dev visibility). Printed BEFORE
    // the tail-window block below so the 6+ KB line can never crowd the
    // driver-visible last-2000-chars window (and so its truncated head
    // is never the window's only "queries":{ match).
    System.err.println(s"[bench] queries: $qs")

    // Driver-visible per-query data (r13 verdict task #5): the driver
    // keeps only the LAST ~2000 chars of output, so the full 297-query
    // map (~6.4 KB even at compact precision) can never fit — r12/r13
    // PERF came back with per_query empty. Emit the most expensive
    // queries as ONE complete compact JSON object sized to fit the
    // window alongside the families + summary lines: ~60 heaviest
    // queries ≈ half the total wall, enough for a real geomean. The
    // FULL map still goes to BENCH_LAST.json, BENCH_HISTORY.jsonl and
    // stderr above; this line only ADDS driver-visible entries.
    val topBudget = 2000 -
      (s"[bench] families: $familiesJson failed: $failedJson".length + 250)
    val topEntries = best.filterNot(_._2.isNaN).sortBy(-_._2)
    val topSb = new StringBuilder
    var topN = 0
    for ((k, v) <- topEntries) {
      val e = (if (topN == 0) "" else ",") + "\"" + k + "\":" + fmt(v)
      if (topSb.length + e.length <= topBudget - 60) {
        topSb.append(e); topN += 1
      }
    }
    val queriesTop =
      s"""{"metric":"queries_top","unit":"sec","n_top":$topN,""" +
        s""""queries":{${topSb.toString}}}"""

    // The driver json-parses the LAST stdout line. Three rounds of
    // "parsed": null taught: (a) the line must be SHORT (~150 bytes —
    // the round-7 line carried the families map and could truncate);
    // (b) it must be BARE (build.sbt now forks with StdoutOutput and
    // showSuccess=false, so no "[info] " prefix / "[success]" trailer);
    // (c) it must be LAST — printed after spark.stop(), whose shutdown
    // logging otherwise lands after it. Everything dropped here
    // (families, failed list, per-query map) lives in BENCH_LAST.json.
    val summary =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""n_queries":${best.size},"failures":$failures,""" +
        s""""best_of":$bestOf,"sf":"$sfShort","corpus":"$fp"}"""
    System.err.println(s"[bench] families: $familiesJson failed: $failedJson")
    spark.stop()
    println(queriesTop)
    println(summary)
    if (failures > 0) sys.exit(1)
  }
}
