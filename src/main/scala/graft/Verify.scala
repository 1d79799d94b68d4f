package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Round-10 forensics (VERDICT r9 task #1): two consecutive rounds'
    * official CORRECTNESS records were `{}` while the engine replayed
    * 100% green, and nothing in-tree recorded whether the driver ever
    * INVOKED the gate. Append one JSON line per invocation — once at
    * entry (survives a driver-side kill) and once at exit with rc and
    * wall — to a committed per-round log. Best-effort: logging must
    * never fail the gate itself.
    *
    * Rotation (r12, the r11 nit): the log is append-only and every
    * driver/builder/judge run extends it, so a single file becomes
    * unreadable by round 30. Lines now land in
    * gate_logs/GATE_LOG_r<N>.jsonl where N is inferred as
    * max(CORRECTNESS_r*.json present) + 1 — the round currently being
    * built, with zero maintained state (the driver writes round N's
    * record at the N→N+1 boundary). r1–r11 history is preserved at
    * gate_logs/GATE_LOG_r01_r11.jsonl; the root GATE_LOG.jsonl is a
    * one-line pointer. Fallback on any inference error: the old root
    * path. */
  private[graft] def currentRound(root: String): Int =
    try {
      val rx = "CORRECTNESS_r(\\d+)\\.json".r
      val stream = Files.list(Paths.get(root))
      // mx stays 0 when no CORRECTNESS file matched: return 0 (root
      // GATE_LOG.jsonl fallback) to agree with check_oracle.py's
      // _current_round on an empty repo, not r01 (r12 advice).
      val mx = try {
        val seen = stream.iterator()
        var m = 0
        while (seen.hasNext) {
          seen.next().getFileName.toString match {
            case rx(n) => m = math.max(m, n.toInt)
            case _ => ()
          }
        }
        m
      } finally stream.close()
      if (mx == 0) 0 else mx + 1
    } catch { case _: Throwable => 0 }

  private[graft] def gateLog(fields: (String, String)*): Unit =
    try {
      val root = Seq("/root/repo", ".")
        .find(p => Files.isDirectory(Paths.get(p, ".git"))).getOrElse(".")
      val esc = (s: String) => s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
      val line = fields
        .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
        .mkString("{", ", ", "}\n")
      val round = currentRound(root)
      val target = if (round > 0) {
        Files.createDirectories(Paths.get(root, "gate_logs"))
        Paths.get(root, "gate_logs", f"GATE_LOG_r$round%02d.jsonl")
      } else Paths.get(root, "GATE_LOG.jsonl")
      Files.writeString(target, line,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => () }

  private[graft] def gateEnv: Seq[(String, String)] =
    sys.env.toSeq.collect {
      case (k, v) if k.startsWith("SPARK_GRAFT_") || k.startsWith("CHECK_") =>
        ("env." + k, v)
    }.sortBy(_._1)

  /** Who invoked the gate (round-10 verdict nit: driver, builder and
    * judge lines were indistinguishable). GATE_CALLER env wins when
    * set; otherwise the parent process's command line — the driver's
    * harness, an sbt shell, or a bare bash — plus the cwd. */
  private[graft] def gateCaller: Seq[(String, String)] = {
    val parent = try {
      ProcessHandle.current().parent()
        .flatMap[String](p => p.info().commandLine())
        .orElse("?")
    } catch { case _: Throwable => "?" }
    Seq(
      "caller" -> sys.env.getOrElse("GATE_CALLER", parent.take(200)),
      "cwd" -> sys.props.getOrElse("user.dir", "?"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    gateLog(Seq(
      "ts" -> java.time.Instant.now.toString,
      "tool" -> "graft.Verify", "phase" -> "start",
      "args" -> args.mkString(" ")) ++ gateCaller ++ gateEnv: _*)
    // optional third arg: comma-separated query names — dump only those
    // (dev loop for a single operator; the driver passes two args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Concurrent query dumps (round-9: a sequential full-registry dump
    // is ~11 min at local[32] and far worse at the default local[4] —
    // long enough to risk a driver-side timeout, the one mechanism that
    // explains the r8 empty gate). Most of that wall is per-query
    // planning/scheduling gaps, not executor saturation, so overlapping
    // a few queries recovers it. Each worker runs on its own
    // spark.newSession(): temp views and UDF registrations are
    // session-scoped, so fixed-name views (graft_neardup_pairs, tpch
    // tables) cannot race; the shared SparkContext schedules fairly.
    // Set SPARK_GRAFT_VERIFY_WORKERS=1 to restore the sequential path.
    val workers = sys.env.get("SPARK_GRAFT_VERIFY_WORKERS")
      .map(_.toInt).getOrElse(math.min(8, cpus.toInt)).max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t0 = System.nanoTime()
    val nWritten = new AtomicInteger(0)
    val nFailed = new AtomicInteger(0)
    val failed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }

    def runOne(sess: SparkSession, name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try {
        fn(sess, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        nWritten.incrementAndGet()
      } catch { case e: Throwable =>
        nFailed.incrementAndGet()
        failed.add(name)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // SPARK_GRAFT_TRACE=1: full stack for degenerate-corpus triage
        if (sys.env.contains("SPARK_GRAFT_TRACE")) e.printStackTrace()
      }

    if (workers <= 1) {
      selected.foreach { case (name, fn) => runOne(spark, name, fn) }
    } else {
      val queue = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]()
      selected.foreach(queue.add)
      val threads = (1 to workers).map { _ =>
        val t = new Thread(() => {
          val sess = spark.newSession()
          // thread-local active session: operator code that resolves
          // SparkSession.active (implicit encoders, expr parsing) must
          // see THIS worker's session, not whichever thread won a race
          SparkSession.setActiveSession(sess)
          var item = queue.poll()
          while (item != null) {
            runOne(sess, item._1, item._2)
            item = queue.poll()
          }
        })
        t.setDaemon(true); t.start(); t
      }
      threads.foreach(_.join())
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // manifest.json (round-8 postmortem: CORRECTNESS_r08 recorded ZERO
    // entries and nothing failed loud): the gate-side checker refuses an
    // empty or partial dump when this says the registry is bigger — an
    // absent-or-empty correctness record must be an ERROR, not a
    // vacuous pass. n_queries is the FULL registry size even under the
    // dev-loop `only` filter so a filtered dump can never masquerade as
    // a complete sweep (check_oracle.py skips the completeness gate
    // only when it sees n_selected < n_queries).
    val wallS = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val manifest =
      s"""{"n_queries": ${SparkEntry.queries.size},
         | "n_selected": ${selected.size},
         | "n_written": ${nWritten.get},
         | "n_failed": ${nFailed.get},
         | "failed": ${failed.asScala.toSeq.sorted.map(q).mkString("[", ",", "]")},
         | "wall_s": ${f"$wallS%.1f"}}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    println(s"[verify] wrote ${nWritten.get}/${selected.size} query dumps, " +
      s"${nFailed.get} failed, ${f"$wallS%.1f"}s, workers=$workers")
    gateLog(Seq(
      "ts" -> java.time.Instant.now.toString,
      "tool" -> "graft.Verify", "phase" -> "done",
      "args" -> args.mkString(" "),
      "n_written" -> nWritten.get.toString,
      "n_failed" -> nFailed.get.toString,
      "workers" -> workers.toString,
      "wall_s" -> f"$wallS%.1f") ++ gateCaller: _*)
    // exit stays 0 even with per-query failures: the parquet dumps ARE
    // the record and the gate-side checker (check_oracle.py, or the
    // driver's comparator finding MISSING dirs) is where failure must
    // be loud — an unexpected rc from this main risks the driver
    // discarding the partial record wholesale (the r8 empty-gate class).
    spark.stop()
  }
}
