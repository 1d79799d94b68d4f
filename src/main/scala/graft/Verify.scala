package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg: comma-separated query names — dump only those
    // (dev loop for a single operator; the driver passes two args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t0 = System.nanoTime()
    var nWritten = 0
    var nFailed = 0
    val failed = scala.collection.mutable.ListBuffer[String]()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        nWritten += 1
      } catch { case e: Throwable =>
        nFailed += 1
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // SPARK_GRAFT_TRACE=1: full stack for degenerate-corpus triage
        if (sys.env.contains("SPARK_GRAFT_TRACE")) e.printStackTrace()
      }
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
    val manifest =
      s"""{"n_queries": ${SparkEntry.queries.size},
         | "n_selected": ${selected.size},
         | "n_written": $nWritten,
         | "n_failed": $nFailed,
         | "failed": ${failed.map(q).mkString("[", ",", "]")},
         | "wall_s": ${f"$wallS%.1f"}}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    println(s"[verify] wrote $nWritten/${selected.size} query dumps, " +
      s"$nFailed failed, ${f"$wallS%.1f"}s")
    // exit stays 0 even with per-query failures: the parquet dumps ARE
    // the record and the gate-side checker (check_oracle.py, or the
    // driver's comparator finding MISSING dirs) is where failure must
    // be loud — an unexpected rc from this main risks the driver
    // discarding the partial record wholesale (the r8 empty-gate class).
    spark.stop()
  }
}
