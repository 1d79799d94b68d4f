package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: `runMain graft.PlanDump <tag> <q...>`
  * writes each query's `.explain("formatted")` output to
  * plans/<round>/<query>_<tag>.txt (tag = "before" / "after"), so plan
  * claims in OPTIMIZATION_*.md are checkable without running Spark.
  * Round dir and data dir are env-tunable; defaults match round 13.
  * Dev/evidence tooling only — never on the bench or verify path. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <tag> <query> [query...]")
    val tag = args.head
    // plans dir defaults to a per-ROUND subdir via SPARK_GRAFT_ROUND
    // (r13 advice: a fixed r13 default silently overwrote that round's
    // committed evidence when a later round forgot the env var)
    val round = sys.env.getOrElse("SPARK_GRAFT_ROUND", "r14")
    val outDir = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", s"/root/repo/plans/$round"))
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm/graft_spark"
        else System.getProperty("java.io.tmpdir") + "/graft_spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail) {
      val df = Registry.byName(n).run(spark, sfDir)
      // Dataset.explain prints to stdout; use the QueryExecution API to
      // capture the same "formatted" text for the file artifact.
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${n}_$tag.txt"), txt,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      System.err.println(s"[plandump] wrote ${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
