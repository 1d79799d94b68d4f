package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver corpus (TESTDATA.md).
  *
  * Mirrors the reference's ListingTable registration (reference
  * main.rs:131-144): parquet under a directory becomes a named table;
  * schema is inferred from the parquet footers. Spark's vectorized
  * parquet reader gives the same columnar scan with column pruning and
  * row-group skipping (reference main.rs:126,131) built in.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Spread an under-split scan across every core before heavy per-row
    * expression work (md5 ladders, shingle explosion, image decode).
    * The corpus ships each table as ONE parquet file = one input split,
    * so everything upstream of the first exchange otherwise runs on a
    * single task — measured in round 13 as ~89 s of serial wall across
    * 56 benched queries. Conditional exactly like Dedup.docsParallel
    * (round-2 advice): a pre-split production input (a 100 TB table is
    * thousands of splits) skips the repartition entirely, so this is a
    * no-op at scale and never an extra shuffle there. Results are
    * unaffected: every registry query closes with a total-order sort or
    * a keyed aggregate, neither of which sees input partitioning. */
  def parallel(spark: SparkSession, df: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    if (scanPartitions(df, p) >= p) df else df.repartition(p)
  }

  /** Measured scan partition count, cached per (input file set,
    * parallelism): `df.rdd.getNumPartitions` forces a second full
    * analyze/optimize/physical-planning pass PER INVOCATION just to
    * read the split count (r13 advice) — the count depends only on the
    * scanned files and the session parallelism, so measure once per
    * distinct file set and JVM. The file list itself comes from the
    * already-analyzed plan (no extra planning pass). */
  private val splitCounts = scala.collection.concurrent.TrieMap[String, Int]()

  private def scanPartitions(df: DataFrame, p: Int): Int = {
    val key = df.inputFiles.sorted.mkString("|") + "#" + p
    splitCounts.getOrElseUpdate(key, df.rdd.getNumPartitions)
  }

  /** load + parallel — for operators whose scan feeds heavy map work. */
  def loadParallel(spark: SparkSession, dir: String, name: String): DataFrame =
    parallel(spark, load(spark, dir, name))

  /** Table row count, memoized per corpus fingerprint (r14 — the same
    * discipline as Similarity.embCount / r13 verdict #4): registry-gate
    * pre-flights (requireAllPairsSmall, text_shard_pack's salt width)
    * otherwise launch a count() job at EVERY query build. The count
    * depends only on the table files (size+mtime — an in-place rewrite
    * rebuilds), so measure once per file set and JVM. */
  private val rowCounts = scala.collection.concurrent.TrieMap[String, Long]()

  def rowCount(spark: SparkSession, dir: String, name: String): Long =
    rowCounts.getOrElseUpdate(corpusFingerprint(dir, name),
      load(spark, dir, name).count())

  /** Long metric from an `Observation` attached to a frame that was
    * just eagerly materialized (localCheckpoint): the aggregate is
    * collected DURING the materialization job, replacing the second
    * count job previously paid per convergence check / stage count.
    * Listener delivery is asynchronous — poll briefly and fall back to
    * the caller's equivalent recompute over the materialized blocks
    * (identical value, just a spare job) if the metric never lands.
    * A null metric value (sum over zero rows) reads as 0. */
  def observedLong(obs: org.apache.spark.sql.Observation, key: String)(
      fallback: => Long): Long =
    try {
      import scala.concurrent.Await
      import scala.concurrent.duration.DurationInt
      val row = Await.result(obs.future, 2.seconds)
      row.getAs[Any](key) match {
        case n: Long => n
        case null => 0L
        case _ => fallback
      }
    } catch {
      case _: java.util.concurrent.TimeoutException => fallback
    }

  /** events.ts normalized to TimestampType micros whatever the parquet
    * physical type. The corpus has shipped it two ways across driver
    * rounds: timestamp[ns] (which Spark 4 refuses to read natively —
    * read nanos as long via the legacy conf and truncate to micros with
    * integer division; a double division would lose precision on
    * 2^60-ns epoch values) and timestamp[us] (TIMESTAMP_NTZ in Spark 4
    * — cast to TIMESTAMP, a micros-identity under the pinned UTC
    * session timezone). Both match DuckDB's CAST(ts AS TIMESTAMP)
    * exactly, so oracle comparisons stay bit-for-bit either way. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.withColumn("ts", normTsCol(df.schema))
  }

  /** The ts-normalizing column for an events schema (see loadEvents). */
  def normTsCol(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr}
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast("timestamp")
    }
  }

  /** Register every corpus table as a temp view (idempotent), so SQL-text
    * queries (scalar subqueries, correlated EXISTS) can run verbatim. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Cheap corpus fingerprint for build-once index caches (ivfIndexDir,
    * minhashIndexDir): relative path + size + mtime of every file under
    * the table's parquet tree, hashed. Keying a JVM-lifetime cache on
    * `dir` alone serves STALE indexes if the corpus files at that path
    * are rewritten within one JVM (a test regenerating data in place,
    * or the refresh lifecycle appending a batch) — r9 advice. Listing
    * footers is O(#files) driver metadata work, the same cost Spark
    * itself pays to plan the scan, so this stays cheap at any scale. */
  def corpusFingerprint(dir: String, table: String): String = {
    import java.nio.file.{Files, Path, Paths}
    val root = Paths.get(s"$dir/$table.parquet")
    if (!Files.exists(root)) s"$dir/$table:absent"
    else {
      val walk = Files.walk(root)
      val parts =
        try walk.filter(p => Files.isRegularFile(p))
          .sorted()
          .map[String]((p: Path) =>
            s"${root.relativize(p)}:${Files.size(p)}:" +
              s"${Files.getLastModifiedTime(p).toMillis}")
          .toArray.mkString("|")
        finally walk.close()
      s"$dir/$table#${parts.hashCode}"
    }
  }
}
