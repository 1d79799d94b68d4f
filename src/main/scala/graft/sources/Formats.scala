package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.{QueryDef, Tables}

/** Source/sink coverage beyond parquet: CSV, JSON-lines and ORC file
  * round-trips. Each operator writes a lineitem projection to a scratch
  * directory in the chosen format, reads it back (explicit schema — no
  * inference pass at scale), and aggregates; the oracle computes the same
  * aggregate from the original parquet, so the round-trip must preserve
  * values exactly (doubles survive via shortest-representation text in
  * CSV/JSON and natively in ORC).
  */
object Formats {

  private val RoundTripAgg: String =
    """SELECT l_returnflag, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // per-process-unique scratch (a fixed path would let two concurrent
  // JVMs — Verify + Bench — clobber each other's round-trip files), but
  // REUSED across invocations within the process and deleted at JVM
  // exit: a fresh dir per call leaked a lineitem-sized directory under
  // /tmp for every bench pass / verify run
  private val scratchDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def scratchFor(fmt: String): String =
    scratchDirs.getOrElseUpdate(fmt, {
      val p = java.nio.file.Files.createTempDirectory(s"graft_fmt_$fmt")
      sys.addShutdownHook {
        import java.nio.file.{Files, Path}
        import java.util.Comparator
        if (Files.exists(p)) {
          val walk = Files.walk(p)
          try walk.sorted(Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
          finally walk.close()
        }
      }
      p.toString
    })

  private def roundTrip(s: SparkSession, dir: String, fmt: String): DataFrame = {
    val sub = Tables.load(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    val scratch = scratchFor(fmt)
    sub.write.mode("overwrite").format(fmt).save(scratch)
    val schema = StructType.fromDDL(
      "l_orderkey BIGINT, l_linenumber INT, l_returnflag STRING, l_quantity DOUBLE")
    s.read.format(fmt).schema(schema).load(scratch)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"))
      .orderBy("l_returnflag")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_fmt_csv", (s, dir) => roundTrip(s, dir, "csv"), Some(RoundTripAgg)),
    QueryDef("q_fmt_json", (s, dir) => roundTrip(s, dir, "json"), Some(RoundTripAgg)),
    QueryDef("q_fmt_orc", (s, dir) => roundTrip(s, dir, "orc"), Some(RoundTripAgg)),

    // Hive-style partitioned layout + partition pruning: events written
    // once per invocation partitioned by event_type, then read back with
    // an event_type predicate. The filter resolves against DIRECTORY
    // NAMES — the pruned partitions' files are never listed, opened or
    // decoded (PlanSpec asserts the PartitionFilters entry), which is
    // the mechanism that turns a 100 TB scan into a single-partition
    // scan when the predicate matches the layout. The oracle computes
    // the same aggregate from the unpartitioned original, so the
    // write→prune→read path must preserve values exactly.
    QueryDef(
      "q_partitioned_prune",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, count, lit, sum}
        val scratch = scratchFor("part")
        Tables.load(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value")
          .write.mode("overwrite").partitionBy("event_type").parquet(scratch)
        s.read.parquet(scratch)
          .filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id ORDER BY user_id""")),

    // Parquet schema evolution: two file generations with different
    // schemas (generation 2 adds l_discount) read together under
    // mergeSchema — the footer-merge path every long-lived 100 TB table
    // hits when columns are added over time. Old-generation rows surface
    // the new column as NULL; the oracle recomputes the same aggregate
    // from the unsplit original, so the merge must neither drop rows nor
    // misalign columns. bench=false: an I/O-layout feature, not a
    // throughput path (the format round-trips cover sink throughput).
    QueryDef(
      "q_schema_evolution",
      (s, dir) => {
        import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum}
        val scratch = scratchFor("evo")
        val li = Tables.load(s, dir, "lineitem")
        li.filter(col("l_linenumber") % 2 === 0)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
          .write.mode("overwrite").parquet(s"$scratch/gen1")
        li.filter(col("l_linenumber") % 2 =!= 0)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
            "l_discount")
          .write.mode("overwrite").parquet(s"$scratch/gen2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$scratch/gen1", s"$scratch/gen2")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"),
            sum(coalesce(col("l_discount"), lit(0.0)).cast("decimal(12,2)"))
              .cast("double").as("disc"))
          .orderBy("l_returnflag")
      },
      bench = false,
      oracle = Some("""SELECT l_returnflag, count(*) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
                CAST(sum(CASE WHEN l_linenumber % 2 != 0
                              THEN CAST(l_discount AS DECIMAL(12,2))
                              ELSE CAST(0.0 AS DECIMAL(12,2)) END) AS DOUBLE) AS disc
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")))
}
