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
    QueryDef("q_fmt_orc", (s, dir) => roundTrip(s, dir, "orc"), Some(RoundTripAgg)))
}
