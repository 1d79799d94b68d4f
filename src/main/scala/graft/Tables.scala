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

  /** events.ts is parquet timestamp[ns], which Spark 4 refuses to read
    * natively — read nanos as long and truncate to microseconds with
    * integer division (a double division would lose precision on 2^60-ns
    * epoch values). DuckDB's CAST(ts_ns AS TIMESTAMP) truncates the same
    * way, so oracle comparisons stay exact. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }

  /** Register every corpus table as a temp view (idempotent), so SQL-text
    * queries (scalar subqueries, correlated EXISTS) can run verbatim. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
