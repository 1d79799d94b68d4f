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
}
