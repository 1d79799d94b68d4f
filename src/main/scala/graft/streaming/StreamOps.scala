package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Structured Streaming surface: event-time windowed aggregation with a
  * watermark over the `events` table, driven synchronously from its
  * parquet file (file source → memory sink) so the result is a plain,
  * deterministic DataFrame the oracle can check against the equivalent
  * batch aggregation.
  *
  * The reference has no event streaming (SURVEY.md §2c) — this is part of
  * the north-star pipeline surface. At scale the same plan runs
  * continuously: readStream over an object-store path, watermark bounds
  * state, shuffle is hash(window, event_type).
  */
object StreamOps {

  private val nameCounter = new AtomicInteger(0)

  /** Run the windowed aggregation as a real streaming query to completion
    * and return the final (complete-mode) result as a batch DataFrame. */
  def hourlyByType(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // ts is parquet timestamp[ns]: stream it as raw nanos (long) and
    // convert to a microsecond timestamp in-plan (see Tables.loadEvents).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val sink = s"graft_stream_hourly_${nameCounter.incrementAndGet()}"
    // The file stream source wants a directory: stream the sf dir with a
    // glob that selects just the events table.
    val q = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(sink)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    s.table(sink).orderBy("hour", "event_type")
  }

  /** Streaming deduplication: dropDuplicates over the event-id key keeps
    * per-key state in the state store (bounded by the watermark at 100 TB
    * rates); the deduped append stream lands in a memory sink and is
    * summarized batch-side. */
  def streamingDedup(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(path).schema
    val sink = s"graft_stream_dedup_${nameCounter.incrementAndGet()}"
    val q = s.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(sink)
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    s.table(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "stream_dedup",
      (s, dir) => streamingDedup(s, dir),
      Some("""SELECT event_type, count(DISTINCT event_id) AS n
              FROM events GROUP BY event_type ORDER BY event_type"""),
      bench = false),
    QueryDef(
      "stream_hourly",
      (s, dir) => hourlyByType(s, dir),
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
                count(*) AS n,
                CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
              FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""),
      bench = false)
  )
}
