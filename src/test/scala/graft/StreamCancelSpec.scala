package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** Streaming parity with batch, multimodal decode, and cancellation. */
class StreamCancelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("stream_hourly equals the batch event aggregation") {
    val streamed = StreamOps.hourlyByType(spark, TestSpark.sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = Registry.byName("q_events_hourly").run(spark, TestSpark.sf)
      .withColumnRenamed("hour", "hour")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
  }

  test("mm_decode is deterministic and covers every document") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").count()
    val a = Registry.byName("mm_decode").run(spark, TestSpark.sf).collect()
    val b = Registry.byName("mm_decode").run(spark, TestSpark.sf).collect()
    assert(a.length === docs)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val formats = a.map(_.getAs[String]("format")).toSet
    assert(formats.subsetOf(Set("png", "jpeg", "wav")))
  }

  test("cancellation latency is finite and bounded") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    li.persist(); li.count()
    val r = Cancel.runWithCancel(spark, waitMs = 50,
      q => { q.sql("SELECT 1").count(); li.distinct().count(); () })
    li.unpersist()
    assert(r.cancelMs >= 0 && r.cancelMs < 30000,
      s"cancel took ${r.cancelMs} ms")
  }

  test("markdown report renders the reference's table shape") {
    val table = Cancel.markdownTable(Seq(Cancel.Result(10, 17), Cancel.Result(11, 317)))
    assert(table.startsWith("| Wait time (ms) | Cancel duration (ms) |"))
    assert(table.linesIterator.size === 4)
  }
}
