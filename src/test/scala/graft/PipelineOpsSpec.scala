package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-pipeline operators: sequence packing, stratified sampling,
  * quality filtering, exact centroids, stream-stream interval join. */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("text_pack: pack ids are non-decreasing and respect the token budget") {
    val rows = Registry.byName("text_pack").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_id")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      // replay next-fit locally: pack = floor(cum_before / budget)
      var cum = 0L
      sorted.foreach { case (_, _, n, pack) =>
        assert(pack === cum / 2048L)
        cum += n
      }
    }
  }

  test("sample_stratified is deterministic and en is downsampled vs zh") {
    val a = Registry.byName("sample_stratified").run(spark, TestSpark.sf).collect()
    val b = Registry.byName("sample_stratified").run(spark, TestSpark.sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val byLang = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    val total = Tables.load(spark, TestSpark.sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en sampled at 30%, zh at 80% — rates must order that way
    assert(byLang("en").toDouble / total("en") < byLang("zh").toDouble / total("zh"))
  }

  test("text_filter_quality: kept iff verdict is keep, and both classes occur") {
    val rows = Registry.byName("text_filter_quality").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[String]("verdict"), r.getAs[Boolean]("kept")))
    assert(rows.forall { case (v, k) => k === (v == "keep") })
    assert(rows.exists(_._2), "no document passed the quality gate")
  }

  test("emb_centroid: counts per label cover the corpus, 64 dims each") {
    val rows = Registry.byName("emb_centroid").run(spark, TestSpark.sf).collect()
    val labels = rows.map(_.getAs[Long]("label")).distinct
    assert(rows.length === labels.length * 64)
    val nVecs = Tables.load(spark, TestSpark.sf, "embeddings").count()
    val nPerDim0 = rows.filter(_.getAs[Long]("dim") == 0L)
      .map(_.getAs[Long]("n")).sum
    assert(nPerDim0 === nVecs)
  }

  test("stream interval join equals the batch join aggregation") {
    val streamed = Registry.byName("stream_interval_join").run(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e = Tables.load(spark, TestSpark.sf, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .groupBy(col("p_id").as("purchase_id"))
      .agg(count(lit(1)).as("n_clicks_1h"))
      .orderBy("purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
