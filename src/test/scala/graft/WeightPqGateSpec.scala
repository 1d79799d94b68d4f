package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dedup_weighting / emb_pq_encode / stream_quality_gate semantics. */
class WeightPqGateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("dedup_weighting: weights are 1/cluster_size, one canonical per cluster, " +
    "rep map matches dedup_cluster") {
    val rows = Registry.byName("dedup_weighting").run(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val byRep = rows.groupBy(_.getAs[Long]("rep_id"))
    byRep.foreach { case (rep, members) =>
      val size = members.length.toLong
      members.foreach { r =>
        assert(r.getAs[Long]("cluster_size") === size)
        assert(r.getAs[Double]("weight") === 1.0 / size)
        assert(r.getAs[Boolean]("canonical") === (r.getAs[Long]("doc_id") === rep))
      }
      assert(members.count(_.getAs[Boolean]("canonical")) === 1, s"rep $rep")
    }
    val repMap = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_id")).toMap
    val cluster = Registry.byName("dedup_cluster").run(spark, TestSpark.sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_id")).toMap
    assert(repMap === cluster)
  }

  test("emb_pq_encode matches a driver-side exact recompute (codes + argmin ties)") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val seeds = (0 until 4).map(c => emb(c * 50L))
    val got = Registry.byName("emb_pq_encode").run(spark, TestSpark.sf).collect()
    assert(got.length === emb.size * 8)
    got.foreach { r =>
      val v = emb(r.getAs[Long]("vec_id"))
      val j = r.getAs[Long]("sub").toInt
      // same left-to-right double fold as the plan's aggregate()
      val dists = seeds.map { s =>
        var acc = 0.0
        var i = j * 8
        while (i < (j + 1) * 8) { val d = v(i) - s(i); acc += d * d; i += 1 }
        acc
      }
      val best = dists.min
      assert(r.getAs[Long]("code") === dists.indexOf(best).toLong) // first-min tie-break
      assert(r.getAs[Double]("dist2") === best)
    }
  }

  test("stream_quality_gate equals the batch qualityMargin filter") {
    val streamed = Registry.byName("stream_quality_gate").run(spark, TestSpark.sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("margin")))
    val batch = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.qualityMargin(col("text")).as("margin"))
      .filter(col("margin") >= 0L).orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("margin")))
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }
}
