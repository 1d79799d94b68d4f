package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MinHashAgg

/** Custom aggregator, IVF ANN, and file-format round-trips. */
class AggFormatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashAgg is the element-wise min and is partitioning-independent") {
    val sigs = Seq(
      (1L, Seq(5L, 9L, 2L)),
      (1L, Seq(7L, 1L, 4L)),
      (2L, Seq(3L, 3L, 3L)))
      .toDF("g", "sig")
    val agg = udaf(new MinHashAgg(3))
    val out1 = sigs.repartition(1).groupBy("g").agg(agg(col("sig")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val out8 = sigs.repartition(8).groupBy("g").agg(agg(col("sig")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out1(1L) === Seq(5L, 1L, 2L))
    assert(out1(2L) === Seq(3L, 3L, 3L))
    assert(out1 === out8)
  }

  test("dedup_minhash_by_source signature dominates every member doc") {
    val bySource = Registry.byName("dedup_minhash_by_source")
      .run(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("perm_id")) ->
        r.getAs[Long]("sig_val")).toMap
    val perDoc = Registry.byName("dedup_minhash").run(spark, TestSpark.sf)
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id", "source")
    val joined = perDoc.join(docs, "doc_id").collect()
    joined.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[Long]("perm_id"))
      assert(bySource(key) <= r.getAs[Long]("sig_val"))
    }
  }

  test("IVF results carry exact cosines and valid list assignments") {
    val brute = Registry.byName("sim_topk_bruteforce").run(spark, TestSpark.sf)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cos")).toMap
    val bruteMax = brute.groupBy(_._1._1).map { case (q, m) => q -> m.values.max }
    val ivf = Registry.byName("sim_ann_ivf").run(spark, TestSpark.sf).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val cos = r.getAs[Double]("cos")
      assert(cos <= bruteMax(q) + 1e-12)
      assert(r.getAs[Long]("list_id") % 50 === 0)
      brute.get((q, r.getAs[Long]("vec_id"))).foreach(b => assert(b === cos))
    }
  }

  Seq("q_fmt_csv", "q_fmt_json", "q_fmt_orc").foreach { name =>
    test(s"$name round-trip preserves the aggregate exactly") {
      val direct = Tables.load(spark, TestSpark.sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"))
        .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val viaFormat = Registry.byName(name).run(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq
      assert(viaFormat === direct)
    }
  }
}
