package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** emb_ivfpq_search / text_rank_fusion semantics. */
class FusionIvfPqSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("emb_ivfpq_search matches a driver-side exact ADC recompute") {
    val emb = Tables.load(spark, TestSpark.sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val seeds = (0 until 4).map(c => emb(c * 50L))
    // same left-to-right fold as the plan's aggregate()
    def l2(a: Array[Double], b: Array[Double], from: Int, until: Int): Double = {
      var acc = 0.0; var i = from
      while (i < until) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    def coarse(v: Array[Double]): Int = {
      val d = seeds.map(s => l2(v, s, 0, 64)); d.indexOf(d.min)
    }
    def codes(v: Array[Double]): IndexedSeq[Int] = (0 until 8).map { j =>
      val d = seeds.map(s => l2(v, s, j * 8, (j + 1) * 8)); d.indexOf(d.min)
    }
    val lists = emb.view.mapValues(coarse).toMap
    val codeOf = emb.view.mapValues(codes).toMap
    val expected = (0L until 10L).flatMap { q =>
      val qv = emb(q)
      val table = (0 until 8).map(j => seeds.map(s => l2(qv, s, j * 8, (j + 1) * 8)))
      emb.keys.filter(x => x != q && lists(x) == lists(q)).toSeq
        .map { x =>
          var acc = 0.0
          (0 until 8).foreach(j => acc += table(j)(codeOf(x)(j)))
          (x, acc)
        }
        .sortBy { case (x, d) => (d, x) }.take(5).zipWithIndex
        .map { case ((x, d), i) => (q, (i + 1).toLong, x, d) }
    }.toSet
    val got = Registry.byName("emb_ivfpq_search").run(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("adist2"))).toSet
    assert(got === expected)
  }

  test("text_rank_fusion: per-lang ranks are 1..n permutations and rrf is exact") {
    val rows = Registry.byName("text_rank_fusion").run(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, members) =>
      val n = members.length.toLong
      assert(members.map(_.getAs[Long]("r_margin")).sorted.toSeq === (1L to n),
        s"lang $lang margin ranks")
      assert(members.map(_.getAs[Long]("r_ttr")).sorted.toSeq === (1L to n),
        s"lang $lang ttr ranks")
    }
    rows.foreach { r =>
      val exp = 1.0 / (60.0 + r.getAs[Long]("r_margin")) +
        1.0 / (60.0 + r.getAs[Long]("r_ttr"))
      assert(r.getAs[Double]("rrf") === exp)
    }
  }
}
