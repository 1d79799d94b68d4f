package graft

import org.scalatest.funsuite.AnyFunSuite

/** sample_mixture water-filling semantics. */
class MixtureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("sample_mixture: max-min fair quotas under the half-corpus budget") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = counts.values.sum / 2
    val rows = Registry.byName("sample_mixture").run(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    // per-source kept count equals the reported quota; quota <= n_source
    val quotaOf = bySource.map { case (src, members) =>
      val q = members.head.getAs[Long]("quota")
      assert(members.length.toLong === q, s"source $src kept != quota")
      assert(members.head.getAs[Long]("n_source") === counts(src))
      assert(q <= counts(src))
      src -> q
    }
    // total kept within budget, and greedy optimality: no unsaturated
    // source could take one more doc without breaking the budget
    val kept = quotaOf.values.sum
    assert(kept <= budget, s"kept $kept > budget $budget")
    val level = quotaOf.collect {
      case (src, q) if q < counts(src) => q
    }
    // all saturated sources share one common level L
    assert(level.toSet.size <= 1, s"levels $level")
    level.headOption.foreach { l =>
      // level+1 would exceed the budget (maximality of L)
      val keptAtNext = counts.values.map(n => math.min(n, l + 1)).sum
      assert(keptAtNext > budget, s"level $l not maximal")
      // a source that kept everything must sit at or below the level
      quotaOf.foreach { case (src, q) =>
        if (q == counts(src)) assert(q <= l, s"source $src above level")
      }
    }
    // ranks within a source are exactly 1..quota
    bySource.foreach { case (src, members) =>
      assert(members.map(_.getAs[Long]("rk")).sorted.toSeq ===
        (1L to quotaOf(src)), s"source $src ranks")
    }
  }

  test("text_shard_pack: every doc assigned once; shard token sums balanced") {
    val rows = Registry.byName("text_shard_pack").run(spark, TestSpark.sf).collect()
    val nDocs = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(rows.length.toLong === nDocs, "one assignment per document")
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet === (0L to 7L).toSet, s"shards ${byShard.keySet}")
    val sums = byShard.map { case (_, m) => m.map(_.getAs[Long]("n_tok")).sum }
    val (mx, mn) = (sums.max, sums.min)
    // round-robin within <8-token-wide bands: totals within a few
    // percent of each other even at sf0.001
    assert(mx - mn <= (mx + mn) / 2 / 10,
      s"shard token sums unbalanced: min $mn max $mx")
    // determinism: a second run produces the identical assignment
    val again = Registry.byName("text_shard_pack").run(spark, TestSpark.sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("class-balanced sample keeps exactly min-label-count per label") {
    import org.apache.spark.sql.functions._
    val out = Registry.byName("sample_class_balanced")
      .run(spark, TestSpark.sf).collect()
    val counts = Tables.load(spark, TestSpark.sf, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val k = counts.values.min
    assert(out.forall(_.getAs[Long]("k_target") == k))
    val byLabel = out.groupBy(_.getAs[Long]("label"))
      .view.mapValues(_.length.toLong).toMap
    assert(byLabel.keySet === counts.keySet)
    byLabel.foreach { case (l, n) => assert(n === k, s"label $l kept $n") }
    // determinism: rerun keeps the identical rows
    val again = Registry.byName("sample_class_balanced")
      .run(spark, TestSpark.sf).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
