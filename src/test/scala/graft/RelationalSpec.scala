package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks of relational results against independently computed
  * expectations on the smoke corpus. */
class RelationalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def run(name: String) =
    Registry.byName(name).run(spark, TestSpark.sf)

  test("ref_distinct equals group-by cardinality") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val expected = li
      .groupBy("l_returnflag", "l_linestatus", "l_quantity").count().count()
    assert(run("ref_distinct").count() === expected)
  }

  test("ref_distinct is idempotent") {
    val d = run("ref_distinct")
    assert(d.distinct().count() === d.count())
  }

  test("q1_agg totals reconcile with raw counts") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02")))
    val total = run("q1_agg")
      .agg(sum("count_order")).collect()(0).getLong(0)
    assert(total === li.count())
  }

  test("q_outer_join_agg covers every customer exactly once") {
    val customers = Tables.load(spark, TestSpark.sf, "customer").count()
    val out = run("q_outer_join_agg")
    assert(out.count() === customers)
  }

  test("q_sort_limit returns 20 strictly ordered rows") {
    val rows = run("q_sort_limit").collect()
    assert(rows.length === 20)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q_rollup grand total equals lineitem count") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem").count()
    val grand = run("q_rollup")
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .collect()
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n") === li)
  }

  test("semi and anti joins partition customers for the same predicate") {
    val c = Tables.load(spark, TestSpark.sf, "customer")
    val o = Tables.load(spark, TestSpark.sf, "orders")
      .filter(col("o_orderstatus") === "F")
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(semi + anti === c.count())
    assert(run("q_semi_join").count() === semi)
  }

  test("window rank never exceeds 3 and starts at 1 per customer") {
    val out = run("q_window_rank")
    assert(out.agg(max("rn")).collect()(0).getLong(0) <= 3L)
    val firsts = out.groupBy("o_custkey").agg(min("rn").as("m"))
    assert(firsts.filter(col("m") =!= 1L).count() === 0)
  }

  test("collation grouping collapses case variants into one class each") {
    val out = run("q_collation").collect()
    val types = Tables.load(spark, TestSpark.sf, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    // one output class per distinct lowercase type — the upper-cased
    // variants must NOT form separate groups under UTF8_LCASE
    assert(out.map(_.getAs[String]("k").toLowerCase).toSet === types)
    assert(out.length === types.size)
    // every class saw both case variants (the corpus has even and odd
    // event_ids for each type) and the counts cover the whole table
    out.foreach(r => assert(r.getAs[Long]("n_variants") === 2L))
    assert(out.map(_.getAs[Long]("n")).sum ===
      Tables.load(spark, TestSpark.sf, "events").count())
    // binary-min representative is the UPPER variant (ASCII order)
    out.foreach(r =>
      assert(r.getAs[String]("k") === r.getAs[String]("k").toUpperCase))
  }
}
