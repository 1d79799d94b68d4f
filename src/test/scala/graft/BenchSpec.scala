package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench runner's failure contract: a query that throws must surface
  * ok=false (the driver-facing JSON then carries "ok":{...:false} and a
  * non-zero "failures" count) instead of reporting a near-zero elapsed
  * time as a fast success. */
class BenchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("a healthy query reports ok=true") {
    val d = Registry.byName("q_scan_project")
    val (sec, ok) = Bench.runOne(spark, d, TestSpark.sf)
    assert(ok)
    assert(sec > 0.0)
  }

  test("a deliberately broken query reports ok=false, not a fast success") {
    val broken = QueryDef(
      "broken_query",
      (s, dir) => Tables.load(s, dir, "lineitem")
        .selectExpr("no_such_column + 1"),
      None)
    val (_, ok) = Bench.runOne(spark, broken, TestSpark.sf)
    assert(!ok)
    // a query over a missing table must also fail loudly
    val missing = QueryDef(
      "missing_table",
      (s, dir) => Tables.load(s, dir, "not_a_table"),
      None)
    assert(!Bench.runOne(spark, missing, TestSpark.sf)._2)
  }
}
