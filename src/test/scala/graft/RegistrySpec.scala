package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered operator constructs, plans, and executes on the smoke
  * corpus; queries with a DuckDB oracle must also return rows there (an
  * operator whose oracle-checked result is empty proves nothing). */
class RegistrySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("registry has no duplicate names and full oracle wiring") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.queries.keySet === names.toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  // Queries whose correct result may legitimately be empty at sf0.001.
  private val mayBeEmpty = Set("dedup_minhash_pairs", "dedup_simhash_pairs")

  Registry.all.foreach { d =>
    test(s"${d.name} executes on sf0.001") {
      val df = d.run(spark, TestSpark.sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(d.name)) assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
