package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Salting

/** Salted join must be semantically identical to the plain join. */
class SaltingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("salted join equals plain join row-for-row") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    val plain = ev.join(dim, "user_id")
      .select("event_id", "user_id", "n")
      .orderBy("event_id").collect().map(_.toString).toSeq
    val salted = Salting.saltedJoin(ev, dim, "user_id", col("event_id"), 8)
      .select("event_id", "user_id", "n")
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(salted === plain)
  }

  test("salt spreads a hot key over multiple partitions' sub-keys") {
    import spark.implicits._
    val hot = Seq.tabulate(1000)(i => (i.toLong, 42L)).toDF("event_id", "user_id")
    val salts = hot.select(pmod(xxhash64(col("event_id")), lit(8L)).as("s"))
      .distinct().count()
    assert(salts === 8L)
  }
}
