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

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    // Salting is the MANUAL skew remedy; this proves the AUTOMATIC one
    // the 100 TB posture leans on: AQE detects an oversized shuffle
    // partition at stage boundary and splits it across tasks. One hot
    // key (90% of the fact side) + thresholds lowered to test scale;
    // the salted-join operator stays the remedy of choice when the
    // skew is KNOWN, AQE when it is not.
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(0, 60000)
        .select(col("id").as("row_id"),
          when(col("id") % 10 < 9, 7L).otherwise(col("id") % 1000)
            .as("key"),
          concat_ws("_", lit("payload"), col("id")).as("pad"))
      val dim = spark.range(0, 1000)
        .select(col("id").as("key"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, "key")
      // execute THIS DataFrame's own queryExecution (count() would build
      // a separate one and leave this adaptive plan un-finalized)
      assert(joined.collect().length === 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
