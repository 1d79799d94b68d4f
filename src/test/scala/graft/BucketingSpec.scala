package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: pre-shuffling fact tables by join key at write time so
  * repeated joins are co-located — at 100 TB this converts every
  * fact-fact join on the bucket key from a full shuffle into a local
  * zip of buckets. Demonstrated end-to-end through the session catalog. */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed join on the bucket key runs without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.load(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    try {
      // disable broadcast so the join would otherwise need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it is correct
      val expected = Tables.load(spark, TestSpark.sf, "lineitem")
        .join(Tables.load(spark, TestSpark.sf, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("partitioned layout enables partition pruning at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.load(spark, TestSpark.sf, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val filtered = spark.read.parquet(dir)
      .filter(col("event_type") === "error")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"no partition filter in:\n$plan")
    val expected = ev.filter(col("event_type") === "error").count()
    assert(filtered.count() === expected)
  }
}
