package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CosineSimilarity
import graft.plans.CosineSelfSimplify

/** Optimizer-rule and extensions surface. */
class ExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("CosineSelfSimplify folds cosine_sim(x, x) to literal 1.0") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CosineSelfSimplify
    try {
      // parquet-backed plan: a local relation would be constant-folded
      // away entirely before the assertion could see anything
      val df = Tables.load(spark, TestSpark.sf, "embeddings")
        .select(col("vec_id"),
          CosineSimilarity(spark, col("embedding"), col("embedding")).as("self_cos"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("1.0"), s"not folded:\n$optimized")
      assert(!optimized.contains("cosine_sim"), s"expression survived:\n$optimized")
      assert(df.collect().forall(_.getDouble(1) === 1.0))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == CosineSelfSimplify)
    }
  }

  test("rule leaves distinct arguments untouched") {
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b")
      .select(CosineSimilarity(spark, col("a"), col("b")).as("c"))
    val p = CosineSelfSimplify(df.queryExecution.analyzed)
    assert(p.toString.contains("cosine_sim"))
  }

  test("GraftExtensions registers function and rule on a fresh builder path") {
    // Can't rebuild the shared session; assert the wiring function runs
    // against a real SparkSessionExtensions instance without error.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    succeed
  }
}
