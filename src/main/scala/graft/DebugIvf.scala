package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// TEMPORARY r12 diagnosis main — deleted before round close.
object DebugIvf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/root/repo/target/spark_local")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val e0 = Tables.load(spark, dir, "embeddings")
    println(s"[dbg] scan partitions=${e0.rdd.getNumPartitions} defaultPar=${spark.sparkContext.defaultParallelism}")
    val e = if (e0.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism) e0
            else e0.repartition(spark.sparkContext.defaultParallelism)
    println(s"[dbg] after repartition=${e.rdd.getNumPartitions}")
    val n = e.count()
    val stride = math.max(50L, math.floor(math.sqrt(n.toDouble)).toLong)
    val cent = broadcast(e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb")))
    val scored = e.join(cent).select(col("vec_id"), col("c_id"),
      graft.functions.CosineSimilarity(spark, col("embedding"),
        col("c_emb")).as("c_cos"))
    println(s"[dbg] scored partitions=${scored.rdd.getNumPartitions}")
    val thin = scored.groupBy("vec_id")
      .agg(max_by(col("c_id"),
        struct(col("c_cos"), (lit(0L) - col("c_id")).as("nid")))
        .as("list_id"))
    val ck = time("thin agg localCheckpoint")(thin.localCheckpoint())
    println(s"[dbg] thin partitions=${ck.rdd.getNumPartitions} rows=${ck.count()}")
    spark.stop()
  }
}
