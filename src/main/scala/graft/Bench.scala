package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every Registry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1), forcing full execution with a
  * noop sink (so projections/aggregations are not count-pruned), and
  * prints one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle/spill files on tmpfs: disk writeback stalls on /tmp were
      // randomly charging 30-45s to whichever query shuffled at the
      // wrong moment (observed across repeated runs; GC and CPU steal
      // were ruled out by instrumentation)
      .config("spark.local.dir", "/dev/shm/graft_spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm every query once at the smallest scale: whole-stage codegen
    // classes are cached by plan structure, and first-compilation of the
    // biggest expression trees costs 10-30s — without the warm-up that
    // cost lands on whichever sf query compiles the stage first.
    val warmDir = "/root/testdata/sf0.001"
    Registry.all.filter(_.bench).foreach { d =>
      try d.run(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    val results = Registry.all.filter(_.bench).map { d =>
      val t0 = System.nanoTime()
      val g0 = gcMs
      try d.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${d.name} failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] ${d.name}: $sec%.2f s (gc ${gcMs - g0} ms)")
      d.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
