package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MinHashAgg

/** Custom aggregator, IVF ANN, and file-format round-trips. */
class AggFormatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("MinHashAgg is the element-wise min and is partitioning-independent") {
    val sigs = Seq(
      (1L, Seq(5L, 9L, 2L)),
      (1L, Seq(7L, 1L, 4L)),
      (2L, Seq(3L, 3L, 3L)))
      .toDF("g", "sig")
    val agg = udaf(new MinHashAgg(3))
    val out1 = sigs.repartition(1).groupBy("g").agg(agg(col("sig")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val out8 = sigs.repartition(8).groupBy("g").agg(agg(col("sig")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out1(1L) === Seq(5L, 1L, 2L))
    assert(out1(2L) === Seq(3L, 3L, 3L))
    assert(out1 === out8)
  }

  test("dedup_minhash_by_source signature dominates every member doc") {
    val bySource = Registry.byName("dedup_minhash_by_source")
      .run(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("perm_id")) ->
        r.getAs[Long]("sig_val")).toMap
    val perDoc = Registry.byName("dedup_minhash").run(spark, TestSpark.sf)
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id", "source")
    val joined = perDoc.join(docs, "doc_id").collect()
    joined.foreach { r =>
      val key = (r.getAs[String]("source"), r.getAs[Long]("perm_id"))
      assert(bySource(key) <= r.getAs[Long]("sig_val"))
    }
  }

  test("IVF results carry exact cosines and valid list assignments") {
    val brute = Registry.byName("sim_topk_bruteforce").run(spark, TestSpark.sf)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cos")).toMap
    val bruteMax = brute.groupBy(_._1._1).map { case (q, m) => q -> m.values.max }
    val ivf = Registry.byName("sim_ann_ivf").run(spark, TestSpark.sf).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val cos = r.getAs[Double]("cos")
      assert(cos <= bruteMax(q) + 1e-12)
      assert(r.getAs[Long]("list_id") % 50 === 0)
      brute.get((q, r.getAs[Long]("vec_id"))).foreach(b => assert(b === cos))
    }
  }

  Seq("q_fmt_csv", "q_fmt_json", "q_fmt_orc", "q_fmt_avro", "q_fmt_xml")
    .foreach { name =>
    test(s"$name round-trip preserves the aggregate exactly") {
      val direct = Tables.load(spark, TestSpark.sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"))
        .orderBy("l_returnflag").collect().map(_.toString).toSeq
    val viaFormat = Registry.byName(name).run(spark, TestSpark.sf)
        .collect().map(_.toString).toSeq
      assert(viaFormat === direct)
    }
  }

  private def parquetFiles(path: String): Seq[java.io.File] = {
    val d = new java.io.File(path)
    Option(d.listFiles()).fold(Seq.empty[java.io.File])(_.toSeq)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
  }

  test("q_compact_files rewrites 64 fragments into few size-targeted files") {
    Registry.byName("q_compact_files").run(spark, TestSpark.sf).collect()
    val root = sources.Formats.scratchRoot("compact")
    val frag = parquetFiles(s"$root/fragmented")
    val comp = parquetFiles(s"$root/compacted")
    assert(frag.length === 64)
    assert(comp.nonEmpty && comp.length < frag.length)
    // sizing rule: ceil(input bytes / 4 MiB), min 1
    val expect = math.max(1L, (frag.map(_.length).sum + (4L << 20) - 1) / (4L << 20))
    assert(comp.length === expect.toInt)
  }

  test("q_zorder_layout writes files with disjoint z ranges (skippable layout)") {
    Registry.byName("q_zorder_layout").run(spark, TestSpark.sf).collect()
    val files = parquetFiles(sources.Formats.scratchRoot("zorder"))
    assert(files.length > 1, "need multiple files for skipping to mean anything")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("zval")), max(col("zval"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlapping z ranges")
      case _ =>
    }
  }

  /** Independent imperative replay of the textbook xy2d Hilbert
    * transform (the operator builds the curve from generated SQL
    * strings — this is the C-loop form, sharing no code with it). */
  private def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn; var y = yIn; var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("q_hilbert_layout: the generated SQL curve equals textbook xy2d") {
    Registry.byName("q_hilbert_layout").run(spark, TestSpark.sf).collect()
    val laid = spark.read.parquet(sources.Formats.scratchRoot("hilbert"))
      .select("l_partkey", "l_suppkey", "hval").collect()
    assert(laid.nonEmpty)
    laid.foreach { r =>
      val expect = xy2d(r.getLong(0) & 65535L, r.getLong(1) & 65535L)
      assert(r.getLong(2) === expect,
        s"(${r.getLong(0)}, ${r.getLong(1)}) -> ${r.getLong(2)}, want $expect")
    }
    // the curve is a bijection: distinct (x, y) cells -> distinct indexes
    val pairs = laid.map(r => (r.getLong(0) & 65535L, r.getLong(1) & 65535L))
      .distinct.length
    assert(laid.map(_.getLong(2)).distinct.length === pairs)
  }

  test("q_hilbert_layout writes files with disjoint index ranges") {
    Registry.byName("q_hilbert_layout").run(spark, TestSpark.sf).collect()
    val files = parquetFiles(sources.Formats.scratchRoot("hilbert"))
    assert(files.length > 1)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("hval")), max(col("hval"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, "overlapping ranges")
      case _ =>
    }
  }

  test("q_scd2_versions: intervals chain per customer with one open current row") {
    val rows = Registry.byName("q_scd2_versions").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("version"),
        r.getAs[Any]("valid_from"),
        Option(r.getAs[Any]("valid_to")),
        r.getAs[Boolean]("is_current")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.length).toSeq)
      // each version's valid_to equals the next version's valid_from
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, _, to, _), (_, _, from2, _, _)) =>
          assert(to.contains(from2))
        case _ =>
      }
      // exactly the last row is current (open-ended)
      assert(sorted.count(_._5) === 1)
      assert(sorted.last._5 && sorted.last._4.isEmpty)
    }
  }

  test("emb_rand_proj equals a local md5-hyperplane replay") {
    def h31(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2147483647L
    }
    val vecs = Tables.load(spark, TestSpark.sf, "embeddings")
      .filter(col("vec_id") < 5).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = Registry.byName("emb_rand_proj").run(spark, TestSpark.sf)
      .filter(col("vec_id") < 5).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("j")) -> r.getAs[Double]("proj"))
      .toMap
    vecs.foreach { case (id, emb) =>
      for (j <- 0 until 8) {
        var acc = 0.0
        emb.zipWithIndex.foreach { case (v, k) =>
          acc += v.toDouble * ((h31(s"${j}_$k") % 2001 - 1000).toDouble / 1000.0)
        }
        assert(got((id, j.toLong)) === acc)
      }
    }
  }

  test("q_corrupt_salvage quarantines exactly the planted corruption") {
    // round-11 verdict task #4 done-criterion: the quarantine counts
    // must equal what the operator itself planted — 7 malformed JSON
    // lines in shard 1, the whole of shard 3 behind a truncated
    // parquet footer — and nothing else may be lost.
    val rows = Registry.byName("q_corrupt_salvage").run(spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    val expected = Tables.loadEvents(spark, TestSpark.sf)
      .groupBy(pmod(col("event_id"), lit(4)).cast("long").as("shard"))
      .count().collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[Long]("count")).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L))
    Seq(0L, 2L).foreach { sh =>
      assert(rows(sh).getAs[String]("error_class") === "clean")
      assert(rows(sh).getAs[Long]("n_quarantined") === 0L)
      assert(rows(sh).getAs[Long]("n_salvaged") === expected(sh))
    }
    assert(rows(1L).getAs[String]("error_class") === "malformed_rows")
    assert(rows(1L).getAs[Long]("n_quarantined") === 7L)
    assert(rows(1L).getAs[Long]("n_salvaged") === expected(1L))
    assert(rows(3L).getAs[String]("error_class") === "corrupt_file")
    assert(rows(3L).getAs[Long]("n_quarantined") === expected(3L))
    assert(rows(3L).getAs[Long]("n_salvaged") === 0L)
  }

  test("stream_topk equals the batch per-hour top-3") {
    val streamed = Registry.byName("stream_topk").run(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("hour").orderBy(col("n").desc, col("event_type").asc)
    val batch = Tables.load(spark, TestSpark.sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("hour", "rk", "event_type", "n")
      .orderBy("hour", "rk")
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
