package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CosineSimilarity

/** Spherical k-means on planted orthogonal direction groups. */
class ClusteringSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 200 vectors in 4 orthogonal direction groups (group = vec_id / 50, so
  // the seed ids 0/50/100/150 are one seed per group). Each vector is its
  // group axis plus a small distinct-dimension jitter — cosine to its own
  // group axis ~0.995+, to any other axis ~0.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_clu").toString
    val vecs = (0L until 200L).map { id =>
      val g = (id / 50).toInt
      val v = Array.fill(64)(0.0f)
      v(g) = 1.0f
      v(8 + (id % 8).toInt) = 0.1f
      (id, v.toSeq, g)
    }.toDF("vec_id", "embedding", "label")
    vecs.coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("emb_kmeans recovers the planted groups with seed-aligned cluster ids") {
    val out = Registry.byName("emb_kmeans").run(spark, dir).collect()
    assert(out.length === 200)
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("cluster") === id / 50,
        s"vec $id assigned to ${r.getAs[Long]("cluster")}")
      assert(r.getAs[Double]("cos") > 0.9)
    }
  }

  test("sim_semdedup keeps exactly one representative per planted near-dup cluster") {
    // within a planted group every pair has cosine ~0.99 (> 0.92), so the
    // keep rule must retain only the min vec_id of each cluster
    val out = Registry.byName("sim_semdedup").run(spark, dir).collect()
    assert(out.length === 200)
    val kept = out.filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("vec_id")).toSet
    assert(kept === Set(0L, 50L, 100L, 150L), s"kept $kept")
  }

  test("silhouette separates the planted orthogonal groups near-perfectly") {
    val out = Registry.byName("emb_silhouette").run(spark, dir).collect()
    // one row per planted cluster, every vector accounted for
    assert(out.map(_.getAs[Long]("cluster")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n")).sum === 200L)
    out.foreach { r =>
      // orthogonal groups: own-centroid cosine ~1, best-other ~0 ->
      // s = (cos1-cos2)/(1-cos2) close to 1; and the assignment-argmax
      // construction bounds s in [0, 1] exactly
      assert(r.getAs[Long]("s_min_q") >= 0L)
      assert(r.getAs[Long]("s_max_q") <= 1000000000L)
      assert(r.getAs[Double]("mean_sil") > 0.9,
        s"cluster ${r.getAs[Long]("cluster")} mean_sil ${r.getAs[Double]("mean_sil")}")
      // the mean is the quantized sum with the canonical division order
      assert(r.getAs[Double]("mean_sil") ===
        r.getAs[Long]("s_sum_q").toDouble / r.getAs[Long]("n") / 1e9)
    }
  }

  test("sample_kcenter spreads its first picks across the planted groups") {
    val out = Registry.byName("sample_kcenter").run(spark, dir).collect()
    assert(out.length === 200) // every vector assigned to a center
    val centers = out.map(r =>
      (r.getAs[Long]("c_rank"), r.getAs[Long]("c_id"))).distinct.sortBy(_._1)
    assert(centers.length === 8, s"centers $centers")
    assert(centers.head === ((1L, 0L)), "seed must be the min vec_id")
    // greedy farthest-point on 4 orthogonal groups MUST cover all 4
    // groups within the first 4 picks (any uncovered group's axis is at
    // cosine ~0 from every selected center, i.e. farthest)
    val firstFourGroups = centers.take(4).map(_._2 / 50).toSet
    assert(firstFourGroups === Set(0L, 1L, 2L, 3L), s"picks $centers")
    // and every vector assigns to a center from its OWN group (within-
    // group cosine ~0.99+ vs cross-group ~0)
    out.foreach { r =>
      assert(r.getAs[Long]("c_id") / 50 === r.getAs[Long]("vec_id") / 50,
        s"vec ${r.getAs[Long]("vec_id")} assigned cross-group")
      assert(r.getAs[Double]("cos") > 0.9)
    }
  }

  test("CosineSimilarity accepts double-array centroids and matches the float path") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5, 1.0, -2.0)))
      .toDF("f", "d")
    val got = df.select(
      CosineSimilarity(spark, col("f"), col("d")).as("c")).collect()(0).getDouble(0)
    val exp = {
      val (a, b) = (Array(1.0, 2.0, 3.0), Array(0.5, 1.0, -2.0))
      var (dot, na, nb) = (0.0, 0.0, 0.0)
      for (i <- 0 until 3) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / math.sqrt(na * nb)
    }
    assert(got === exp)
  }

  test("dbscan roles replay the density rules over the near-dup relation") {
    val rows = Registry.byName("emb_dbscan").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_neighbors"),
        r.getAs[String]("role"),
        Option(r.get(r.fieldIndex("cluster_id"))).map(_.asInstanceOf[Long])))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).toSet.subsetOf(Set("core", "border", "noise")))
    // all three roles must exist or the fixture is degenerate
    assert(rows.map(_._3).toSet === Set("core", "border", "noise"))
    // local replay from the same epsilon-neighbor relation
    val pairs = graft.operators.Similarity.nearDupPairs(spark, TestSpark.sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val core = deg.filter(_._2 >= 2L).keySet
    // union-find over core-core edges
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      if (core(a) && core(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val coreCluster = core.map(c => c -> find(c)).toMap
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (v, n, role, cl) =>
      assert(n === deg.getOrElse(v, 0L), s"degree of $v")
      if (core(v)) {
        assert(role === "core", s"$v should be core")
        assert(cl.contains(coreCluster(v)), s"core $v cluster")
      } else {
        val coreNbrs = nbrs.getOrElse(v, Set.empty).filter(core)
        if (coreNbrs.nonEmpty) {
          assert(role === "border", s"$v should be border")
          assert(cl.contains(coreNbrs.map(coreCluster).min),
            s"border $v cluster")
        } else {
          assert(role === "noise", s"$v should be noise")
          assert(cl.isEmpty, s"noise $v has a cluster")
        }
      }
    }
  }
}
