package graft

import org.apache.spark.sql.SparkSession

/** Empirical wall-vs-sf growth slopes for the flagship operators.
  *
  * SCALE.md argues scale safety from plan SHAPES (bucketed equi-joins,
  * map-side partials, no all-pairs); this harness measures it: each
  * flagship runs at sf0.001 / sf0.01 / sf0.1 in ONE JVM and the
  * empirical growth exponent e = log10(t_big / t_small) per decade is
  * reported next to the claimed complexity. A claimed-linear operator
  * trending quadratic (e -> 2 on the 0.01->0.1 decade) is a scale bug
  * the plan read missed; e well under 1 means fixed per-query overhead
  * (scheduling, planning) still dominates — fine at these SFs.
  *
  * The 0.01->0.1 decade is the signal (both points big enough that
  * fixed overhead is minor); 0.001->0.01 is printed for completeness
  * but dominated by constant costs. Same measurement discipline as
  * Bench: warm-up pass at sf0.01 first (C2 tiering), best-of-N per
  * (query, sf), persisted-RDD cleanup between runs, tmpfs shuffle dirs.
  *
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BEST_OF (default 2),
  * SPARK_GRAFT_ONLY (comma-separated subset).
  */
object GrowthBench {

  /** Flagship set: name -> claimed growth shape (from SCALE.md). */
  private val flagships: Seq[(String, String)] = Seq(
    "q1_agg" -> "linear (scan + 6-group agg)",
    "dedup_exact" -> "linear (hash agg on digest)",
    "dedup_minhash" -> "~linear (banded LSH equi-join)",
    "dedup_simhash" -> "~linear (chunk-pigeonhole equi-join)",
    "dedup_ngram_jaccard" -> "~linear (inverted index, DF-capped)",
    "dedup_tfidf_nn" -> "superlinear in collisions (sum df^2)",
    "dedup_cluster" -> "~linear x log(diameter) (pointer doubling)",
    "sim_ann_lsh" -> "~linear (bucket join, fixed queries)",
    "sim_ann_ivf" -> "superlinear by design: N^1.5 coarse-quantizer assignment (k=sqrt(N) lists, r12) + ~linear probed-cell serve; the served row isolates the serve term",
    "sim_topk_bruteforce" -> "linear (fixed 10-query broadcast)",
    "graph_pagerank" -> "~linear x iters (equi-join per iter)",
    "graph_triangles" -> "edges^1.5 worst case (oriented wedges)",
    "text_bm25" -> "~linear (per-doc terms, DF-capped)",
    "text_bpe_encode" -> "~linear (map-only encode after train)",
    "graph_neighbor_sim" -> "sum deg^2 (wedge join, DF-capped)",
    "graph_neighbor_sim_capped" -> "~linear (per-node F=8 capped wedge join)",
    "mm_phash_neardup_wide" -> "~linear x collisions (15-bit chunk buckets)",
    "graph_bfs_2hop" -> "superlinear: sum |N2(v)| wedge-mass reach set (reporting class)",
    "graph_bfs_2hop_capped" -> "~linear (per-node F=4 capped expansion)",
    "q_peak_concurrency" -> "linear (day-partitioned prefix sum)",
    "text_pmi" -> "~linear (bigram counts + top-k)",
    "sample_dsir" -> "linear (64-bucket stats + map-only gate)",
    "graph_modularity" -> "~linear x LPA iters (equi-join per round)",
    "mm_keyframe" -> "linear (one doc_id exchange, two windows)",
    "dedup_prefix_filter" -> "sum prefix-df^2 (reporting class: unmeasurable at SATURATED-vocab sf10; on the r11 Heaps corpus it completes sf10 at e=0.47)",
    "dedup_prefix_filter_capped" -> "~linear (V x cap^2 sampled prefix-posting join)",
    "graph_hits" -> "~linear x iters (equi-join per half-step)",
    "mm_cdc_match" -> "~linear x chunk collisions (DF-capped chunk join)",
    "text_winnowing" -> "linear x w (gram stream, one rank window)",
    "emb_silhouette" -> "~linear x (iters x k) (broadcast-centroid scoring)",
    "q_roc_auc" -> "~linear (per-score counts + bucket-grain prefix)",
    "q_decile_lift" -> "~linear (user agg + score-grain prefix)",
    "graph_conductance" -> "~linear x LPA iters (shares lpaLabels rounds)",
    "q_rfm_segmentation" -> "~linear (user agg + 3 value-grain prefixes)",
    "q_time_to_convert" -> "~linear (user join + delta-grain prefix)",
    "q_dau_mau" -> "~linear x 28 (bounded range-join fan-out)",
    "q_ship_latency_aging" -> "~linear (per-order min + one join)",
    // round-8: the remaining top-10-heaviest, added for the sf0.1->sf1
    // decade measurement (round-7 verdict task #1)
    "dedup_cluster_multi" -> "~linear x log(diameter) (multi-sig union + pointer doubling)",
    "dedup_eval" -> "~linear (candidate join + bounded truth join)",
    "dedup_lsh_tune" -> "~linear x bands (shared shingle frame, banding self-joins)",
    "graph_labelprop" -> "~linear x LPA rounds (equi-join per round)",
    "dedup_weighting" -> "~linear (cluster sizes + one doc join)",
    "mm_phash_cluster" -> "~linear x collisions (phash chunk buckets + CC)",
    // dedup_cluster_multi leg isolation (the r8 e=1.99 diagnosis)
    "dedup_simhash_wide_pairs" -> "~linear (4x15-bit chunk pigeonhole)",
    "sim_embed_neardup" -> "~linear x collisions (banded emb-LSH + verify)",
    // round-8 additions
    "dedup_minhash_served" -> "~linear (batch bands + index probe + verify)",
    "emb_ood_score" -> "~linear (two (label,dim) aggs + one rank window)",
    "q_iqr_outliers" -> "~linear (value-grain counts + bounded prefix)",
    "sim_ann_ivf_index_stats" -> "~linear (one count over the saved lists)",
    // round-9: remaining benched queries > 2 s at sf0.1 with no sf1
    // point (VERDICT task 4) + the new capped tfidf pipeline form
    "graph_random_walk" -> "~linear x steps (frontier equi-join + argmin window)",
    "graph_ppr" -> "~linear x iters (equi-join per iter, seed base term)",
    "q_fmt_xml" -> "linear (format round-trip, map-only parse)",
    "text_ngram_novelty" -> "~linear (gram DF join, DF-capped)",
    "dedup_tfidf_nn_capped" -> "~linear (V x cap^2 sampled-posting join)",
    // round-9: drift-adjudication subject (r8 official-sweep delta)
    "dedup_cluster_sizes" -> "~linear x log(diameter) (shares dedup_cluster's CC)",
    // round-9 second wave
    "sim_ann_graph_search" -> "~linear (band-capped knn build; serving Q x B x K bounded)",
    "sample_priority" -> "linear (map + distributed top-k, no global sort)",
    "q_welch_ttest" -> "linear (one map-side-combined hash aggregate)",
    // round-9 later waves
    "mm_crossmodal_audit" -> "~linear (two capped pair generators + one pair-grain outer join)",
    "q_incr_agg_maintain" -> "linear (three hash aggregates, group-grain state)",
    "sample_neyman" -> "~linear (stratum aggregate + per-stratum rank window)",
    // round-10: the two r9 heavies without a decade row (VERDICT task 4).
    // sim_ann_ivf_refresh pays two corpus writes + two full IVF builds
    // per run (see Similarity.scala); the builds are CORPUS-PROPORTIONAL
    // (measured e≈1.03 on the 0.1→1 decade — SCALE.md round-10 section),
    // so the row measures the whole build/refresh/serve lifecycle, and
    // the served row below isolates the serve-only term.
    "sim_ann_ivf_refresh" -> "~linear: 2x(corpus-proportional build) + serve",
    // serve-only comparator for the refresh build/serve split: same
    // probe path, index already persisted — refresh minus served
    // isolates the two corpus writes + two index builds
    "sim_ann_ivf_served" -> "~linear (probe persisted lists, serve-only)",
    "graph_assortativity" -> "~linear (rides jaccardPairs + node-grain degree joins)",
    // round-10 waves: every new benched operator gets its 0.1->1 row
    // the round it ships (house bar: no benched query without a decade)
    "sample_kcenter" -> "~linear x k (map-only scoring vs broadcast centers)",
    "q_dp_release" -> "linear (one hash agg + map-only CASE-ladder noise)",
    "sample_token_budget" -> "~linear (k-row allocation + source-keyed cumsum window)",
    "q_l_diversity" -> "linear (one count_distinct agg, QI-domain-bounded classes)",
    "sim_ann_filtered" -> "~linear (pre-filtered inverted lists, broadcast queries)",
    "q_snapshot_diff" -> "linear (one key-keyed full-outer join + 4-row agg)",
    "q_attribution" -> "linear (one user-keyed window + channel agg)",
    "q_clamped_balance" -> "linear (two stacked windows, one user shuffle)",
    "emb_dbscan" -> "~linear (banded candidates + core-sliver CC)",
    "q_bootstrap_ci" -> "linear x B (map-only 32x expansion + one hash agg)",
    "emb_drift" -> "linear (two dim-grain aggs, label-grain fold)",
    // round-11 wave (Heaps-corpus science + scorecards)
    "dedup_cap_recall" -> "exact leg: sum prefix-df^2; capped leg V x cap^2 (scorecard over both; bench=false r12 — run via SPARK_GRAFT_ONLY on Heaps corpora only, the exact leg dies on saturated vocab)",
    "dedup_planted_recall" -> "~linear (banded LSH candidates + in-band truth join)",
    "text_heaps_curve" -> "~linear (one vocab-grain agg + 8-row broadcast spine)",
    "text_zipf_curve" -> "~linear (vocab-grain agg + distributed top-4096)",
    // round-12 wave: the clustered-embeddings corpus re-measurements
    // (verdict task #1) + the round's new operators
    "sim_planted_recall" -> "~N^1.5 x 0.1: arn<=2 assignment restricted to the ~10% truth rows; bucket/truth probes ~linear",
    "sim_ann_graph_served" -> "~linear serve-only (persisted edges; Q x B x K bounded navigation)",
    "dedup_recall_curve" -> "~linear (banded candidates + linear truth verify, decile agg)",
    "sim_ann_ivf_nprobe2" -> "superlinear by design: shares the N^1.5 assignment; 2 probed cells serve",
    "sim_ivf_tradeoff" -> "superlinear by design: shares the N^1.5 assignment; exact leg + both probe legs ~linear",
    "sim_ann_recall" -> "~linear (brute-force leg + bucket leg, fixed queries)",
    "emb_kmeans" -> "~linear x (iters x k) (broadcast-centroid scoring)",
    "sim_semdedup" -> "~linear x within-cluster density (banded candidates + verify)",
    // round-12: viral-clique stress (verdict task #2) — the pair forms
    // are clique-quadratic BY CORRECTNESS (the emitted pair relation is
    // ~m^2/2 of the largest family); cluster forms must stay ~linear
    "dedup_minhash_pairs" -> "banded LSH + verify: output ~ m^2 of the largest dup family (clique-quadratic by correctness)",
    "dedup_minhash_bbit" -> "packed-signature bands + rational re-estimate: output ~ m^2 of the largest family",
    // round-13 wave: the capped text-banding generator (verdict task
    // #2) and the declarative-hamming pipeline (task #7)
    "dedup_minhash_pairs_capped" -> "~linear (viral band buckets dropped: candidates ~ N x cap, never m^2)",
    "dedup_simhash_declarative" -> "~linear x log(diameter) (rule-rewritten chunk equi-joins + pointer doubling)",
    "pipeline_viral_clean" -> "~linear x stages (star-capped banding: viral buckets emit m-1 edges, never C(m,2))")

  /** sf dirs to measure, smallest first. Overridable so the 0.1->1
    * decade can run on generated same-seed corpora (round-7 verdict
    * task #1: the 0.01->0.1 fits sit inside the JVM overhead floor,
    * which biases exponents DOWN; one more decade takes them out). */
  private def sfDirs: Seq[String] =
    sys.env.get("SPARK_GRAFT_SF_DIRS")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq(
        "/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))

  private def clearPersisted(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val bestOf = sys.env.getOrElse("SPARK_GRAFT_BEST_OF", "2").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-growth")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tmpfs shuffle dirs are the right default up to ~sf1; an sf10
      // pass spills tens of GB and tmpfs IS physical memory — the r10
      // first sf1→sf10 attempt was OOM-killed (rc=137) with 80 GB of
      // /dev/shm spill. Big-corpus runs override to a disk path.
      .config("spark.local.dir", sys.env.getOrElse(
        "SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft_spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defs = flagships
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (n, claim) => (Registry.byName(n), claim) }

    // C2 warm-up (see Bench.scala: sf0.001 never tiers the generated
    // loops past the interpreter; an un-warmed first sf0.1 pass burns
    // 30x steady-state CPU and would fake a superlinear slope).
    // Overridable: a 0.1->1 run warms at its own smallest dir so the
    // AQE plan shapes it compiles are the ones the measured passes run.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.01")
    defs.foreach { case (d, _) =>
      try d.run(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[growth] WARMUP FAILED ${d.name}: $e")
      }
      clearPersisted(spark)
    }

    // per (query, sf): best of N walls
    val wall = collection.mutable.Map[(String, String), Double]()
    for (pass <- 1 to bestOf; sf <- sfDirs; (d, _) <- defs) {
      val (sec, ok) = Bench.runOne(spark, d, sf)
      clearPersisted(spark)
      System.err.println(
        f"[growth] p$pass ${sf.split('/').last} ${d.name}: $sec%.2f s ok=$ok")
      if (ok) {
        val k = (d.name, sf)
        if (!wall.contains(k) || sec < wall(k)) wall(k) = sec
      }
    }

    def slope(n: String, a: String, b: String): Option[Double] =
      for (ta <- wall.get((n, a)); tb <- wall.get((n, b)))
        yield math.log10(tb / ta)

    // dynamic header: one wall column per sf dir, one exponent column
    // per consecutive decade; the LAST decade is the verdict signal
    // (both points largest -> least overhead-floor bias)
    val labels = sfDirs.map(_.split('/').last)
    // filter(size == 2): a single-dir run (isolated drift adjudication)
    // has no decade — sliding(2) then yields one 1-element window
    val pairCols = labels.sliding(2).filter(_.size == 2)
      .map(p => s"e(${p(0)}->${p(1)})").toSeq
    println("| query | " + labels.map(_ + " s").mkString(" | ") + " | " +
      pairCols.mkString(" | ") + " | claimed shape | verdict |")
    println("|" + Seq.fill(labels.size + pairCols.size + 3)("---").mkString("|") + "|")
    defs.foreach { case (d, claim) =>
      val t = sfDirs.map(sf => wall.get((d.name, sf)))
      val es = sfDirs.sliding(2).filter(_.size == 2)
        .map(p => slope(d.name, p(0), p(1))).toSeq
      def f(o: Option[Double]) = o.map(v => f"$v%.2f").getOrElse("FAIL")
      // verdict keys off the LAST decade: <=1.3 rides the claimed
      // near-linear shapes (AQE/scheduling overhead amortizes, slope
      // can even exceed 1 slightly as spill/shuffle kick in); the only
      // operators allowed past 1.3 are the ones whose claim says so
      val verdict = es.lastOption.flatten match {
        case None if es.isEmpty => // single-dir adjudication run
          if (t.exists(_.nonEmpty)) "n/a (single dir)" else "FAILED"
        case None => "FAILED"
        case Some(e) if e <= 1.3 => "linear-ish: ok"
        case Some(e) if claim.contains("superlinear") ||
          claim.contains("^1.5") => f"$e%.2f, within claimed shape"
        case Some(e) => f"INVESTIGATE: $e%.2f vs claimed $claim"
      }
      println(s"| ${d.name} | " + t.map(f).mkString(" | ") + " | " +
        es.map(f).mkString(" | ") + s" | $claim | $verdict |")
    }
    spark.stop()
  }
}
