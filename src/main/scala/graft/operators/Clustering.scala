package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}
import graft.functions.EngineFns._
import graft.functions.CosineSimilarity

/** Corpus clustering over the `embeddings` table — the curation step that
  * groups a training corpus into semantic clusters (topic balancing,
  * SemDeDup-style cluster-then-dedup, per-cluster sampling all start
  * here).
  *
  * `emb_kmeans` is spherical k-means (assign = argmax cosine) done
  * Spark-shaped: each Lloyd iteration is ONE pass over the corpus — a
  * broadcast of k centroid literals, a codegen cosine per (vector,
  * centroid), a row_number argmax, and a (cluster, dim)-keyed aggregation
  * of 2^18-quantized INTEGER components summed in DECIMAL(38,0). Exact in
  * any engine: float summation order never enters (same recipe as
  * emb_pca_power). Only k x 64 totals + k counts return to the driver
  * (bounded — never corpus-sized), are divided with one canonical op
  * order, and feed the next iteration as plan-time literals.
  *
  * At 100 TB the shape is unchanged: centroids are always a broadcast
  * (k x dim doubles), assignment is map-only over the corpus, and the
  * update is one partial/final hash aggregate per iteration — the
  * textbook scalable k-means loop. Lineage is bounded because each
  * iteration reads the SAME localCheckpoint'ed corpus scan.
  */
object Clustering {

  private val K = 4
  private val Dim = 64
  private val Iters = 2 // centroid updates; assignments run Iters + 1 times
  private val Q = 262144.0 // 2^18 component quantization (emb_pca_power's)
  private val SeedStride = 50 // seeds vec_id 0, 50, 100, 150 exist at every SF
  private val SemThreshold = 0.92 // sim_semdedup keep-rule cosine threshold
  private val PqM = 8 // PQ subspaces
  private val PqSubDim = Dim / PqM
  private val PqK = K // PQ codes per subspace — the k-means seed set
  private val PqTopK = 5 // neighbors returned per query by the ADC search
  private val PqNumQueries = 10 // query set: vec_id < 10 (every SF has them)
  // emb_dbscan: a point is CORE with >= this many epsilon-neighbors in
  // the banded near-dup relation. 2 keeps the role split (core/border/
  // noise) populated at every SF of this corpus; production tunes it
  // with epsilon as usual. `final val` — interpolated into the oracle
  // string, which `defs` captures at object init (the round-7 gotcha).
  private final val DbscanMinPts = 2
  // k-center coreset size: 8 centers cover the 4-cluster synthetic
  // embedding space with visible within-cluster diversity; production
  // sets k to the annotation/distillation budget. DECLARED ABOVE defs:
  // QueryDef's Some(KcenterOracleSql) forces the oracle string during
  // defs initialization (the BandBucketCap lesson).
  private val KcK = 8

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Argmax-cosine cluster assignment of every vector against the given
    * centroid literals: (vec_id, embedding, c, cos) with c the 0-based
    * winning centroid (ties broken by lowest c — mirrored in the oracle's
    * row_number ordering). */
  private def assign(
      s: SparkSession, e: DataFrame, cents: IndexedSeq[Array[Double]]): DataFrame = {
    val scored = e.select(
      col("vec_id"), col("embedding"),
      posexplode(array(cents.map(c =>
        CosineSimilarity(s, col("embedding"),
          array(c.map(lit): _*))): _*)).as(Seq("c", "cos")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("c"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("c"), col("cos"))
  }

  /** One Lloyd update: quantized-integer per-(cluster, dim) means.
    * Returns the k new centroids; a cluster that lost every member keeps
    * its previous centroid (deterministic, documented). */
  private def update(
      s: SparkSession, e: DataFrame,
      cents: IndexedSeq[Array[Double]]): IndexedSeq[Array[Double]] = {
    val rows = assign(s, e, cents)
      .select(col("c"), posexplode(col("embedding")).as(Seq("k", "x")))
      .select(col("c"), col("k"),
        floor(col("x").cast("double") * Q + 0.5).cast("long")
          .cast("decimal(38,0)").as("xi"))
      .groupBy("c", "k")
      .agg(sum(col("xi")).as("sx"), count(lit(1)).as("cnt"))
      .collect()
    val next = Array.tabulate(K)(c => cents(c).clone())
    rows.foreach { r =>
      val (c, k) = (r.getInt(0), r.getInt(1))
      // canonical op order: decimal-exact sum -> double, / count, / Q —
      // mirrored token-for-token in the oracle SQL
      next(c)(k) = r.getDecimal(2).doubleValue() / r.getLong(3) / Q
    }
    next.toIndexedSeq
  }

  val defs: Seq[QueryDef] = Seq(

    // Spherical k-means, k=4, 2 quantized-exact Lloyd updates; output is
    // the final per-vector assignment with its cosine to the winning
    // centroid. The oracle replays seeds -> assign -> update -> assign ->
    // update -> assign in chained CTEs, bit-for-bit.
    QueryDef(
      "emb_kmeans",
      (s, dir) => {
        val e = emb(s, dir).select("vec_id", "embedding")
          .localCheckpoint() // Iters + 1 passes re-read the corpus; scan once
        var cents: IndexedSeq[Array[Double]] =
          e.filter(col("vec_id") % SeedStride === 0 &&
              col("vec_id") < SeedStride.toLong * K)
            .orderBy("vec_id").collect()
            .map(r => r.getSeq[Float](1).map(_.toDouble).toArray).toIndexedSeq
        // empty corpus -> no seeds: clustering of nothing is the empty
        // assignment (degenerate-corpus sweep, r8) — the driver-side
        // centroid arrays would otherwise index out of bounds. limit(0)
        // so the branch is a typed empty relation even if e were
        // nonempty while the seed predicate matched nothing (r9 advice,
        // same hardening as the sim_topk_custom_op guard).
        if (cents.isEmpty)
          e.limit(0).select(col("vec_id"), lit(0L).as("cluster"),
            lit(0.0).as("cos"))
        else {
          for (_ <- 0 until Iters) cents = update(s, e, cents)
          assign(s, e, cents)
            .select(col("vec_id"), col("c").cast("long").as("cluster"), col("cos"))
            .orderBy("vec_id")
        }
      },
      Some(KmeansOracleSql)),

    // SemDeDup (Abbas et al.): semantic dedup INSIDE k-means clusters —
    // run the same Lloyd loop, then compare embeddings only within a
    // cluster and drop every vector that has a smaller-id neighbor above
    // the cosine threshold. The cluster partitioning is what makes the
    // pairwise step tractable: candidates are cluster-local, so the join
    // is an equi-join on the cluster id, never corpus x corpus. k is 4
    // here to keep the oracle corpus meaningful; at 100 TB k scales
    // ~sqrt(N) so per-cluster populations stay bounded and the
    // within-cluster quadratic work is constant per cluster — the
    // published SemDeDup recipe. Oracle replays the full clustering
    // chain plus the NOT EXISTS keep rule, bit-for-bit.
    QueryDef(
      "sim_semdedup",
      (s, dir) => {
        val e = emb(s, dir).select("vec_id", "embedding").localCheckpoint()
        var cents: IndexedSeq[Array[Double]] =
          e.filter(col("vec_id") % SeedStride === 0 &&
              col("vec_id") < SeedStride.toLong * K)
            .orderBy("vec_id").collect()
            .map(r => r.getSeq[Float](1).map(_.toDouble).toArray).toIndexedSeq
        // empty corpus -> no seeds: empty result (degenerate sweep, r8;
        // limit(0) hardening r9)
        if (cents.isEmpty)
          e.limit(0).select(col("vec_id"), lit(0L).as("cluster"),
            lit(true).as("keep"))
        else {
          for (_ <- 0 until Iters) cents = update(s, e, cents)
          val a = assign(s, e, cents)
            .select(col("c"), col("vec_id"), col("embedding"))
          val dropped = a.as("x").join(a.as("y"),
              col("x.c") === col("y.c") && col("y.vec_id") < col("x.vec_id"))
            .filter(CosineSimilarity(s,
              col("x.embedding"), col("y.embedding")) >= SemThreshold)
            .select(col("x.vec_id")).distinct()
            .withColumn("drop", lit(true))
          a.join(dropped, Seq("vec_id"), "left")
            .select(col("vec_id"), col("c").cast("long").as("cluster"),
              coalesce(!col("drop"), lit(true)).as("keep"))
            .orderBy("vec_id")
        }
      },
      Some(SemDedupOracleSql)),

    // Silhouette scorecard over the k-means clustering — the cluster-
    // quality gate run before trusting a clustering for SemDeDup or
    // topic balancing: per cluster, how cleanly its members separate
    // from the nearest other cluster. Uses the CENTROID silhouette (a =
    // distance to own centroid, b = distance to the best other
    // centroid — the O(N·k) form that scales; the O(N²) pairwise
    // silhouette is exactly what a 100 TB corpus cannot run), in cosine
    // distance: since assignment is argmax cosine, a = 1−cos₁ ≤
    // b = 1−cos₂ always, so s = (b−a)/max(a,b) collapses to
    // (cos₁−cos₂)/(1−cos₂) — written with that ONE op order on both
    // engines. Per-vector s is quantized to integer nanos so the
    // cluster means are exact-integer sums with one closing division
    // (the house rule for order-free aggregation of doubles). Shape:
    // the same Lloyd loop as emb_kmeans (broadcast centroids, map-only
    // scoring, one vec_id window), then one k-row aggregate.
    QueryDef(
      "emb_silhouette",
      (s, dir) => {
        val e = emb(s, dir).select("vec_id", "embedding").localCheckpoint()
        var cents: IndexedSeq[Array[Double]] =
          e.filter(col("vec_id") % SeedStride === 0 &&
              col("vec_id") < SeedStride.toLong * K)
            .orderBy("vec_id").collect()
            .map(r => r.getSeq[Float](1).map(_.toDouble).toArray).toIndexedSeq
        // empty corpus -> no seeds: empty scorecard (degenerate sweep,
        // r8; limit(0) hardening r9)
        if (cents.isEmpty)
          e.limit(0).select(col("vec_id").as("cluster"), lit(0L).as("n"),
            lit(0L).as("s_sum_q"), lit(0L).as("s_min_q"),
            lit(0L).as("s_max_q"), lit(0.0).as("mean_sil"))
        else {
        for (_ <- 0 until Iters) cents = update(s, e, cents)
        val scored = e.select(
          col("vec_id"),
          posexplode(array(cents.map(c =>
            CosineSimilarity(s, col("embedding"),
              array(c.map(lit): _*))): _*)).as(Seq("c", "cos")))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("c"))
        val piv = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .groupBy("vec_id").agg(
            max(when(col("rn") === 1, col("c"))).as("cluster"),
            max(when(col("rn") === 1, col("cos"))).as("cos1"),
            max(when(col("rn") === 2, col("cos"))).as("cos2"))
        piv
          // nullif: identical vectors can make cos2 exactly 1.0 (the
          // all-dup skew corpus) — NULL silhouette matches DuckDB's /0
          // where Spark-4 ANSI would throw (degenerate sweep, r8)
          .withColumn("s_q",
            floor(((col("cos1") - col("cos2")) /
              nullif(lit(1.0) - col("cos2"), lit(0.0)))
              * lit(1e9)).cast("long"))
          .groupBy("cluster").agg(
            count(lit(1)).as("n"),
            sum(col("s_q")).as("s_sum_q"),
            min(col("s_q")).as("s_min_q"),
            max(col("s_q")).as("s_max_q"))
          .select(col("cluster").cast("long").as("cluster"), col("n"),
            col("s_sum_q"), col("s_min_q"), col("s_max_q"),
            (col("s_sum_q").cast("double") / col("n") / lit(1e9))
              .as("mean_sil"))
          .orderBy("cluster")
        }
      },
      Some(SilhouetteOracleSql)),

    // Greedy k-center coreset selection (Gonzalez '85 farthest-point
    // traversal) — the data-PRUNING op: pick the 8 vectors that best
    // cover the embedding space (each pick is the point farthest from
    // every already-picked center, in cosine distance), then assign
    // every vector to its nearest center. This is the 2-approximation
    // to the k-center optimum and the standard seed for coreset /
    // diverse-subset selection before expensive annotation or
    // distillation. Shape: k−1 driver rounds, each ONE map-only corpus
    // pass — the ≤k selected centers ride along as broadcast double
    // literals (k×64 doubles of driver state, the emb_kmeans bound) and
    // the farthest point comes back via a distributed TakeOrdered(1)
    // argmin, never a sort or a corpus collect; the closing assignment
    // is one more broadcast-literal pass + one vec_id window. At 100 TB
    // the per-round cost is a scan — the textbook scalable greedy
    // k-center. Determinism: every cosine is the EngineFns fold (float→
    // double exact, one canonical op order), mins/maxes are exact on
    // doubles, and every pick and the assignment tie-break on vec_id;
    // the oracle replays the full greedy chain in generated CTEs
    // (MATERIALIZED per level — each level is referenced by the next
    // two, the task-2 lesson). Empty corpus → typed empty relation on
    // both engines; a corpus smaller than k simply exhausts early on
    // both (later oracle levels are empty, the engine loop stops).
    QueryDef(
      "sample_kcenter",
      (s, dir) => {
        val e = emb(s, dir).select("vec_id", "embedding").localCheckpoint()
        val first = e.orderBy("vec_id").limit(1).collect()
        if (first.isEmpty)
          e.limit(0).select(col("vec_id"), lit(0L).as("c_rank"),
            lit(0L).as("c_id"), lit(0.0).as("cos"))
        else {
          var sel = Vector((first(0).getLong(0),
            first(0).getSeq[Float](1).map(_.toDouble).toArray))
          var exhausted = false
          while (sel.size < KcK && !exhausted) {
            // farthest-from-selection = argmin over candidates of the
            // MAX cosine to any selected center (nested greatest ==
            // the oracle's max() aggregate — exact on doubles)
            val mc = sel.map { case (_, v) =>
              CosineSimilarity(s, col("embedding"),
                array(v.map(lit): _*)): Column
            }.reduce((a, b) => greatest(a, b))
            val cand = e.filter(!col("vec_id").isin(sel.map(_._1): _*))
              .select(col("vec_id"), col("embedding"), mc.as("mc"))
              .orderBy(col("mc").asc, col("vec_id").asc)
              .limit(1).collect() // 1-row distributed argmin
            if (cand.isEmpty) exhausted = true
            else sel :+= ((cand(0).getLong(0),
              cand(0).getSeq[Float](1).map(_.toDouble).toArray))
          }
          val scored = e.select(col("vec_id"), posexplode(array(
            sel.map { case (_, v) =>
              CosineSimilarity(s, col("embedding"),
                array(v.map(lit): _*)): Column
            }: _*)).as(Seq("r0", "cos")))
          val w = Window.partitionBy(col("vec_id"))
            .orderBy(col("cos").desc, col("r0").asc)
          scored.withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1)
            .select(col("vec_id"),
              (col("r0") + 1).cast("long").as("c_rank"),
              element_at(array(sel.map(x => lit(x._1)): _*),
                col("r0") + 1).as("c_id"),
              col("cos"))
            .orderBy("vec_id")
        }
      },
      Some(KcenterOracleSql))
  ) ++ pqDefs

  /** DuckDB replay of the greedy farthest-point chain — generated so the
    * pick count, the min-vec_id seed, the argmin tie-break, and the
    * closing assignment can never drift from the Spark loop. Every
    * level is MATERIALIZED: sel(t) is referenced by d(t+1) twice and by
    * sel(t+1), so inlining would re-run the whole prefix exponentially
    * (the same failure mode the round-10 oracle rewrite fixed for the
    * graph family). */
  private lazy val KcenterOracleSql: String = {
    val levels = (2 to KcK).map { t =>
      s"""d$t AS MATERIALIZED (
            SELECT e.vec_id,
              max(${cosineSql("e.embedding", "s.embedding")}) AS mc
            FROM embeddings e, sel${t - 1} s
            WHERE e.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
            GROUP BY e.vec_id),
          c$t AS MATERIALIZED (
            SELECT $t AS rk, e.vec_id, e.embedding
            FROM (SELECT vec_id,
                    row_number() OVER (ORDER BY mc ASC, vec_id ASC) AS rn
                  FROM d$t) w
            JOIN embeddings e ON e.vec_id = w.vec_id
            WHERE w.rn = 1),
          sel$t AS MATERIALIZED (
            SELECT rk, vec_id, embedding FROM sel${t - 1}
            UNION ALL SELECT rk, vec_id, embedding FROM c$t)"""
    }.mkString(",\n")
    s"""WITH sel1 AS MATERIALIZED (
          SELECT 1 AS rk, vec_id, embedding FROM embeddings
          WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        $levels,
        asg AS (
          SELECT e.vec_id, s.rk, s.vec_id AS c_id,
            ${cosineSql("e.embedding", "s.embedding")} AS cos,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosineSql("e.embedding", "s.embedding")} DESC,
                       s.rk ASC) AS rn
          FROM embeddings e, sel$KcK s)
        SELECT vec_id, CAST(rk AS BIGINT) AS c_rank, c_id, cos
        FROM asg WHERE rn = 1 ORDER BY vec_id"""
  }

  /** DuckDB replay of the full k-means loop (same seeds, same argmax
    * ordering, same quantized decimal sums, same division order) — built
    * programmatically so the Spark loop and the SQL can never disagree on
    * iteration count. cent<i> relations are (c, v: list ordered by k);
    * the chain ends at a$Iters, the final assignment. A cluster that
    * lost every member keeps its previous centroid via the cent$i
    * UNION ALL branch — replaying update()'s documented rule; without
    * it an all-identical-seed corpus (the skew degenerate sweep) made
    * the oracle silently DROP emptied clusters while Spark kept them. */
  private lazy val KmeansCtePrefix: String = {
    def assignCte(i: Int, centRel: String) =
      s"""sc$i AS (
            SELECT e.vec_id, ct.c,
              ${cosineSql("e.embedding", "ct.v")} AS cos
            FROM embeddings e, $centRel ct),
          a$i AS (
            SELECT vec_id, c, cos,
              row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c) AS rn
            FROM sc$i)"""
    def updateCte(i: Int) =
      s"""u$i AS (
            SELECT a.c, d.k,
              CAST(sum(CAST(d.xi AS DECIMAL(38,0))) AS DOUBLE)
                / count(*) / 262144.0 AS v
            FROM a${i - 1} a JOIN dims d ON a.vec_id = d.vec_id AND a.rn = 1
            GROUP BY a.c, d.k),
          cent$i AS (
            SELECT c, list(v ORDER BY k) AS v FROM u$i GROUP BY c
            UNION ALL
            SELECT c, v FROM cent${i - 1}
            WHERE c NOT IN (SELECT c FROM u$i))"""
    s"""WITH dims AS (
          SELECT vec_id, i - 1 AS k,
            CAST(floor(CAST(embedding[i] AS DOUBLE) * 262144.0 + 0.5) AS BIGINT) AS xi
          FROM embeddings, (SELECT unnest(generate_series(1, $Dim)) AS i) idx),
        cent0 AS (
          SELECT CAST(vec_id // $SeedStride AS INTEGER) AS c,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
          WHERE vec_id % $SeedStride = 0 AND vec_id < ${SeedStride.toLong * K}),
        ${assignCte(0, "cent0")},
        ${updateCte(1)},
        ${assignCte(1, "cent1")},
        ${updateCte(2)},
        ${assignCte(2, "cent2")}"""
  }

  private lazy val KmeansOracleSql: String =
    s"""$KmeansCtePrefix
        SELECT vec_id, CAST(c AS BIGINT) AS cluster, cos
        FROM a$Iters WHERE rn = 1 ORDER BY vec_id"""

  /** SemDeDup oracle: the clustering chain + within-cluster pairwise
    * cosine + the smaller-id keep rule. */
  private lazy val SemDedupOracleSql: String =
    s"""$KmeansCtePrefix,
        fin AS (
          SELECT a.vec_id, a.c, e.embedding
          FROM a$Iters a JOIN embeddings e ON e.vec_id = a.vec_id
          WHERE a.rn = 1)
        SELECT sa.vec_id, CAST(sa.c AS BIGINT) AS cluster,
          NOT EXISTS (
            SELECT 1 FROM fin sb
            WHERE sb.c = sa.c AND sb.vec_id < sa.vec_id
              AND ${cosineSql("sa.embedding", "sb.embedding")} >= $SemThreshold
          ) AS keep
        FROM fin sa ORDER BY sa.vec_id"""

  /** Silhouette oracle: the clustering chain, then the rank-1/rank-2
    * pivot from the final scored relation and the identical
    * (cos1−cos2)/(1−cos2) quantization and mean division order. */
  private lazy val SilhouetteOracleSql: String =
    s"""$KmeansCtePrefix,
        piv AS (
          SELECT vec_id,
            max(CASE WHEN rn = 1 THEN c END) AS cluster,
            max(CASE WHEN rn = 1 THEN cos END) AS cos1,
            max(CASE WHEN rn = 2 THEN cos END) AS cos2
          FROM a$Iters WHERE rn <= 2 GROUP BY vec_id),
        sq AS (
          SELECT cluster,
            CAST(floor((cos1 - cos2) / (1.0 - cos2) * 1.0E9) AS BIGINT)
              AS s_q
          FROM piv)
        SELECT CAST(cluster AS BIGINT) AS cluster,
          count(*) AS n,
          CAST(sum(s_q) AS BIGINT) AS s_sum_q,
          min(s_q) AS s_min_q, max(s_q) AS s_max_q,
          CAST(CAST(sum(s_q) AS BIGINT) AS DOUBLE) / count(*) / 1.0E9
            AS mean_sil
        FROM sq GROUP BY cluster ORDER BY cluster"""

  /** Product-quantization encode: 64 dims → PqM codes (one byte each at
    * PqK ≤ 256) — the memory-compression step in front of IVF-PQ serving
    * (Jégou et al.): each vector is split into PqM contiguous 8-dim
    * subvectors, and each subvector is replaced by the id of its nearest
    * codebook entry under exact L2. The codebook here is the
    * deterministic seed set (the same vec_id % 50 seeds the IVF and
    * k-means operators use) so the whole encode — distances included —
    * is oracle-replayable; a production deployment trains the codebook
    * with the emb_kmeans Lloyd loop per subspace, same encode plan.
    * Map-only: codebooks are plan-time literals (PqM x PqK x 8 doubles),
    * assignment is argmin over a PqK-element array per subspace with the
    * canonical left-to-right fold, no shuffle before the presentation
    * sort. */
  private def pqDefs: Seq[QueryDef] = Seq(
    QueryDef(
      "emb_pq_encode",
      (s, dir) => {
        val e = emb(s, dir).select("vec_id", "embedding")
        val seeds = e.filter(col("vec_id") % SeedStride === 0 &&
            col("vec_id") < SeedStride.toLong * PqK)
          .orderBy("vec_id").collect()
          .map(_.getSeq[Float](1).map(_.toDouble).toArray)
        // empty corpus -> no codebook: empty encode (degenerate sweep,
        // r8; limit(0) hardening r9)
        if (seeds.isEmpty)
          e.limit(0).select(col("vec_id"), lit(0L).as("sub"), lit(0L).as("code"),
            lit(0.0).as("dist2"))
        else {
        val subStructs = (0 until PqM).map { j =>
          val sv = slice(col("embedding"), j * PqSubDim + 1, PqSubDim)
          val dists = array((0 until PqK).map { c =>
            val cb = array(seeds(c).slice(j * PqSubDim, (j + 1) * PqSubDim)
              .map(lit): _*)
            aggregate(
              zip_with(sv, cb, (x, y) =>
                (x.cast("double") - y) * (x.cast("double") - y)),
              lit(0.0), (a, x) => a + x)
          }: _*)
          struct(lit(j.toLong).as("sub"), dists.as("dists"))
        }
        e.select(col("vec_id"), explode(array(subStructs: _*)).as("s"))
          .select(col("vec_id"), col("s.sub").as("sub"),
            (array_position(col("s.dists"), array_min(col("s.dists"))) - 1)
              .cast("long").as("code"),
            array_min(col("s.dists")).as("dist2"))
          .orderBy("vec_id", "sub")
        }
      },
      Some(s"""WITH seeds AS (
                 SELECT CAST(vec_id // $SeedStride AS INTEGER) AS c, embedding
                 FROM embeddings
                 WHERE vec_id % $SeedStride = 0 AND vec_id < ${SeedStride.toLong * PqK}),
               cand AS (
                 SELECT e.vec_id, j, s.c,
                   list_reduce(list_transform(
                     list_zip(e.embedding[j * $PqSubDim + 1 : j * $PqSubDim + $PqSubDim],
                              s.embedding[j * $PqSubDim + 1 : j * $PqSubDim + $PqSubDim]),
                     p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                        * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                     (a, b) -> a + b) AS dist2
                 FROM embeddings e, (SELECT unnest(range(0, $PqM)) AS j) js, seeds s),
               r AS (
                 SELECT vec_id, j, c, dist2,
                   row_number() OVER (PARTITION BY vec_id, j
                     ORDER BY dist2, c) AS rn
                 FROM cand)
               SELECT vec_id, CAST(j AS BIGINT) AS sub, CAST(c AS BIGINT) AS code,
                 dist2
               FROM r WHERE rn = 1 ORDER BY vec_id, sub""")),

    // IVF-PQ search with asymmetric distance computation (ADC) — the
    // complete compressed-index serving path (Jégou et al.): every vector
    // lives in the inverted list of its nearest coarse centroid and is
    // stored only as PqM codebook codes (8 bytes here); a query builds a
    // PqM x PqK lookup table of EXACT subspace distances to the codebook
    // once, then scores each candidate in its probed list by summing PqM
    // table lookups — no candidate embedding is ever touched. Distributed
    // shape: codes + list ids are a map-only pass over the corpus, the
    // 10-row query side (with its tables) broadcasts, candidates ∝ list
    // population, and the only shuffle is the per-query top-k window. At
    // 100 TB the code table is ~1/32 the corpus bytes and the scan of a
    // probed list is memory-bandwidth-bound — exactly why IVF-PQ is the
    // standard billion-scale ANN layout. Every distance is a fixed-order
    // double fold over float-exact values, so ranks — ties broken by
    // vec_id — replay bit-for-bit in the oracle.
    QueryDef(
      "emb_ivfpq_search",
      (s, dir) => {
        val e = emb(s, dir).select("vec_id", "embedding")
        val seeds = e.filter(col("vec_id") % SeedStride === 0 &&
            col("vec_id") < SeedStride.toLong * PqK)
          .orderBy("vec_id").collect()
          .map(_.getSeq[Float](1).map(_.toDouble).toArray)
        // empty corpus -> no codebook: empty result (degenerate sweep,
        // r8; limit(0) hardening r9)
        if (seeds.isEmpty)
          e.limit(0).select(col("vec_id").as("q_id"), lit(0L).as("rank"),
            col("vec_id"), lit(0.0).as("adist2"))
        else {
        def l2(sub: Column, cb: Array[Double]): Column =
          aggregate(
            zip_with(sub, array(cb.map(lit): _*), (x, y) =>
              (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), (a, x) => a + x)
        // coarse list: argmin full-dim L2 over the seed centroids
        // (first-min tie-break = lowest centroid id, as in the encode)
        val coarseD = array((0 until PqK).map(c => l2(col("embedding"), seeds(c))): _*)
        val listId = (array_position(coarseD, array_min(coarseD)) - 1)
          .cast("int").as("list_id")
        // per-subspace distance rows table[j][c]; codes are its argmins
        val subDists = (0 until PqM).map { j =>
          array((0 until PqK).map { c =>
            l2(slice(col("embedding"), j * PqSubDim + 1, PqSubDim),
              seeds(c).slice(j * PqSubDim, (j + 1) * PqSubDim))
          }: _*)
        }
        val codes = array(subDists.map(d =>
          (array_position(d, array_min(d)) - 1).cast("int")): _*).as("codes")
        val cands = e.select(col("vec_id"), listId, codes)
        val queries = e.filter(col("vec_id") < PqNumQueries)
          .select(col("vec_id").as("q_id"), listId,
            array(subDists: _*).as("qtable"))
        val adist2 = aggregate(
          zip_with(col("codes"), col("qtable"), (c, t) => element_at(t, c + 1)),
          lit(0.0), (a, x) => a + x)
        val w = Window.partitionBy("q_id")
          .orderBy(col("adist2").asc, col("vec_id").asc)
        cands.join(broadcast(queries), "list_id")
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("adist2", adist2)
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= PqTopK)
          .select(col("q_id"), col("rank"), col("vec_id"), col("adist2"))
          .orderBy("q_id", "rank")
        }
      },
      Some(s"""WITH seeds AS (
                 SELECT CAST(vec_id // $SeedStride AS INTEGER) AS c, embedding
                 FROM embeddings
                 WHERE vec_id % $SeedStride = 0 AND vec_id < ${SeedStride.toLong * PqK}),
               coarse_d AS (
                 SELECT e.vec_id, s.c,
                   list_reduce(list_transform(list_zip(e.embedding, s.embedding),
                     p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                        * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                     (a, b) -> a + b) AS d2
                 FROM embeddings e, seeds s),
               coarse AS (
                 SELECT vec_id, c AS list_id FROM (
                   SELECT vec_id, c,
                     row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
                   FROM coarse_d) WHERE rn = 1),
               sub_d AS (
                 SELECT e.vec_id, j, s.c,
                   list_reduce(list_transform(
                     list_zip(e.embedding[j * $PqSubDim + 1 : j * $PqSubDim + $PqSubDim],
                              s.embedding[j * $PqSubDim + 1 : j * $PqSubDim + $PqSubDim]),
                     p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                        * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                     (a, b) -> a + b) AS dist2
                 FROM embeddings e, (SELECT unnest(range(0, $PqM)) AS j) js, seeds s),
               codes AS (
                 SELECT vec_id, j, c AS code FROM (
                   SELECT vec_id, j, c,
                     row_number() OVER (PARTITION BY vec_id, j
                       ORDER BY dist2, c) AS rn
                   FROM sub_d) WHERE rn = 1),
               pairs AS (
                 SELECT cq.vec_id AS q_id, cx.vec_id,
                   list_reduce(list(t.dist2 ORDER BY t.j), (a, b) -> a + b)
                     AS adist2
                 FROM coarse cq
                 JOIN coarse cx ON cx.list_id = cq.list_id
                 JOIN codes k ON k.vec_id = cx.vec_id
                 JOIN sub_d t ON t.vec_id = cq.vec_id AND t.j = k.j
                             AND t.c = k.code
                 WHERE cq.vec_id < $PqNumQueries AND cx.vec_id != cq.vec_id
                 GROUP BY cq.vec_id, cx.vec_id),
               rk AS (
                 SELECT q_id, vec_id, adist2,
                   row_number() OVER (PARTITION BY q_id
                     ORDER BY adist2, vec_id) AS rank
                 FROM pairs)
               SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, adist2
               FROM rk WHERE rank <= $PqTopK ORDER BY q_id, rank""")),

    // Density clustering (DBSCAN over the banded-LSH neighbor relation):
    // the curation complement to k-means — clusters form wherever the
    // embedding space is DENSE and everything sparse is labeled noise,
    // with no k to choose. ε-neighbors come from the suite's standing
    // near-dup relation (banded sign-bit LSH candidates + exact-cosine
    // ≥ 0.4 verification — Similarity.nearDupPairs, the same capped
    // generator sim_embed_neardup ships; the LSH approximation of the
    // ε-ball is the documented production trade). Core = ≥ MinPts
    // neighbors; clusters = connected components of the core-core
    // subgraph (Dedup.connectedComponents — bucketed joins + pointer
    // doubling, no driver graph state); border points attach to their
    // minimum neighboring core's cluster; the rest is noise. Shape:
    // one banded self-join (bucket-capped), one degree aggregate, CC on
    // the core sliver, one border join — every stage bucketed or
    // vertex-grain, nothing all-pairs.
    QueryDef(
      "emb_dbscan",
      (s, dir) => {
        val pairs = Similarity.nearDupPairs(s, dir)
          .select("a_id", "b_id").localCheckpoint()
        val deg = pairs.select(col("a_id").as("vec_id"))
          .unionAll(pairs.select(col("b_id").as("vec_id")))
          .groupBy("vec_id").agg(count(lit(1)).as("n_neighbors"))
        val core = deg.filter(col("n_neighbors") >= DbscanMinPts)
          .select("vec_id").localCheckpoint()
        val corePairs = pairs
          .join(core.select(col("vec_id").as("a_id")), Seq("a_id"))
          .join(core.select(col("vec_id").as("b_id")), Seq("b_id"))
        val cc = Dedup.connectedComponents(
            core.select(col("vec_id").as("doc_id")), corePairs)
          .select(col("doc_id").as("vec_id"), col("rep_id").as("cluster_id"))
        // cores not touched by any core-core edge are their own cluster
        val coreCluster = core.join(cc, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
        // border: non-core with >= 1 core neighbor -> min core's cluster
        val adj = pairs.select(col("a_id").as("vec_id"), col("b_id").as("nb"))
          .unionAll(pairs.select(col("b_id").as("vec_id"), col("a_id").as("nb")))
        val border = adj
          .join(coreCluster.select(col("vec_id").as("nb"), col("cluster_id")),
            Seq("nb"))
          .join(core, Seq("vec_id"), "left_anti")
          .groupBy("vec_id").agg(min(col("cluster_id")).as("cluster_id"))
        val e = Tables.load(s, dir, "embeddings").select("vec_id")
        e.join(deg, Seq("vec_id"), "left")
          .join(coreCluster.select(col("vec_id"),
            col("cluster_id").as("core_cl")), Seq("vec_id"), "left")
          .join(border.select(col("vec_id"),
            col("cluster_id").as("bord_cl")), Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
            when(col("core_cl").isNotNull, "core")
              .when(col("bord_cl").isNotNull, "border")
              .otherwise("noise").as("role"),
            coalesce(col("core_cl"), col("bord_cl")).as("cluster_id"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE ${Similarity.nearDupPairsSql()},
               deg AS (
                 SELECT vec_id, count(*) AS n_neighbors FROM (
                   SELECT a_id AS vec_id FROM epairs
                   UNION ALL SELECT b_id FROM epairs) GROUP BY vec_id),
               core AS (
                 SELECT vec_id FROM deg WHERE n_neighbors >= $DbscanMinPts),
               cedges AS MATERIALIZED (
                 SELECT p.a_id AS u, p.b_id AS v FROM epairs p
                 JOIN core x ON x.vec_id = p.a_id
                 JOIN core y ON y.vec_id = p.b_id
                 UNION ALL
                 SELECT p.b_id, p.a_id FROM epairs p
                 JOIN core x ON x.vec_id = p.a_id
                 JOIN core y ON y.vec_id = p.b_id),
               reach(u, v) AS (
                 SELECT u, v FROM cedges
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN cedges e ON r.v = e.u),
               ccrep AS (
                 SELECT u AS vec_id, least(u, min(v)) AS cluster_id
                 FROM reach GROUP BY u),
               corecl AS (
                 SELECT c.vec_id,
                   coalesce(r.cluster_id, c.vec_id) AS cluster_id
                 FROM core c LEFT JOIN ccrep r ON r.vec_id = c.vec_id),
               adj AS (
                 SELECT a_id AS vec_id, b_id AS nb FROM epairs
                 UNION ALL SELECT b_id, a_id FROM epairs),
               border AS (
                 SELECT a.vec_id, min(k.cluster_id) AS cluster_id
                 FROM adj a
                 JOIN corecl k ON k.vec_id = a.nb
                 WHERE a.vec_id NOT IN (SELECT vec_id FROM core)
                 GROUP BY a.vec_id)
               SELECT e.vec_id,
                 CAST(coalesce(d.n_neighbors, 0) AS BIGINT) AS n_neighbors,
                 CASE WHEN c.cluster_id IS NOT NULL THEN 'core'
                      WHEN b.cluster_id IS NOT NULL THEN 'border'
                      ELSE 'noise' END AS role,
                 coalesce(c.cluster_id, b.cluster_id) AS cluster_id
               FROM embeddings e
               LEFT JOIN deg d ON d.vec_id = e.vec_id
               LEFT JOIN corecl c ON c.vec_id = e.vec_id
               LEFT JOIN border b ON b.vec_id = e.vec_id
               ORDER BY e.vec_id""")))
}
