package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.EngineFns._

/** Deduplication operators for LLM training-data pipelines over the
  * `documents` table:
  *
  *  - exact dedup (hash group-by),
  *  - n-gram (3-word shingle) Jaccard similarity via an *inverted-index
  *    join* — only pairs sharing at least one shingle are materialized, so
  *    at 100 TB the shuffle is proportional to sum(posting-list^2), never
  *    |docs|^2 (the cross-join is only used by the small-scale oracle SQL,
  *    which is semantically identical for any threshold > 0),
  *  - MinHash signatures (md5-based, oracle-checkable) + LSH banding for
  *    candidate generation (the 100 TB scale path: band-bucket shuffle
  *    instead of pairwise comparison),
  *  - SimHash (16-bit) + Hamming-distance candidate pairs.
  *
  * Embedding-cosine near-dup lives in Similarity.scala.
  */
object Dedup {

  private val NumPerms = 16
  private val BandRows = 2 // 8 bands x 2 rows — recall-biased for low-J corpora
  private val JaccardThreshold = 0.015

  /** Documents spread across all cores: the corpus ships as one parquet
    * file (= one input split), which would serialize the md5/shingle
    * expression work onto a single task. At 100 TB inputs arrive
    * pre-split; locally the explicit round-robin repartition restores
    * scan-side parallelism. Results stay deterministic — every query
    * ends in a total-order sort. */
  private def docsParallel(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)

  /** (doc_id, sh) with sh = distinct 3-word shingles. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    docsParallel(s, dir)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))

  /** (doc_id, sh, sig): MinHash signatures computed on the fully
    * whole-stage-codegen path — explode shingles to rows, hash each with
    * the scalar (codegen'd) md5 expression, then take the 16 permutation
    * minima as plain min aggregates. Higher-order-function lambdas are
    * interpreted in Spark, so the HOF formulation (minhashSig, still used
    * for per-row signatures in tests) evaluates 480k md5s in the
    * interpreter; this shape keeps everything in generated code and
    * map-side partial aggregation. Values are identical: per-doc per-perm
    * min over the same distinct-shingle hash multiset. */
  private def signatures(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val hashed = sh
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), hash31(col("shingle")).as("h"))
    val permMins = (0 until NumPerms).map { p =>
      min((lit(p * 2 + 3).cast("long") * col("h") + p) % 2147483647L).as(s"sig_$p")
    }
    val sig = hashed.groupBy("doc_id")
      .agg(permMins.head, permMins.tail: _*)
      .select(col("doc_id"),
        array((0 until NumPerms).map(p => col(s"sig_$p")): _*).as("sig"))
    // left join + null-array fallback preserves the HOF form's behavior
    // for shingle-less docs (16 NULL signature slots, not a dropped row)
    sh.join(sig, Seq("doc_id"), "left")
      .withColumn("sig",
        coalesce(col("sig"),
          array_repeat(lit(null).cast("long"), NumPerms)))
  }

  /** (doc_id, simhash): 16-bit SimHash on the whole-stage-codegen path —
    * explode tokens, hash with the scalar md5 expression, take the 16
    * bit-votes as conditional sum aggregates, assemble bits in the final
    * projection. Same values as the interpreted HOF fold (same ±1 vote
    * sum over the same token multiset), ~an order of magnitude cheaper. */
  private def simhashed(s: SparkSession, dir: String): DataFrame = {
    val hashed = docsParallel(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), hash31(col("t")).as("h"))
    val votes = (0 until 16).map { j =>
      sum(when(expr(s"(shiftright(h, $j) & 1) = 1"), 1).otherwise(-1)).as(s"v_$j")
    }
    hashed.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 16)
          .map(j => when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Exact Jaccard for pairs sharing >= 1 shingle, via inverted index. */
  private def jaccardPairs(sh: DataFrame): DataFrame = {
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val postings = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val a = postings.select(col("shingle"), col("doc_id").as("a_id"))
    val b = postings.select(col("shingle"), col("doc_id").as("b_id"))
    a.join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("n_a")), Seq("a_id"))
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("n_b")), Seq("b_id"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: canonical representative (min doc_id) per identical text.
    QueryDef(
      "dedup_exact",
      (s, dir) =>
        Tables.load(s, dir, "documents")
          .groupBy("text")
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id", "text")
          .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, text FROM documents
              GROUP BY text ORDER BY doc_id""")),

    // N-gram Jaccard near-dup pairs. Spark side: inverted-index join
    // (scale path); oracle: cross-join over distinct shingle lists —
    // identical output for threshold > 0.
    QueryDef(
      "dedup_ngram_jaccard",
      (s, dir) =>
        jaccardPairs(shingled(s, dir))
          .filter(col("jaccard") >= JaccardThreshold)
          .select("a_id", "b_id", "n_common", "jaccard")
          .orderBy("a_id", "b_id"),
      Some(s"""WITH d AS (
                 SELECT doc_id, list_distinct(list_transform(
                   range(1, len(string_split(text,' ')) - 1),
                   i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS sh
                 FROM documents)
               SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS n_common,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jaccard
               FROM d a, d b
               WHERE a.doc_id < b.doc_id
                 AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) >= $JaccardThreshold
               ORDER BY a_id, b_id""")),

    // MinHash signatures, flattened to (doc_id, perm_id, sig_val) for the
    // oracle hash-compare. md5-based permutation hashes are engine-portable.
    QueryDef(
      "dedup_minhash",
      (s, dir) =>
        signatures(s, dir)
          .select(col("doc_id"), posexplode(col("sig")))
          .select(
            col("doc_id"),
            col("pos").cast("long").as("perm_id"),
            col("col").as("sig_val"))
          // single-partition sort instead of a global orderBy: the range
          // partitioner's sampling pass would execute the whole signature
          // pipeline a second time; 80k output rows sort fine in one task
          .repartition(1)
          .sortWithinPartitions("doc_id", "perm_id"),
      Some("""WITH d AS (
                SELECT doc_id, list_distinct(list_transform(
                  range(1, len(string_split(text,' ')) - 1),
                  i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS sh
                FROM documents),
              sig AS (
                SELECT doc_id, list_transform(range(0, 16), p ->
                  list_aggregate(list_transform(sh, s ->
                    ((2*p + 3) * (CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647) + p) % 2147483647),
                  'min')) AS sg
                FROM d)
              SELECT doc_id, CAST(i - 1 AS BIGINT) AS perm_id, sg[i] AS sig_val
              FROM sig, (SELECT unnest(generate_series(1, 16)) AS i) idx
              ORDER BY doc_id, perm_id""")),

    // MinHash + LSH banding: candidate pairs from band-bucket collisions,
    // then exact Jaccard verification. This is the 100 TB dedup path —
    // the only shuffle is groupBy(band_id, band_key). Rows-only check
    // (band keys are engine-portable too, but candidate sets are the
    // point here, not a SQL-expressible relation).
    QueryDef(
      "dedup_minhash_pairs",
      (s, dir) => {
        val withSig = signatures(s, dir)
        val sh = withSig.select(col("doc_id"), col("sh"))
        val bands = withSig.select(
          col("doc_id"),
          explode(transform(sequence(lit(0), lit(NumPerms / BandRows - 1)), b =>
            struct(
              b.as("band_id"),
              concat_ws(",", slice(col("sig"), b * BandRows + lit(1), lit(BandRows)))
                .as("band_key")))).as("band"))
          .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band_id") === col("y.band_id") &&
              col("x.band_key") === col("y.band_key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
          .distinct()
        val withSh = cand
          .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), Seq("a_id"))
          .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), Seq("b_id"))
        withSh
          .select(
            col("a_id"), col("b_id"),
            (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              (size(col("sh_a")) + size(col("sh_b")) -
                size(array_intersect(col("sh_a"), col("sh_b")))).cast("double"))
              .as("jaccard"))
          .orderBy("a_id", "b_id")
      },
      None),

    // Corpus-level MinHash via a typed custom Aggregator: element-wise
    // min over per-document signatures = the signature of each source's
    // concatenated shingle set (minhash union property). Associative +
    // commutative, so Spark runs it with map-side partial aggregation.
    QueryDef(
      "dedup_minhash_by_source",
      (s, dir) => {
        import s.implicits._
        val minhashUnion = udaf(new graft.functions.MinHashAgg(NumPerms))
        signatures(s, dir)
          .join(broadcast(docsParallel(s, dir).select("doc_id", "source")), Seq("doc_id"))
          .groupBy("source")
          .agg(minhashUnion(col("sig")).as("src_sig"))
          .select(col("source"), posexplode(col("src_sig")))
          .select(col("source"), col("pos").cast("long").as("perm_id"),
            col("col").as("sig_val"))
          .orderBy("source", "perm_id")
      },
      Some("""WITH d AS (
                SELECT doc_id, list_distinct(list_transform(
                  range(1, len(string_split(text,' ')) - 1),
                  i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS sh
                FROM documents),
              sig AS (
                SELECT doc_id, list_transform(range(0, 16), p ->
                  list_aggregate(list_transform(sh, s ->
                    ((2*p + 3) * (CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % 2147483647) + p) % 2147483647),
                  'min')) AS sg
                FROM d)
              SELECT doc.source, CAST(i - 1 AS BIGINT) AS perm_id, min(sig.sg[i]) AS sig_val
              FROM sig
              JOIN documents doc USING (doc_id),
                   (SELECT unnest(generate_series(1, 16)) AS i) idx
              GROUP BY doc.source, i
              ORDER BY source, perm_id""")),

    // SimHash signature per document (16-bit, engine-portable arithmetic).
    QueryDef(
      "dedup_simhash",
      (s, dir) =>
        simhashed(s, dir).orderBy("doc_id"),
      Some("""WITH v AS (
                SELECT doc_id,
                  list_transform(range(0, 16), j ->
                    CASE WHEN list_sum(list_transform(string_split(text, ' '), t ->
                      CASE WHEN ((CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647) >> j) & 1 = 1
                           THEN 1 ELSE -1 END)) > 0
                    THEN 1 ELSE 0 END) AS bits
                FROM documents)
              SELECT doc_id,
                CAST(list_sum(list_transform(range(0, 16), j ->
                  CASE WHEN bits[j + 1] = 1 THEN 1 << j ELSE 0 END)) AS BIGINT) AS simhash
              FROM v ORDER BY doc_id""")),

    // SimHash near-dup pairs by Hamming distance <= 3. Self-join is fine
    // at corpus scale here; at 100 TB the same query runs over 4-bit
    // chunk blocking (pigeonhole) — documented in SCALE.md.
    QueryDef(
      "dedup_simhash_pairs",
      (s, dir) => {
        // Streamed side keeps the repartitioned parallelism; the other
        // side is broadcast (signatures are 16 bytes/doc) so the O(n^2)
        // Hamming scan fans out across all cores.
        val sig = simhashed(s, dir)
        sig.as("x").join(broadcast(sig.as("y")), col("x.doc_id") < col("y.doc_id"))
          .select(
            col("x.doc_id").as("a_id"),
            col("y.doc_id").as("b_id"),
            expr("bit_count(x.simhash ^ y.simhash)").cast("long").as("hamming"))
          .filter(col("hamming") <= 3)
          .orderBy("a_id", "b_id")
      },
      None)
  )
}
