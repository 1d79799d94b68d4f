package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-pipeline operators: sequence packing, stratified sampling,
  * quality filtering, exact centroids, stream-stream interval join. */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("text_pack: pack ids are non-decreasing and respect the token budget") {
    val rows = Registry.byName("text_pack").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("pack_id")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      // replay next-fit locally: pack = floor(cum_before / budget)
      var cum = 0L
      sorted.foreach { case (_, _, n, pack) =>
        assert(pack === cum / 2048L)
        cum += n
      }
    }
  }

  test("sample_stratified is deterministic and en is downsampled vs zh") {
    val a = Registry.byName("sample_stratified").run(spark, TestSpark.sf).collect()
    val b = Registry.byName("sample_stratified").run(spark, TestSpark.sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    val byLang = a.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    val total = Tables.load(spark, TestSpark.sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en sampled at 30%, zh at 80% — rates must order that way
    assert(byLang("en").toDouble / total("en") < byLang("zh").toDouble / total("zh"))
  }

  test("text_filter_quality: kept iff verdict is keep, and both classes occur") {
    val rows = Registry.byName("text_filter_quality").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[String]("verdict"), r.getAs[Boolean]("kept")))
    assert(rows.forall { case (v, k) => k === (v == "keep") })
    assert(rows.exists(_._2), "no document passed the quality gate")
  }

  test("emb_centroid: counts per label cover the corpus, 64 dims each") {
    val rows = Registry.byName("emb_centroid").run(spark, TestSpark.sf).collect()
    val labels = rows.map(_.getAs[Long]("label")).distinct
    assert(rows.length === labels.length * 64)
    val nVecs = Tables.load(spark, TestSpark.sf, "embeddings").count()
    val nPerDim0 = rows.filter(_.getAs[Long]("dim") == 0L)
      .map(_.getAs[Long]("n")).sum
    assert(nPerDim0 === nVecs)
  }

  test("stream interval join equals the batch join aggregation") {
    val streamed = Registry.byName("stream_interval_join").run(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val e = Tables.load(spark, TestSpark.sf, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      .groupBy(col("p_id").as("purchase_id"))
      .agg(count(lit(1)).as("n_clicks_1h"))
      .orderBy("purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("text_chunk_overlap: chunks tile each doc with stride 30 / size 40") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    val chunks = Registry.byName("text_chunk_overlap").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("n_toks"), r.getAs[String]("chunk_text")))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val toks = docs(id)
      // every chunk is exactly the slice [chunk_id*30, +40) of the doc
      cs.foreach { case (_, cid, n, txt) =>
        val start = (cid * 30).toInt
        val expect = toks.slice(start, start + 40)
        assert(txt === expect.mkString(" "))
        assert(n === expect.length.toLong)
      }
      // chunk ids are 0..last with the last chunk reaching the doc's end
      val ids = cs.map(_._2).sorted
      assert(ids === (0L until ids.length).toSeq)
      assert(ids.length === (toks.length - 1) / 30 + 1)
    }
  }

  test("sample_fixed_k keeps exactly min(50, group size) docs per language") {
    val got = Registry.byName("sample_fixed_k").run(spark, TestSpark.sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.load(spark, TestSpark.sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === total.keySet)
    got.foreach { case (lang, n) => assert(n === math.min(50L, total(lang))) }
  }

  test("sample_priority: exact-k DLT sample with the HT threshold estimator") {
    val rows = Registry.byName("sample_priority").run(spark, TestSpark.sf)
      .collect()
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> math.min(r.getLong(1), 500L).toDouble)
    assert(rows.length === math.min(100, docs.length))
    // local replay of the priority order: w / u with the same md5 draw
    def h31(s0: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2147483647L
    }
    val prio = docs.map { case (id, w) =>
      (id, w, w / ((h31(s"prio|$id") % 1000000L + 1L).toDouble / 1000000.0))
    }.sortBy { case (id, _, p) => (-p, id) }
    val expIds = prio.take(100).map(_._1).toSeq
    assert(rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("doc_id")).toSeq
      === expIds)
    // estimator: max(weight, tau) with tau = the 101st priority — every
    // kept row's est_weight >= its raw weight, and rows whose weight is
    // below tau all share est_weight = tau exactly
    if (docs.length > 100) {
      val tau = prio(100)._3
      rows.foreach { r =>
        val w = r.getAs[Double]("weight")
        val e = r.getAs[Double]("est_weight")
        assert(e === math.max(w, tau))
      }
    }
  }

  test("mm_crossmodal_audit reconciles with the standalone near-dup relations") {
    val rows = Registry.byName("mm_crossmodal_audit").run(spark, TestSpark.sf)
      .collect()
      .map(r => r.getAs[String]("class") -> r).toMap
    assert(rows.nonEmpty)
    assert(rows.keySet.subsetOf(Set("both", "media_only", "text_only")))
    // text side reconciliation: pairs with a text signal (both +
    // text_only) must count exactly the standalone dedup_ngram_jaccard
    // relation at the same threshold
    val nText = Seq("both", "text_only")
      .flatMap(rows.get).map(_.getAs[Long]("n_pairs")).sum
    val nJac = Registry.byName("dedup_ngram_jaccard")
      .run(spark, TestSpark.sf).count()
    assert(nText === nJac)
    // media side: ham-1..3 pairs (both + media_only minus exact ham-0)
    // can never undercount the standalone wide near-dup relation
    val nMedia = Seq("both", "media_only")
      .flatMap(rows.get).map(_.getAs[Long]("n_pairs")).sum
    val nWide = Registry.byName("mm_phash_neardup_wide")
      .run(spark, TestSpark.sf).count()
    assert(nMedia >= nWide)
    // class-shape invariants: media classes carry hamming in [0, 3],
    // text_only carries none; text classes carry n_common >= 1
    rows.get("media_only").foreach { r =>
      assert(r.getAs[Long]("min_hamming") >= 0L)
      assert(r.getAs[Long]("max_hamming") <= 3L)
      assert(r.isNullAt(r.fieldIndex("min_common")))
    }
    rows.get("text_only").foreach { r =>
      assert(r.isNullAt(r.fieldIndex("min_hamming")))
      assert(r.getAs[Long]("min_common") >= 1L)
    }
    rows.get("both").foreach { r =>
      assert(r.getAs[Long]("max_hamming") <= 3L)
      assert(r.getAs[Long]("min_common") >= 1L)
    }
  }

  test("sample_neyman allocates the budget by N_h*sigma_h and fills by rank") {
    val rows = Registry.byName("sample_neyman").run(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    // local replay of the allocation arithmetic
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("lang", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val strata = docs.groupBy(_._1).map { case (lang, xs) =>
      val n = xs.length.toLong
      val s = xs.map(x => BigInt(x._2)).sum
      val q = xs.map(x => BigInt(x._2) * BigInt(x._2)).sum
      val wq = if (n > 1) {
        val v = (BigInt(n) * q - s * s).toDouble / (n * (n - 1)).toDouble
        math.floor(math.sqrt(v) * n.toDouble * 256.0 + 0.5).toLong
      } else 0L
      (lang, n, wq)
    }.toSeq
    val wtot = strata.map(_._3).sum
    val expQuota = strata.map { case (lang, n, wq) =>
      lang -> (if (wtot == 0) 200L * n / strata.map(_._2).sum
               else 200L * wq / wtot)
    }.toMap
    val gotQuota = rows.groupBy(_.getAs[String]("lang")).view
      .mapValues(_.head.getAs[Long]("quota")).toMap
    gotQuota.foreach { case (lang, got) =>
      assert(got === expQuota(lang), s"quota for $lang")
    }
    // each stratum fills exactly min(quota, stratum size) rows, ranked
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, g) =>
      val sz = docs.count(_._1 == lang).toLong
      assert(g.length.toLong === math.min(expQuota(lang), sz), lang)
      assert(g.map(_.getAs[Long]("rk")).sorted.toSeq ===
        (1L to g.length).toSeq, lang)
    }
    // the budget is respected (floor division spends <= 200)
    assert(rows.length <= 200)
  }

  test("text_rarity equals a local unigram collection-frequency replay") {
    val texts = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val ctf = texts.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Registry.byName("text_rarity").run(spark, TestSpark.sf).collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("sum_ctf") === toks.map(ctf).sum)
    }
  }

  test("dedup_edit_verify: verified pairs are the low-edit-distance subset of sketch candidates") {
    val texts = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val t = prev(j)
          prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = t
        }
      }
      prev(b.length)
    }
    val cand = operators.Dedup
      .simhashChunkPairs(
        Registry.byName("dedup_simhash_wide").run(spark, TestSpark.sf),
        numChunks = 4, chunkBits = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = Registry.byName("dedup_edit_verify").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("edit_dist")))
    assert(verified.nonEmpty)
    verified.foreach { case (a, b, d) =>
      assert(cand.contains((a, b)), s"($a,$b) not a sketch candidate")
      assert(d <= 50L)
      assert(d === lev(texts(a), texts(b)).toLong)
    }
    // the exact check must reject every high-distance candidate
    val expected = cand.filter { case (a, b) => lev(texts(a), texts(b)) <= 50 }
    assert(verified.map(v => (v._1, v._2)).toSet === expected)
  }

  test("pipeline_corpus_clean: split shares are sane and totals bounded by the corpus") {
    val rows = Registry.byName("pipeline_corpus_clean").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[String]("split"), r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "valid", "test")))
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val corpus = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(bySplit.values.sum <= corpus, "pipeline emitted more docs than exist")
    assert(bySplit.getOrElse("train", 0L) >
      bySplit.getOrElse("valid", 0L) + bySplit.getOrElse("test", 0L),
      "train split should dominate a 90/5/5 assignment")
    rows.foreach { case (_, _, n, toks) => assert(toks >= n * 8,
      "every surviving doc passed the >=8-token quality gate") }
  }

  test("text_bpe_merges equals a local greedy-BPE replay") {
    var texts = Tables.load(spark, TestSpark.sf, "documents")
      .select("text").collect().map(_.getString(0))
    val learned = Registry.byName("text_bpe_merges").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("iter"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[Long]("cnt")))
    assert(learned.map(_._1).toSeq === Seq(1L, 2L, 3L))
    learned.foreach { case (_, a, b, cnt) =>
      // the reported count is the corpus-wide adjacent-pair count at
      // the time the rule was learned (argmax with (cnt, a, b) order)
      val counts = texts.iterator
        .flatMap(t => t.split(" ", -1).sliding(2).filter(_.length == 2)
          .map(p => (p(0), p(1))))
        .foldLeft(Map.empty[(String, String), Long]) { (m, p) =>
          m.updated(p, m.getOrElse(p, 0L) + 1)
        }
      val best = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      assert(best._1 === ((a, b)) && best._2 === cnt)
      // apply the merge the same greedy way (literal replace on the
      // double-spaced form) and continue
      texts = texts.map { t =>
        ("  " + t.replace(" ", "  ") + "  ")
          .replace(s" $a  $b ", s" $a~$b ")
          .replace("  ", " ").trim
      }
    }
  }

  test("mm_phash: rep ids are group minima and bit 0 follows the first segment") {
    val rows = Registry.byName("mm_phash").run(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("format"),
        r.getAs[Long]("phash"), r.getAs[Long]("rep_id"), r.getAs[Long]("n_same")))
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, g) =>
      val repExpect = g.map(_._1).min
      g.foreach { case (_, _, _, rep, n) =>
        assert(rep === repExpect)
        assert(n === g.length.toLong)
      }
    }
    // local replay of the signature for a handful of docs
    val texts = Tables.load(spark, TestSpark.sf, "documents")
      .filter(col("doc_id") < 5).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byId = rows.map(r => r._1 -> r._3).toMap
    texts.foreach { case (id, text) =>
      val b = text.getBytes("UTF-8").map(x => (x & 0xff).toLong)
      val total = b.sum
      var h = 0L
      for (i <- 0 until 16) {
        val lo = (b.length.toLong * i / 16).toInt
        val hi = (b.length.toLong * (i + 1) / 16).toInt
        if (b.slice(lo, hi).sum * b.length > total * (hi - lo)) h |= (1L << i)
      }
      assert(byId(id) === h)
    }
  }

  test("q_merge_upsert labels every key with the correct merge action") {
    val rows = Registry.byName("q_merge_upsert").run(spark, TestSpark.sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[String]("action")).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (k, action) =>
      val inBase = k % 3 != 0
      val inUpd = k % 2 == 0
      val expect =
        if (inBase && inUpd) "update" else if (inUpd) "insert" else "keep"
      assert(action === expect, s"key $k")
    }
    assert(rows.valuesIterator.toSet === Set("insert", "update", "keep"))
  }

  test("text_strip_markup recovers the original text on every row") {
    val rows = Registry.byName("text_strip_markup").run(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("clean_ok")), "markup strip lost content")
    assert(rows.forall(_.getAs[Long]("html_len") > 0))
  }

  test("sample_temperature flattens the mixture: small source keeps a higher fraction") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_temp").toString
    val docs = ((0 until 100).map(i => (i.toLong, s"big doc $i", "big")) ++
      (0 until 16).map(i => (100L + i, s"small doc $i", "small")))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Registry.byName("sample_temperature").run(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_source")))
    val kept = out.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    // rates: big 2/sqrt(100) = 0.2, small 2/sqrt(16) = 0.5
    assert(out.forall { case (s, n) => (s == "big") == (n == 100L) })
    assert(kept.getOrElse("small", 0.0) / 16.0 >
      kept.getOrElse("big", 0.0) / 100.0,
      s"flattening must favor the small source: $kept")
  }

  test("text_lm_score equals hand-computed bigram probabilities") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // corpus: c(x)=3, c(x y)=2, c(x z)=1, c(y)=2, c(y x)=1
    val docs = Seq(
      (0L, "x y x z"), // bigrams: (x,y) p=2/3 -> 666666; (y,x) p=1/2 -> 500000; (x,z) p=1/3 -> 333333
      (1L, "x y"), // (x,y) -> 666666
      (2L, "solo")) // no bigrams
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Registry.byName("text_lm_score").run(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(0L)._1 === 3L)
    assert(out(0L)._2.get === (666666L + 500000L + 333333L).toDouble / 3)
    assert(out(1L) === ((1L, Some(666666.0))))
    assert(out(2L) === ((0L, None)))
  }

  test("ngrams generator emits positional trigrams; short and null-safe inputs emit none") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x")).toDF("id", "t")
      .select(col("id"), graft.functions.NGramsGenerator(spark, col("t"), 3))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getAs[Long]("pos"), r.getAs[String]("gram"))).toSet
    assert(rows === Set((1L, 0L, "a b c"), (1L, 1L, "b c d")))
  }

  test("q_retention counts distinct returning users per cohort and offset") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ret").toString
    val day0 = 1704067200L * 1000000000L // 2024-01-01 UTC in ns
    def ns(day: Int, h: Int) = day0 + day * 86400000000000L + h * 3600000000000L
    // user 1: days 0,1,3,7; user 2: days 0,2 (2 untracked); user 3: days 1,2
    val evs = Seq(
      (1L, ns(0, 1), 1L), (1L, ns(0, 5), 1L), // same-day dup must not double-count
      (2L, ns(1, 2), 1L), (3L, ns(3, 3), 1L), (4L, ns(7, 4), 1L),
      (5L, ns(0, 1), 2L), (6L, ns(2, 2), 2L),
      (7L, ns(1, 1), 3L), (8L, ns(2, 2), 3L))
      .map { case (id, t, u) => (id, t, u, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    evs.coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = Registry.byName("q_retention").run(spark, d).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("cohort").toInstant.getEpochSecond,
        r.getAs[Long]("day_offset"), r.getAs[Long]("n_users")))
    val day0s = 1704067200L
    val day1s = day0s + 86400L
    assert(out.toSet === Set(
      (day0s, 0L, 2L), (day0s, 1L, 1L), (day0s, 3L, 1L), (day0s, 7L, 1L),
      (day1s, 0L, 1L), (day1s, 1L, 1L)), s"got ${out.toSeq}")
  }

  test("q_lateral_join returns at most 2 customers per nation, balance-descending") {
    val rows = Registry.byName("q_lateral_join").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Double]("bal")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (n, g) =>
      assert(g.length <= 2, s"nation $n returned ${g.length} rows")
      assert(g.map(_._2).sorted.reverse.sameElements(g.map(_._2)),
        s"nation $n not balance-descending")
    }
  }

  test("partitioned fact join plans dynamic partition pruning on the fact scan") {
    // run the partitioned write first so the scratch layout exists
    Registry.byName("q_partitioned_prune").run(spark, TestSpark.sf).collect()
    val fact = spark.read.parquet(sources.Formats.scratchRoot("part"))
    // the dim predicate is on a NON-join column, so the qualifying
    // event_types are only known at runtime — static pruning can't fire
    // and Spark must plan a DPP subquery on the fact's partition column
    val dim = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("value") > 48.0)
      .select(col("event_type")).distinct()
    val p = fact.join(dim, Seq("event_type"))
      .groupBy("user_id").count()
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n$p")
  }

  test("text_quality_model: margin is the declared linear form and both classes occur") {
    val rows = Registry.byName("text_quality_model").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_stop"),
        r.getAs[Long]("lex_score"), r.getAs[Long]("margin"),
        r.getAs[Boolean]("keep")))
    assert(rows.nonEmpty)
    rows.foreach { case (nt, ns, lex, m, keep) =>
      assert(m === lex + 8 * ns - nt)
      assert(keep === (m >= 0))
      assert(ns <= nt)
    }
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "classifier must separate the corpus into both classes")
  }

  test("mm_audio_energy: 4 frames per odd doc, sample counts tile the body") {
    val rows = Registry.byName("mm_audio_energy").run(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx"),
        r.getAs[Long]("sum_sq"), r.getAs[Long]("n_samples"),
        r.getAs[Double]("mean_sq")))
    assert(rows.nonEmpty)
    val lens = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (id, g) =>
      assert(id % 2 === 1)
      assert(g.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
      assert(g.map(_._4).sum === lens(id), s"doc $id frame sizes don't tile")
    }
    rows.foreach { case (_, _, ss, n, ms) =>
      assert(ss >= 0 && n > 0 && math.abs(ms - ss.toDouble / n.toDouble) == 0.0)
    }
  }

  test("mm_manifest joins all modalities on the shared id") {
    val m = Registry.byName("mm_manifest").run(spark, TestSpark.sf)
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val vecs = Tables.load(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(m.count() === (docs & vecs).size.toLong)
    val bad = m.filter(col("n_payload_bytes") =!= col("n_chars") + 16L).count()
    assert(bad === 0L)
  }

  test("stream_ingest_dedup equals the batch anti join") {
    val streamed = Registry.byName("stream_ingest_dedup")
      .run(spark, TestSpark.sf)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    val standing = docs.filter(col("doc_id") % 7 === 0).select("fp").distinct()
    val expected = docs.filter(col("doc_id") % 7 =!= 0)
      .join(standing, Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(streamed === expected)
    assert(streamed.nonEmpty)
  }

  test("q_bucketed_join equals the plain join aggregate") {
    val bucketed = Registry.byName("q_bucketed_join").run(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val plain = Tables.load(spark, TestSpark.sf, "lineitem")
      .join(Tables.load(spark, TestSpark.sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("qty"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(bucketed.toSeq === plain.toSeq)
  }

  test("stream_pipeline_clean equals the batch gate+dedup+split statistics") {
    import graft.operators.TextAnalysis.{avgWordLen, noiseRatio, stopwordRatio, tokenCount}
    import org.apache.spark.sql.expressions.Window
    val streamed = Registry.byName("stream_pipeline_clean")
      .run(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val kept = Tables.load(spark, TestSpark.sf, "documents")
      .filter(tokenCount(col("text")) >= 8 &&
        stopwordRatio(col("text")) <= 0.35 &&
        noiseRatio(col("text")) <= 0.25 &&
        avgWordLen(col("text")) >= 3.0)
      .withColumn("rep", min(col("doc_id")).over(Window.partitionBy("text")))
      .filter(col("doc_id") === col("rep"))
    val bucket = graft.functions.EngineFns.hash31(
      concat_ws("|", lit("split"), col("doc_id").cast("string"))) % 100L
    val batch = kept
      .withColumn("split",
        when(bucket < 90, "train").when(bucket < 95, "valid")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .orderBy("split", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("mm_cdc_match survives a prefix shift that breaks offset-anchored frames") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    // deterministic ~600-char word soup; doc 3 = doc 1 with 3 bytes
    // INSERTED at the front (every byte offset shifts), doc 5 unrelated
    val base = (1 to 120).map(i => s"w${(i * 7) % 97}").mkString(" ")
    val other = (1 to 120).map(i => s"v${(i * 13) % 89}").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "s1", base.length.toLong),
      (3L, "zz " + base, "en", "s3", base.length + 3L),
      (5L, other, "en", "s5", other.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Registry.byName("mm_cdc_match").run(spark, d).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("n_shared")))
    // content-defined boundaries re-synchronize after the insertion:
    // the shifted copy still shares every post-edit chunk
    assert(out.length === 1, s"expected exactly the shifted pair, got ${out.toSeq}")
    assert(out.head._1 === 1L && out.head._2 === 3L)
    assert(out.head._3 >= 4L)
    // and the chunk relation is per-doc distinct md5 ids over the body
    val chunkDocs = graft.operators.Multimodal.cdcChunks(spark, d)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(chunkDocs === Set(1L, 3L, 5L))
  }

  test("seq-len histogram accounts every doc and its exact pad waste") {
    import org.apache.spark.sql.functions._
    val out = Registry.byName("text_seqlen_hist").run(spark, TestSpark.sf)
      .collect()
    val lens = Tables.load(spark, TestSpark.sf, "documents")
      .select(size(split(col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0))
    assert(out.map(_.getAs[Long]("n_docs")).sum === lens.length.toLong)
    assert(out.map(_.getAs[Long]("sum_tokens")).sum === lens.sum)
    assert(out.map(_.getAs[Long]("sum_pad_waste")).sum ===
      lens.map(l => (512L - l % 512L) % 512L).sum)
    out.foreach { r =>
      // bucket b holds exactly the docs with len in [64b, 64b+64)
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("n_docs") ===
        lens.count(l => l / 64 == b).toLong)
      val ws = r.getAs[Double]("waste_share")
      assert(ws >= 0.0 && ws < 1.0)
    }
  }

  test("sample_token_budget: sqrt-flattened allocation, greedy prefix fill") {
    val rows = Registry.byName("sample_token_budget")
      .run(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    // local replay of the allocation arithmetic in exact BigInt
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tokS = docs.groupBy(_._1).view
      .mapValues(_.map(x => BigInt(x._3)).sum).toMap
    val wq = tokS.view
      .mapValues(t => BigInt(math.floor(math.sqrt(t.toDouble)).toLong)).toMap
    val wtot = wq.values.sum
    val budget = wq.view
      .mapValues(w => ((tokS.values.sum / 5) * w / wtot).toLong).toMap
    val gotBudget = rows.groupBy(_.getAs[String]("source")).view
      .mapValues(_.head.getAs[Long]("budget_toks")).toMap
    gotBudget.foreach { case (src, got) =>
      assert(got === budget(src), s"budget for $src")
    }
    // kept rows are exactly the maximal greedy prefix: every kept row
    // starts under the line, and if any doc was excluded the last kept
    // row reaches or crosses it
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, g) =>
      val cums = g.map(r =>
        (r.getAs[Long]("cum_toks"), r.getAs[Long]("n_toks"))).sortBy(_._1)
      cums.foreach { case (cum, n) => assert(cum - n < budget(src)) }
      if (g.length < docs.count(_._1 == src))
        assert(cums.last._1 >= budget(src), s"non-maximal prefix for $src")
    }
  }
}
