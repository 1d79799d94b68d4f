package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CosineSimilarity

/** Analytics operators: pivot/percentile/array/as-of/sessionization. */
class AnalyticsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def run(name: String) =
    Registry.byName(name).run(spark, TestSpark.sf)

  test("pivot columns reconcile with the plain group-by") {
    val p = run("q_pivot").collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("F") + r.getAs[Double]("O"))).toMap
    val flat = Tables.load(spark, TestSpark.sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("q")).toMap
    p.foreach { case (k, v) => assert(math.abs(v - flat(k)) < 1e-6) }
  }

  test("percentiles are ordered and within the data range") {
    run("q_percentile").collect().foreach { r =>
      val Seq(p25, p50, p75, p95) =
        Seq("p25", "p50", "p75", "p95").map(r.getAs[Double])
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
      assert(p25 >= 1.0 && p95 <= 50.0)
    }
  }

  test("as-of join matches are at-or-before and are the latest purchase") {
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val out = run("q_asof_join").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Double]("gap_seconds") >= 0.0))
    // independently verify one match with a driver-side scan
    val first = out.head
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val errors = ev.filter(col("event_type") === "error")
      .filter(col("event_id") === first.getAs[Long]("event_id"))
      .select("user_id", "ts").collect().head
    val best = purchases
      .filter(p => p._2 == errors.getLong(0) && p._3 <= errors.getTimestamp(1).getTime)
      .maxBy(_._3)
    assert(best._1 === first.getAs[Long]("p_event_id"))
  }

  test("window and stateful sessionization agree exactly") {
    val a = run("q_sessionize").collect().map(_.toString).toSeq
    val b = run("sessionize_stateful").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("session indexes start at 0 and increase by at most 1") {
    val rows = run("q_sessionize")
      .orderBy("user_id", "event_id").collect()
      .groupBy(_.getAs[Long]("user_id"))
    rows.values.foreach { evs =>
      val idx = evs.map(_.getAs[Long]("session_idx"))
      assert(idx.min === 0L)
    }
  }

  test("native cosine expression equals the HOF formulation bit-for-bit") {
    val df = Seq(
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, -0.6f)))
      .toDF("a", "b")
    val native = df.select(CosineSimilarity(spark, col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    val hof = df.select(graft.functions.EngineFns.cosine(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(native === hof)
  }

  test("approx sketches stay within tolerance of the exact companion query") {
    val exact = run("q_sketch_exact").collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        (r.getAs[Long]("exact_cust").toDouble, r.getAs[Double]("exact_median")))
      .toMap
    val sketches = graft.operators.Analytics
      .approxSketchesRaw(spark, TestSpark.sf).collect()
    assert(sketches.length === exact.size)
    sketches.foreach { r =>
      val (exactC, exactM) = exact(r.getAs[String]("o_orderstatus"))
      val approxC = r.getAs[Long]("approx_cust").toDouble
      assert(math.abs(approxC - exactC) / exactC < 0.1,
        s"HLL error too large: $approxC vs $exactC")
      val approxM = r.getAs[Double]("approx_median")
      assert(math.abs(approxM - exactM) / exactM < 0.05,
        s"median sketch error too large: $approxM vs $exactM")
    }
    // the driver-facing registry row must report every flag TRUE (its
    // oracle hard-codes TRUE, so a false here is a CORRECTNESS fail)
    run("q_approx_sketches").collect().foreach { r =>
      assert(r.getAs[Boolean]("hll_ok") && r.getAs[Boolean]("median_rank_ok"),
        s"validity flag false in driver-facing row: $r")
    }
  }

  test("range join counts only lineitems inside the window") {
    val out = run("q_range_join").collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_fast_lines")).sum
    val all = Tables.load(spark, TestSpark.sf, "lineitem")
      .join(Tables.load(spark, TestSpark.sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(total < all) // the range predicate must exclude something
  }

  test("stream_dedup equals batch distinct counts") {
    val streamed = streaming.StreamOps.streamingDedup(spark, TestSpark.sf)
      .collect().map(_.toString).toSeq
    val batch = Tables.load(spark, TestSpark.sf, "events")
      .groupBy("event_type").agg(countDistinct("event_id").as("n"))
      .orderBy("event_type").collect().map(_.toString).toSeq
    assert(streamed === batch)
  }

  test("count-min estimates never undercount and stay inside the bound") {
    val out = graft.operators.Analytics
      .cmsFreqRaw(spark, TestSpark.sf).collect()
    assert(out.length === 20)
    val n = Tables.load(spark, TestSpark.sf, "lineitem").count()
    out.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("n_est")
      assert(est >= exact, s"CMS may never undercount: $r")
      // deterministic sketch, loose bound (4x the e*N/w guarantee)
      assert(est - exact <= 8 * n / 1024 + 1, s"overestimate too large: $r")
    }
    // the driver-facing registry row folds the bound into cms_ok, whose
    // oracle hard-codes TRUE — assert it holds on the engine side too
    run("q_cms_freq").collect().foreach { r =>
      assert(r.getAs[Boolean]("cms_ok"), s"cms_ok false: $r")
    }
    // the estimates must agree with a direct recount for the top key
    val top = out.head
    val direct = Tables.load(spark, TestSpark.sf, "lineitem")
      .filter(col("l_partkey") === top.getAs[Long]("l_partkey")).count()
    assert(top.getAs[Long]("n_exact") === direct)
  }

  test("bpe encode round-trips: expanding merges restores the corpus") {
    val enc = run("text_bpe_encode").collect()
    val orig = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc.length === orig.size)
    enc.foreach { r =>
      val merged = r.getAs[String]("text_bpe")
      assert(merged.replace('~', ' ') === orig(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_tokens") ===
        merged.split(" ", -1).length.toLong)
    }
    // the merges must actually fire somewhere in the corpus
    assert(enc.exists(_.getAs[String]("text_bpe").contains("~")))
  }

  test("transition matrix rows are distributions over observed bigrams") {
    val rows = run("q_transition_matrix").collect()
    assert(rows.nonEmpty)
    // each src row's probabilities sum to exactly its count shares
    rows.groupBy(_.getAs[String]("src")).foreach { case (src, g) =>
      val pSum = g.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-9, s"src=$src p-sum=$pSum")
    }
    // total transition count = events - one tail event per user
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum === expected)
  }

  test("ab test counts reconcile and the z statistic is finite") {
    val r = run("q_ab_test").collect()
    assert(r.length === 1)
    val row = r.head
    val (nA, cA) = (row.getAs[Long]("n_a"), row.getAs[Long]("c_a"))
    val (nB, cB) = (row.getAs[Long]("n_b"), row.getAs[Long]("c_b"))
    val users = Tables.load(spark, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    assert(nA + nB === users)
    assert(cA >= 0 && cA <= nA && cB >= 0 && cB <= nB)
    // the cutoff keeps both arms non-degenerate at every SF, so the
    // pooled z denominator is nonzero and z is a real number
    assert(!row.getAs[Double]("z").isNaN &&
      !row.getAs[Double]("z").isInfinite)
    assert(row.getAs[Double]("p_a") === cA.toDouble / nA.toDouble)
  }

  test("decile lift replays locally and fully cumulates to lift 1.0") {
    val out = run("q_decile_lift").collect()
    // local replay: per-user score/conv, exclusive-prefix deciles
    val users = Tables.load(spark, TestSpark.sf, "events")
      .groupBy("user_id").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("score"),
        max(when(col("event_type") === "purchase" &&
          col("value") >= 99.0, 1L).otherwise(0L)).as("conv"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = users.length.toLong
    def decileOf(score: Long): Long =
      users.count(_._1 < score).toLong * 10L / n
    val expect = users.groupBy(u => decileOf(u._1)).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    out.foreach { r =>
      val d = r.getAs[Long]("decile")
      assert((r.getAs[Long]("n_users"), r.getAs[Long]("n_conv"))
        === expect(d), s"decile $d")
    }
    assert(out.map(_.getAs[Long]("n_users")).sum === n)
    // rows come best-decile first; the last row cumulates everyone, so
    // its lift is exactly (conv_total·n)/(n·conv_total) = 1.0
    assert(out.last.getAs[Long]("cum_users") === n)
    assert(out.last.getAs[Double]("cum_lift") === 1.0)
    // cumulative counts are monotone down the table
    out.map(_.getAs[Long]("cum_users")).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a < b)
      case _ =>
    }
  }

  test("time-to-convert deciles replay from raw per-user deltas") {
    val row = run("q_time_to_convert").head()
    val ev = Tables.loadEvents(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstClick = ev.filter(_._2 == "click").groupBy(_._1)
      .view.mapValues(_.map(_._3).min)
    val deltas = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, us) =>
        firstClick.get(u).filter(us >= _).map(c => (u, us - c))
      }
      .groupBy(_._1).values.map(_.map(_._2).min / 1000000L).toSeq.sorted
    val n = deltas.length.toLong
    assert(row.getAs[Long]("n_conv") === n)
    (1 to 9).foreach { k =>
      val expect = deltas.find(d =>
        deltas.count(_ <= d).toLong * 10 >= k * n).get
      assert(row.getAs[Long](s"p${k * 10}_s") === expect, s"decile $k")
    }
  }

  test("RFM segments cover every purchasing user and all the money") {
    val out = run("q_rfm_segmentation").collect()
    val p = Tables.loadEvents(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_.getAs[Long]("n_users")).sum ===
      p.map(_._1).distinct.length.toLong)
    assert(out.map(_.getAs[Long]("segment_cents")).sum === p.map(_._2).sum)
    out.foreach { r =>
      Seq("r_code", "f_code", "m_code").foreach { c =>
        assert(r.getAs[Long](c) >= 1L && r.getAs[Long](c) <= 3L, c)
      }
      assert(r.getAs[Long]("n_users") > 0L)
    }
    // tertile balance: each code of each dimension holds ~n/3 users
    // (exact thirds are impossible with ties; allow a wide margin)
    val n = out.map(_.getAs[Long]("n_users")).sum
    Seq("r_code", "f_code", "m_code").foreach { c =>
      val byCode = out.groupBy(_.getAs[Long](c)).view
        .mapValues(_.map(_.getAs[Long]("n_users")).sum)
      byCode.foreach { case (_, cnt) =>
        assert(cnt >= n / 6 && cnt <= n * 2 / 3, s"$c lopsided: $byCode")
      }
    }
  }

  test("funnel paths are valid event-type chains covering <= all users") {
    val out = run("q_funnel_paths").collect()
    val types = Tables.load(spark, TestSpark.sf, "events")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    val nUsers = Tables.load(spark, TestSpark.sf, "events")
      .select("user_id").distinct().count()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      r.getAs[String]("path").split('>').foreach(t =>
        assert(types.contains(t), s"unknown type in ${r.getAs[String]("path")}"))
    }
    assert(out.map(_.getAs[Long]("n_users")).sum <= nUsers)
    // ordering: counts non-increasing
    val cs = out.map(_.getAs[Long]("n_users")).toSeq
    assert(cs === cs.sorted.reverse)
  }

  test("cohort LTV accumulates exactly the post-signup purchase cents") {
    val out = run("q_cohort_ltv").collect()
    val ev = Tables.loadEvents(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val signup = ev.filter(_._2 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._3).min)
    val postSignupCents = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, us, c) =>
        signup.get(u).filter(us >= _).map(_ => c)
      }.sum
    assert(out.map(_.getAs[Long]("cents")).sum === postSignupCents)
    // per cohort: cum_cents is the running sum over age and the final
    // row carries the cohort's whole revenue; ltv = cum/(users*100)
    out.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("age_week"))
      val runs = sorted.scanLeft(0L)(_ + _.getAs[Long]("cents")).tail
      assert(sorted.map(_.getAs[Long]("cum_cents")).toSeq === runs.toSeq)
      sorted.foreach { r =>
        assert(r.getAs[Double]("ltv_per_user") ===
          r.getAs[Long]("cum_cents").toDouble /
            (r.getAs[Long]("cohort_users") * 100L).toDouble)
      }
    }
  }

  test("DAU/MAU replays locally and stickiness is bounded by 1") {
    val out = run("q_dau_mau").collect()
    val ud = Tables.loadEvents(spark, TestSpark.sf)
      .select(col("user_id"),
        (unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).distinct.sorted
    assert(out.map(_.getAs[Long]("day")).toSeq === days.toSeq)
    out.foreach { r =>
      val d = r.getAs[Long]("day")
      val dau = ud.filter(_._2 == d).map(_._1).distinct.length.toLong
      val mau = ud.filter(p => p._2 >= d - 27 && p._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("dau") === dau)
      assert(r.getAs[Long]("mau") === mau)
      assert(r.getAs[Double]("stickiness") === dau.toDouble / mau.toDouble)
      assert(r.getAs[Double]("stickiness") <= 1.0)
    }
  }

  test("HLL DAU/MAU: exact twin matches q_dau_mau, every sketch flag ok") {
    // the sketch-merge variant must carry the SAME exact anchors as the
    // user-grain form, and the per-day union estimate must land inside
    // the 5%+32 validity band on every day (a dropped or double-counted
    // day sketch would push it out)
    val exact = run("q_dau_mau").collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("mau"))).toMap
    val hll = run("q_dau_mau_hll").collect()
    assert(hll.nonEmpty)
    assert(hll.map(_.getAs[Long]("day")).toSet === exact.keySet)
    hll.foreach { r =>
      val (dau, mau) = exact(r.getAs[Long]("day"))
      assert(r.getAs[Long]("dau") === dau)
      assert(r.getAs[Long]("mau_exact") === mau)
      assert(r.getAs[Boolean]("hll_ok"),
        s"day ${r.getAs[Long]("day")}: HLL MAU estimate outside 5%+32 band")
    }
  }

  test("attribution partitions every purchase across view/click/none") {
    val rows = Registry.byName("q_attribution").run(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    val channels = rows.map(_.getAs[String]("channel")).toSet
    assert(channels.subsetOf(Set("view", "click", "none")))
    // attribution is a partition of the purchases — nothing dropped,
    // nothing double-counted
    val nPurch = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === nPurch)
    // spot-replay one user's purchases against the last-touch rule
    val ev = Tables.loadEvents(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val manual = byUser.values.flatMap { g =>
      val sorted = g.sortBy(x => (x._3, x._4))
      sorted.zipWithIndex.collect { case ((_, "purchase", _, _), i) =>
        sorted.take(i).reverse
          .collectFirst { case (_, t @ ("view" | "click"), _, _) => t }
          .getOrElse("none")
      }
    }.toSeq
    val gotByChannel = rows.map(r =>
      r.getAs[String]("channel") -> r.getAs[Long]("n_purchases")).toMap
    Seq("view", "click", "none").foreach { ch =>
      assert(gotByChannel.getOrElse(ch, 0L) ===
        manual.count(_ == ch).toLong, s"channel $ch")
    }
  }

  test("clamped balance replays the max(0, y+delta) recurrence exactly") {
    val rows = Registry.byName("q_clamped_balance")
      .run(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("delta_cents"), r.getAs[Long]("balance_cents")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, b) => assert(b >= 0L, "overdrawn") }
    // the closed form must equal the literal per-row recurrence; rows
    // arrive ordered (user_id, event_id) and event time order matches
    // event_id order within a user in this corpus only incidentally,
    // so replay in the operator's own (ts, event_id) order
    val order = Tables.loadEvents(spark, TestSpark.sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byBal = rows.map(t => (t._1, t._2) -> t._4).toMap
    rows.groupBy(_._1).foreach { case (u, g) =>
      var y = 0L
      g.sortBy(t => (order((u, t._2)), t._2)).foreach {
        case (_, eid, d, _) =>
          y = math.max(0L, y + d)
          assert(byBal((u, eid)) === y, s"user $u event $eid")
      }
    }
    // the clamp must actually fire somewhere (purchases exceed credits
    // for some user) or the operator degenerates to a plain cumsum
    val clampFires = rows.groupBy(_._1).exists { case (u, g) =>
      val seq = g.sortBy(t => (order((u, t._2)), t._2))
      var y = 0L
      seq.exists { case (_, _, d, _) =>
        val fired = y + d < 0L; y = math.max(0L, y + d); fired }
    }
    assert(clampFires, "fixture never exercises the floor")
  }
}
