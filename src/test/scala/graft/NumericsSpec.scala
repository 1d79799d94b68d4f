package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the numeric-aggregate / time-series / link-
  * prediction batch — properties the oracle hash can't state directly. */
class NumericsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def run(name: String) =
    Registry.byName(name).run(spark, TestSpark.sf)

  test("ewma of a user's first event is the event value itself") {
    val firsts = Tables.loadEvents(spark, TestSpark.sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("us").asc, col("event_id").asc)))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("value"))
    val joined = run("q_ewma")
      .join(firsts, "event_id")
      .filter(col("ewma") =!= col("value"))
    assert(joined.count() === 0,
      "a single-term EWMA (128*x / 128) must equal x exactly")
  }

  test("twap of one user replays from raw events") {
    val raw = Tables.loadEvents(spark, TestSpark.sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .filter(col("user_id") === 0L)
      .orderBy("us", "event_id")
      .collect()
    assume(raw.length >= 2)
    var svw = BigInt(0); var span = 0L
    for (i <- 0 until raw.length - 1) {
      val dt = raw(i + 1).getLong(1) - raw(i).getLong(1)
      val cents = BigDecimal(raw(i).getDouble(3))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100
      svw += cents.toBigInt * dt
      span += dt
    }
    val expected = svw.toDouble / span.toDouble / 100.0
    val got = run("q_twap").filter(col("user_id") === 0L)
      .select("twap").head().getDouble(0)
    assert(got === expected)
  }

  test("NOT IN nullable probe: negative-balance customers always drop") {
    val out = run("q_null_aware_anti")
    val neg = Tables.load(spark, TestSpark.sf, "customer")
      .filter(col("c_acctbal") < 0).select("c_custkey")
    assert(out.join(neg, "c_custkey").count() === 0,
      "NULL probe keys must never satisfy NOT IN against a non-empty set")
    assert(out.count() > 0)
  }

  test("mode is the max-count value with smallest-value tie-break") {
    val counts = Tables.load(spark, TestSpark.sf, "lineitem")
      .groupBy("l_returnflag", "l_linenumber").count()
      .collect()
      .groupBy(_.getString(0))
    run("q_mode").collect().foreach { r =>
      val grp = counts(r.getString(0)).map(x => (x.getInt(1), x.getLong(2)))
      val best = grp.filter(_._2 == grp.map(_._2).max).map(_._1).min
      assert(r.getLong(1) === best.toLong)
      assert(r.getLong(2) === grp.map(_._2).max)
    }
  }

  test("MRL recall is a fraction of the full top-k and prefix dims really truncate") {
    val rows = run("emb_mrl_eval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nFull, nHit, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nHit <= nFull && nHit >= 0)
      assert(rec === nHit.toDouble / nFull.toDouble)
    }
  }

  test("random-walk steps traverse real near-dup edges") {
    val pairs = operators.Dedup
      .jaccardPairs(operators.Dedup.shingled(spark, TestSpark.sf))
      .filter(col("jaccard") >= operators.Dedup.JaccardThreshold)
      .select("a_id", "b_id")
    val edges = pairs
      .union(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .toDF("u", "v")
    val walk = run("graph_random_walk")
    val bad = walk
      .join(edges, walk("doc_id") === edges("u") &&
        walk("step1") === edges("v"), "left_anti")
    assert(bad.count() === 0, "step1 must be a neighbor of the start node")
  }

  test("peak concurrency: day-partitioned prefix sum equals a global sweep") {
    // brute-force sweep: one globally sorted pass over all session
    // deltas — the semantics the distributed two-pass form must match,
    // including sessions that span midnight (carry correctness)
    val sess = Tables.loadEvents(spark, TestSpark.sf)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("s"),
        unix_micros(col("sw.end")).as("e"))
      .collect()
    val deltas = sess.flatMap(r => Seq(
        (r.getLong(1), 1L, r.getLong(0)), (r.getLong(2), -1L, r.getLong(0))))
      .sortBy(d => (d._1, d._2, d._3))
    val DayUs = 86400000000L
    var conc = 0L
    val peak = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    for ((us, d, _) <- deltas) {
      conc += d
      val day = (us / DayUs) * DayUs
      val (p, at) = peak.getOrElse(day, (Long.MinValue, 0L))
      if (conc > p) peak(day) = (conc, us)
    }
    val got = run("q_peak_concurrency").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (p, at) = peak(r.getLong(0))
      assert(r.getLong(1) === p, s"peak mismatch on day ${r.getLong(0)}")
      assert(r.getLong(3) === at, s"peak time mismatch on day ${r.getLong(0)}")
    }
    assert(got.length === peak.size)
  }

  test("keywords: exactly ranks 1..3 with non-increasing tfidf per doc") {
    import spark.implicits._
    val perDoc = run("text_keywords")
      .groupBy("doc_id")
      .agg(collect_list(struct(col("rank"), col("tfidf_q"))).as("ks"))
      .as[(Long, Seq[(Long, Long)])].collect()
    perDoc.foreach { case (_, ks) =>
      val sorted = ks.sortBy(_._1)
      assert(sorted.map(_._1) === (1L to sorted.length))
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 >= b._2)
        case _ =>
      }
    }
  }

  test("KS drift statistic equals a local exact-integer replay") {
    val row = Registry.byName("q_ks_drift").run(spark, TestSpark.sf).head()
    val vals = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase")
      .select((col("value").cast("decimal(12,2)") * 100).cast("long"),
        pmod(col("user_id"), lit(2L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = vals.filter(_._2 == 0L).map(_._1).sorted
    val b = vals.filter(_._2 == 1L).map(_._1).sorted
    val cuts = (a ++ b).distinct.sorted
    // exact-integer maximum of |cA*nB - cB*nA|, min-cents tie-break
    val best = cuts.map { c =>
      val ca = a.count(_ <= c).toLong
      val cb = b.count(_ <= c).toLong
      (math.abs(ca * b.length - cb * a.length), c)
    }.minBy { case (num, c) => (-num, c) }
    assert(row.getAs[Long]("n_a") === a.length.toLong)
    assert(row.getAs[Long]("n_b") === b.length.toLong)
    assert(row.getAs[Long]("d_num") === best._1)
    assert(row.getAs[Long]("d_at_cents") === best._2)
    assert(row.getAs[Double]("d_stat") ===
      best._1.toDouble / (a.length.toLong * b.length.toLong).toDouble)
  }

  test("IQR outliers equal a local order-statistic replay") {
    val rows = run("q_iqr_outliers").collect()
    val byType = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2).sorted }
    assert(rows.map(_.getAs[String]("event_type")).toSet === byType.keySet)
    rows.foreach { r =>
      val vals = byType(r.getAs[String]("event_type"))
      val n = vals.length
      // k-th order statistic, k = ceil(n/4) / ceil(3n/4), 1-indexed
      val q1 = vals(((n + 3) / 4) - 1)
      val q3 = vals(((3 * n + 3) / 4) - 1)
      val iqr = q3 - q1
      val out = vals.count(c => 2 * c < 2 * q1 - 3 * iqr ||
        2 * c > 2 * q3 + 3 * iqr)
      assert(r.getAs[Long]("n") === n.toLong)
      assert(r.getAs[Long]("q1_cents") === q1)
      assert(r.getAs[Long]("q3_cents") === q3)
      assert(r.getAs[Long]("iqr_cents") === iqr)
      assert(r.getAs[Long]("n_outliers") === out.toLong)
    }
  }

  test("ROC-AUC equals a local pair-counting replay and is bounded") {
    val row = Registry.byName("q_roc_auc").run(spark, TestSpark.sf).head()
    val vals = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select((col("value").cast("decimal(12,2)") * 100).cast("long"),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pos = vals.filter(_._2 == 1L).map(_._1)
    val neg = vals.filter(_._2 == 0L).map(_._1)
    // U in half-units straight from the definition: 2 per beaten
    // negative, 1 per tie — no ranks, no CDF, so a prefix-sum bug in
    // the operator cannot be replicated here
    var u2 = 0L
    pos.foreach { p =>
      u2 += 2L * neg.count(_ < p) + neg.count(_ == p)
    }
    assert(row.getAs[Long]("n_pos") === pos.length.toLong)
    assert(row.getAs[Long]("n_neg") === neg.length.toLong)
    assert(row.getAs[Long]("u2") === u2)
    val auc = row.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(auc ===
      u2.toDouble / (2L * pos.length.toLong * neg.length.toLong).toDouble)
  }

  test("chi-square replays locally in exact integers") {
    val row = Registry.byName("q_chisq").run(spark, TestSpark.sf).head()
    val cells = Tables.load(spark, TestSpark.sf, "events")
      .select(col("event_type"), pmod(col("user_id"), lit(2L)).as("arm"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = cells.length.toLong
    val byCell = cells.groupBy(identity).view.mapValues(_.length.toLong)
    val rowT = cells.groupBy(_._1).view.mapValues(_.length.toLong)
    val colT = cells.groupBy(_._2).view.mapValues(_.length.toLong)
    val chi2q = byCell.map { case ((t, a), o) =>
      val d = BigInt(o) * n - BigInt(rowT(t)) * colT(a)
      (d * d * 1000000000L / (BigInt(n) * rowT(t) * colT(a))).toLong
    }.sum
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Long]("n_cells") === byCell.size.toLong)
    assert(row.getAs[Long]("chi2_q") === chi2q)
    assert(row.getAs[Double]("chi2") === chi2q.toDouble / 1e9)
  }

  test("hist drift TV numerator replays and vanishes on identical arms") {
    val out = Registry.byName("q_hist_drift").run(spark, TestSpark.sf)
      .collect()
    val vals = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase")
      .select((col("value").cast("decimal(12,2)") * 100).cast("long"),
        pmod(col("user_id"), lit(2L)))
      .collect().map(r => (math.min(r.getLong(0) / 5000L, 9L), r.getLong(1)))
    val nA = vals.count(_._2 == 0L).toLong
    val nB = vals.count(_._2 == 1L).toLong
    val tvTotal = out.map(_.getAs[Long]("tv_num")).sum
    val expected = vals.groupBy(_._1).values.map { g =>
      val cA = g.count(_._2 == 0L).toLong
      val cB = g.count(_._2 == 1L).toLong
      math.abs(cA * nB - cB * nA)
    }.sum
    assert(tvTotal === expected)
    out.foreach { r =>
      assert(r.getAs[Long]("n_a") === nA)
      assert(r.getAs[Long]("n_b") === nB)
      assert(r.getAs[Double]("tv") ===
        tvTotal.toDouble / (2L * nA * nB).toDouble)
      assert(r.getAs[Double]("tv") >= 0.0 && r.getAs[Double]("tv") <= 1.0)
    }
    // identity check: an arm compared against itself has zero TV
    assert(vals.groupBy(_._1).values.map { g =>
      val cA = g.count(_._2 == 0L).toLong
      math.abs(cA * nA - cA * nA)
    }.sum === 0L)
  }

  test("changepoint equals a local argmax over every split") {
    val row = Registry.byName("q_changepoint").run(spark, TestSpark.sf).head()
    val daily = Tables.loadEvents(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .select((unix_micros(col("ts")) / lit(86400000000L)).cast("long"))
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val total = daily.map(_._2).sum
    val nDays = daily.length.toLong
    val splits = daily.zipWithIndex.dropRight(1).map { case ((day, _), i) =>
      val sD = daily.take(i + 1).map(_._2).sum
      (math.abs(sD * nDays - total * (i + 1)), day, i + 1L, sD)
    }
    val best = splits.minBy { case (num, day, _, _) => (-num, day) }
    assert(row.getAs[Long]("split_day") === best._2)
    assert(row.getAs[Long]("split_idx") === best._3)
    assert(row.getAs[Long]("stat_num") === best._1)
    assert(row.getAs[Double]("mean_before") ===
      best._4.toDouble / best._3.toDouble)
  }

  test("forecast backtest replays the lag baselines exactly") {
    val out = Registry.byName("q_forecast_backtest")
      .run(spark, TestSpark.sf).collect()
    val daily = Tables.loadEvents(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .select((unix_micros(col("ts")) / lit(86400000000L)).cast("long"))
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val byIdx = daily.map(_._2).toIndexedSeq
    var sae7 = 0L; var n7 = 0L; var sae1 = 0L; var n1 = 0L
    daily.indices.foreach { i =>
      if (i >= 7) { sae7 += math.abs(byIdx(i) - byIdx(i - 7)); n7 += 1 }
      if (i >= 1) { sae1 += math.abs(byIdx(i) - byIdx(i - 1)); n1 += 1 }
    }
    assert(out.length === daily.length)
    out.zip(daily).foreach { case (r, (day, n)) =>
      assert(r.getAs[Long]("day") === day)
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Double]("mae7") === sae7.toDouble / n7.toDouble)
      assert(r.getAs[Double]("mae1") === sae1.toDouble / n1.toDouble)
    }
    // spot-check one lag-7 row
    val late = out.drop(7).head
    val i = out.indexOf(late)
    assert(late.getAs[Long]("f7") === byIdx(i - 7))
    assert(late.getAs[Long]("err7") === math.abs(byIdx(i) - byIdx(i - 7)))
  }

  test("Welch t replays locally from exact per-arm moments") {
    val row = Registry.byName("q_welch_ttest").run(spark, TestSpark.sf).head()
    val cents = Tables.load(spark, TestSpark.sf, "events")
      .filter(col("event_type") === "purchase")
      .select(pmod(col("user_id"), lit(2L)),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def moments(arm: Long): (Long, BigInt, BigInt) = {
      val v = cents.filter(_._1 == arm).map(_._2)
      (v.length.toLong,
        v.map(BigInt(_)).sum,
        v.map(x => BigInt(x) * BigInt(x)).sum)
    }
    val (na, sa, qa) = moments(0L)
    val (nb, sb, qb) = moments(1L)
    assert(row.getAs[Long]("n_a") === na)
    assert(row.getAs[Long]("n_b") === nb)
    val meanA = sa.toDouble / na.toDouble
    val meanB = sb.toDouble / nb.toDouble
    assert(row.getAs[Double]("mean_a") === meanA)
    assert(row.getAs[Double]("mean_b") === meanB)
    // same expression tree as the operator: exact centered numerator,
    // then the two divisions in the written order
    val va = (BigInt(na) * qa - sa * sa).toDouble / (na * (na - 1)).toDouble / na.toDouble
    val vb = (BigInt(nb) * qb - sb * sb).toDouble / (nb * (nb - 1)).toDouble / nb.toDouble
    val tExp = (meanA - meanB) / math.sqrt(va + vb)
    val dfExp = (va + vb) * (va + vb) /
      (va * va / (na - 1).toDouble + vb * vb / (nb - 1).toDouble)
    assert(row.getAs[Double]("t_stat") === tExp)
    assert(row.getAs[Double]("df") === dfExp)
    // df is bounded by the classic Welch bracket
    assert(dfExp >= math.min(na - 1, nb - 1).toDouble - 1e-9)
    assert(dfExp <= (na + nb - 2).toDouble + 1e-9)
  }

  test("poisson bootstrap CI replays the ladder draws exactly") {
    val rows = Registry.byName("q_bootstrap_ci").run(spark, TestSpark.sf)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("total_cents"), r.getAs[Double]("boot_mean_cents"),
          r.getAs[Long]("ci_lo_cents"), r.getAs[Long]("ci_hi_cents")))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { case (t, (total, mean, lo, hi)) =>
      assert(lo < hi, s"$t: degenerate CI")
      assert(lo <= total && total <= hi,
        s"$t: exact total outside the 90% CI on this fixed draw")
      assert(mean > 0.0)
    }
    // full local replay of one event type: ladder, draws, 32 sums
    def hash31(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2147483647L
    }
    val ladder = {
      var cdf = 0.0; var fact = 1.0
      (0 to 8).map { k =>
        if (k > 0) fact *= k
        cdf += math.exp(-1.0) / fact
        (math.round(cdf * 1048576.0), k.toLong)
      }
    }
    val ev = Tables.loadEvents(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sums = (0 until 32).map { b =>
      ev.map { case (eid, c) =>
        val u = hash31(s"boot|$b|$eid") % 1048576L
        val w = ladder.find(u < _._1).map(_._2).getOrElse(8L)
        w * c
      }.sum
    }
    val sorted = sums.sorted
    val (total, mean, lo, hi) = rows("purchase")
    assert(total === ev.map(_._2).sum)
    assert(mean === sums.sum.toDouble / 32.0)
    assert(lo === sorted(1), "2nd order statistic")
    assert(hi === sorted(30), "31st order statistic")
  }
}
