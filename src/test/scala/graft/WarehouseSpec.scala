package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent cross-checks for the warehouse flagships (TPC-H Q5/Q18,
  * recursive CTE, hopping windows, interval overlap, correlation matrix,
  * heavy hitters) on the smoke corpus. */
class WarehouseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def run(name: String) =
    Registry.byName(name).run(spark, TestSpark.sf)

  test("q_tpch_q5 equals the literal SQL-text formulation") {
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
      .foreach(n =>
        Tables.load(spark, TestSpark.sf, n).createOrReplaceTempView(n))
    val sqlForm = spark.sql("""
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (CAST(1 AS DECIMAL(12,2)) -
                  CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey
                        AND c_nationkey = s_nationkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name""").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = run("q_tpch_q5").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === sqlForm)
  }

  test("q_tpch_q6 equals the literal SQL-text formulation") {
    Tables.load(spark, TestSpark.sf, "lineitem")
      .createOrReplaceTempView("lineitem")
    val sqlForm = spark.sql("""
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
             count(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.04 AND 0.08
        AND l_quantity < 24""").collect()(0)
    val got = run("q_tpch_q6").collect()(0)
    assert(got.getAs[Long]("n") === sqlForm.getAs[Long]("n"))
    assert(got.getAs[Long]("n") > 0)
    assert(got.getAs[Double]("revenue") === sqlForm.getAs[Double]("revenue"))
  }

  test("q_tpch_q18 rows all exceed the quantity threshold, capped at 100") {
    val rows = run("q_tpch_q18").collect()
    assert(rows.length <= 100)
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("total_qty") > 180.0))
    // aggregate-then-join must agree with a direct per-order recompute
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val byOrder = li.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(byOrder(r.getAs[Long]("o_orderkey")) ===
        r.getAs[Double]("total_qty"))
    }
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q_recursive_cte depth equals floor(log2(key)) closed form") {
    val rows = run("q_recursive_cte").collect()
    val parts = Tables.load(spark, TestSpark.sf, "part").count()
    assert(rows.length === parts)
    rows.foreach { r =>
      val k = r.getAs[Long]("p_partkey")
      val expected =
        if (k <= 1) 0L else (63 - java.lang.Long.numberOfLeadingZeros(k)).toLong
      assert(r.getAs[Long]("depth") === expected, s"key $k")
    }
  }

  test("q_hopping_window counts every event exactly twice") {
    val out = run("q_hopping_window")
    val events = Tables.load(spark, TestSpark.sf, "events").count()
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total === 2 * events)
    // every window start sits on a 30-minute boundary
    val misaligned = out
      .filter(unix_timestamp(col("win_start")) % 1800 =!= 0).count()
    assert(misaligned === 0)
  }

  test("q_overlap_activity covers at least the users inside each window") {
    val out = run("q_overlap_activity").collect()
    assert(out.nonEmpty && out.length <= 8)
    val e = Tables.load(spark, TestSpark.sf, "events")
    out.foreach { r =>
      val winStart = r.getAs[java.sql.Timestamp]("win_start")
      assert(r.getAs[Long]("n_err") >= 1)
      // users with an event inside the hour necessarily have an
      // overlapping same-day span, so they lower-bound the result
      val inWindow = e
        .filter(date_trunc("hour", col("ts")) === lit(winStart))
        .select("user_id").distinct().count()
      assert(r.getAs[Long]("n_users_active") >= inWindow)
    }
  }

  test("q_corr_matrix agrees with Spark's streaming corr/stddev") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val builtin = li.groupBy("l_returnflag")
      .agg(corr("l_quantity", "l_extendedprice").as("c"),
        covar_samp("l_quantity", "l_extendedprice").as("cv"),
        stddev_samp("l_quantity").as("sq"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    run("q_corr_matrix").collect().foreach { r =>
      val (c, cv, sq) = builtin(r.getString(0))
      assert(math.abs(r.getAs[Double]("corr_qty_price") - c) < 1e-5)
      assert(math.abs(r.getAs[Double]("covar_qty_price") - cv) < 1e-3)
      assert(math.abs(r.getAs[Double]("stddev_qty") - sq) < 1e-5)
    }
  }

  test("q_skyline equals brute-force Pareto dominance") {
    val parts = Tables.load(spark, TestSpark.sf, "part")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = parts.filter { case (_, price, size) =>
      !parts.exists { case (_, p2, s2) =>
        p2 <= price && s2 >= size && (p2 < price || s2 > size)
      }
    }.map(_._1).sorted.toSeq
    val got = run("q_skyline").collect().map(_.getAs[Long]("p_partkey")).toSeq
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("q_sql_udf result equals the DataFrame-API computation") {
    val got = run("q_sql_udf").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = Tables.load(spark, TestSpark.sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") -
            col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("net"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(got === direct)
  }

  test("q_constraints: clean corpus yields zero violations, full coverage") {
    val rows = run("q_constraints").collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_violations") === 0L, r.getString(0))
    }
    val checked = rows.map(r => r.getString(0) ->
      (if (r.isNullAt(2)) -1L else r.getAs[Long]("n_checked"))).toMap
    val li = Tables.load(spark, TestSpark.sf, "lineitem").count()
    assert(checked("lineitem_qty_domain") === li)
    assert(checked("lineitem_orderkey_fk") === -1L) // anti-join rule
  }

  test("q_higher_order token stats match JVM string ops per document") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    run("q_higher_order").collect().foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("n_long") === toks.count(_.length > 4).toLong)
      assert(r.getAs[Long]("sum_len") === toks.map(_.length).sum.toLong)
      assert(r.getAs[Boolean]("has_the") === toks.contains("the"))
      assert(r.getAs[String]("head3") ===
        toks.take(3).map(_.toUpperCase).mkString("-"))
    }
  }

  test("stream_foreach_merge equals the stateful latest-by-key view") {
    val a = Registry.byName("stream_foreach_merge")
      .run(spark, TestSpark.sf).collect().map(_.toString).toSeq
    val b = Registry.byName("stream_latest_by_key")
      .run(spark, TestSpark.sf).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("q_heavy_hitters top part matches a direct recount") {
    val rows = run("q_heavy_hitters").collect()
    assert(rows.length === 20)
    val counts = rows.map(_.getAs[Long]("n_lines"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val top = rows.head
    val direct = li.filter(col("l_partkey") === top.getAs[Long]("l_partkey"))
      .count()
    assert(direct === top.getAs[Long]("n_lines"))
    // nothing outside the returned set may beat the 20th count
    val floor20 = counts.last
    val better = li.groupBy("l_partkey").count()
      .filter(col("count") > floor20).count()
    assert(better <= 20)
  }

  test("erasure audit partitions every event exactly once") {
    val out = run("q_erasure").collect()
    val ev = Tables.load(spark, TestSpark.sf, "events")
    val total = ev.count()
    val purged = ev.filter(pmod(col("user_id"), lit(97L)) === 0).count()
    assert(out.map(r =>
      r.getAs[Long]("n_purged") + r.getAs[Long]("n_retained")).sum === total)
    assert(out.map(_.getAs[Long]("n_purged")).sum === purged)
    // the cohort's user count is consistent per type: never more users
    // than purged rows, and zero users exactly when zero rows
    out.foreach { r =>
      assert(r.getAs[Long]("n_users_purged") <= r.getAs[Long]("n_purged"))
      assert((r.getAs[Long]("n_users_purged") == 0L) ==
        (r.getAs[Long]("n_purged") == 0L))
    }
  }

  test("k-anonymity report lists exactly the sub-k classes") {
    val out = run("q_kanon").collect()
    out.foreach(r => assert(r.getAs[Long]("class_size") < 5L))
    // the totals every row carries equal the report itself
    if (out.nonEmpty) {
      assert(out.head.getAs[Long]("n_violating_classes") === out.length.toLong)
      assert(out.head.getAs[Long]("n_rows_at_risk") ===
        out.map(_.getAs[Long]("class_size")).sum)
    }
    // independent recount of one reported class from the raw table
    out.headOption.foreach { r =>
      val cents = expr(
        """((CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
            + 100000) div 100000) * 1000 - 1000""")
      val n = Tables.load(spark, TestSpark.sf, "customer")
        .filter(col("c_nationkey").cast("long") === r.getAs[Long]("nation") &&
          col("c_mktsegment") === r.getAs[String]("segment") &&
          cents === r.getAs[Long]("bal_band"))
        .count()
      assert(n === r.getAs[Long]("class_size"))
    }
  }

  test("skew audit equals a local order-statistics replay") {
    val row = run("q_skew_audit").head()
    val counts = Tables.load(spark, TestSpark.sf, "lineitem")
      .groupBy("l_partkey").count()
      .collect().map(_.getLong(1)).sorted
    val n = counts.length.toLong
    def pct(p: Int): Long = {
      // smallest count c with |{cnt <= c}| * 100 >= p * n_keys —
      // the operator's exact integer gate, replayed on sorted counts
      counts.find(c => counts.count(_ <= c).toLong * 100 >= p * n).get
    }
    assert(row.getAs[Long]("n_keys") === n)
    assert(row.getAs[Long]("n_rows") === counts.sum)
    assert(row.getAs[Long]("min_cnt") === counts.head)
    assert(row.getAs[Long]("max_cnt") === counts.last)
    assert(row.getAs[Long]("p50_cnt") ===
      counts.find(c => counts.count(_ <= c).toLong * 2 >= n).get)
    assert(row.getAs[Long]("p99_cnt") === pct(99))
    assert(row.getAs[Double]("skew_ratio") ===
      (counts.last * n).toDouble / counts.sum.toDouble)
    assert(row.getAs[Double]("skew_ratio") >= 1.0)
  }

  test("ship-latency aging partitions every order and all its revenue") {
    val out = run("q_ship_latency_aging").collect()
    val orders = Tables.load(spark, TestSpark.sf, "orders")
    assert(out.map(_.getAs[Long]("n_orders")).sum === orders.count())
    val cents = orders
      .select((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(out.map(_.getAs[Long]("revenue_cents")).sum === cents)
    // the never-shipped band is exactly the orders with no line items
    val shippedKeys = Tables.load(spark, TestSpark.sf, "lineitem")
      .select(col("l_orderkey")).distinct()
    val neverShipped = orders
      .join(shippedKeys, col("o_orderkey") === col("l_orderkey"),
        "left_anti").count()
    val nsRow = out.find(_.getAs[String]("bucket") == "5_never_shipped")
    assert(nsRow.map(_.getAs[Long]("n_orders")).getOrElse(0L) === neverShipped)
    // band edges hold
    out.foreach { r =>
      (r.getAs[String]("bucket"), Option(r.getAs[Any]("max_days"))) match {
        case ("1_week", Some(mx)) => assert(mx.asInstanceOf[Long] <= 7L)
        case ("2_month", Some(mx)) => assert(mx.asInstanceOf[Long] <= 30L)
        case ("3_quarter", Some(mx)) => assert(mx.asInstanceOf[Long] <= 90L)
        case _ =>
      }
    }
  }

  test("incremental aggregate maintenance: merge equals full recompute") {
    val out = Registry.byName("q_incr_agg_maintain")
      .run(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // the maintenance identity the operator exists to prove
      assert(r.getAs[Boolean]("consistent"), r.toString)
      assert(r.getAs[Long]("n_state") + r.getAs[Long]("n_delta")
        === r.getAs[Long]("n_full"), r.toString)
      assert(r.getAs[Long]("n_merged") === r.getAs[Long]("n_full"))
      assert(r.getAs[Long]("s_merged") === r.getAs[Long]("s_full"))
    }
    // totals reconcile against the raw table
    val nAll = Tables.load(spark, TestSpark.sf, "events").count()
    assert(out.map(_.getAs[Long]("n_full")).sum === nAll)
  }

  test("l-diversity report lists exactly the sub-l classes") {
    val out = run("q_l_diversity").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("l_distinct") < 3L)
      assert(r.getAs[Long]("l_distinct") >= 1L)
      assert(r.getAs[Long]("class_size") >= r.getAs[Long]("l_distinct"))
    }
    if (out.nonEmpty) {
      assert(out.head.getAs[Long]("n_violating_classes") === out.length.toLong)
      assert(out.head.getAs[Long]("n_rows_at_risk") ===
        out.map(_.getAs[Long]("class_size")).sum)
    }
    // independent recount of one reported class from the raw table
    out.headOption.foreach { r =>
      val band = expr(
        """((CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
            + 100000) div 100000) * 1000 - 1000""")
      val cls = Tables.load(spark, TestSpark.sf, "customer")
        .filter(col("c_nationkey").cast("long") === r.getAs[Long]("nation") &&
          band === r.getAs[Long]("bal_band"))
      assert(cls.count() === r.getAs[Long]("class_size"))
      assert(cls.select("c_mktsegment").distinct().count() ===
        r.getAs[Long]("l_distinct"))
    }
  }

  test("snapshot diff classes replay the modular version-2 derivation") {
    val out = run("q_snapshot_diff").collect()
      .map(r => r.getAs[String]("class") ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("price_drift"))).toMap
    val ks = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey").cast("long")).collect().map(_.getLong(0))
    // faithful local simulation of the v2 derivation (key 0 is the
    // corner: 0 % n == 0 for every rule, and its mirrored insert -0
    // lands back ON key 0 carrying the original price)
    val v1 = ks.toSet
    val v2 = (ks.filter(_ % 97 != 0)
        .map(k => k -> (if (k % 13 == 0) 100L else 0L)) ++
      ks.filter(_ % 101 == 0).map(k => -k -> 0L)).toMap
    val added = v2.keys.count(!v1.contains(_)).toLong
    val removed = ks.count(!v2.contains(_)).toLong
    val changed = ks.count(k => v2.get(k).exists(_ != 0L)).toLong
    val unchanged = ks.count(k => v2.get(k).contains(0L)).toLong
    assert(out.get("added").map(_._1).getOrElse(0L) === added)
    assert(out.get("removed").map(_._1).getOrElse(0L) === removed)
    assert(out.get("changed").map(_._1).getOrElse(0L) === changed)
    assert(out.get("unchanged").map(_._1).getOrElse(0L) === unchanged)
    // every changed row drifted by exactly the +$1 reprice
    out.get("changed").foreach { case (n, drift) =>
      assert(drift === n.toDouble)
    }
    out.get("unchanged").foreach { case (_, drift) => assert(drift === 0.0) }
  }

  test("dp release: bounded integer noise, clamped release, deterministic") {
    val a = run("q_dp_release").collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val noise = r.getAs[Long]("noise")
      assert(noise >= -32L && noise <= 32L, r.toString)
      assert(r.getAs[Long]("released") ===
        math.max(0L, r.getAs[Long]("n") + noise), r.toString)
      assert(r.getAs[Double]("epsilon") === 0.5)
    }
    // the mechanism must actually perturb: at ε = 0.5 the two-sided
    // geometric puts ~75% of its mass off zero
    assert(a.exists(_.getAs[Long]("noise") != 0L), "all-zero noise")
    assert(a.exists(_.getAs[Long]("noise") < 0L), "noise never negative")
    // per-cell noise is a pure function of the cell key — bit-identical
    // on rerun (the property that makes the release auditable)
    val b = run("q_dp_release").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // exact cell counts reconcile against the raw table
    val nAll = Tables.load(spark, TestSpark.sf, "events").count()
    assert(a.map(_.getAs[Long]("n")).sum === nAll)
  }
}
