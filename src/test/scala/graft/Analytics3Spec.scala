package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics3Queries

/** Invariant laws for the round-9 session-4 family (q325+), over the
  * sf0.001 fixtures: driver-side brute-force replays and exact
  * conservation/bound properties beyond what the DuckDB hash
  * differential expresses on its own. */
class Analytics3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    Analytics3Queries.queries(name)(spark, dir).collect()

  private def orderCents(): Array[(String, Long)] = {
    import org.apache.spark.sql.functions._
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(30,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
  }

  test("LAW anova: partition of total SS holds within the declared " +
      "per-group quantization, and F matches a driver-side replay") {
    val row = run("q325_anova_f").head
    val xs = orderCents()
    val k = xs.map(_._1).distinct.length
    val n = xs.length
    assert(row.getAs[Long]("k") == k.toLong)
    assert(row.getAs[Long]("n") == n.toLong)
    // brute force in exact BigInt, same quantization (term = S_g^2 / n_g
    // truncated; s2n likewise)
    val groups = xs.groupBy(_._1).values.toSeq
    val t = groups.map { g =>
      val s = g.map(x => BigInt(x._2)).sum
      s * s / g.length
    }.sum
    val q = xs.map(x => BigInt(x._2) * x._2).sum
    val s = xs.map(x => BigInt(x._2)).sum
    val ssb = (t - s * s / n).toDouble
    val ssw = (q - t).toDouble
    assert(math.abs(row.getAs[Double]("ssb") - ssb) <= math.ulp(ssb) * 4)
    assert(math.abs(row.getAs[Double]("ssw") - ssw) <= math.ulp(ssw) * 4)
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(row.getAs[Double]("f_stat") - f) <= math.abs(f) * 1e-12)
  }

  test("LAW kendall: tau_b in [-1,1], pair counts partition n_pairs, and " +
      "one nation matches an O(n^2) driver replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q326_kendall_tau")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("nc") + r.getAs[Long]("nd") +
        r.getAs[Long]("tx") + r.getAs[Long]("ty") + r.getAs[Long]("txy")
      assert(total == r.getAs[Long]("n_pairs"))
      val tau = r.getAs[Double]("tau_b")
      if (!r.isNullAt(r.fieldIndex("tau_b")))
        assert(tau >= -1.0 - 1e-12 && tau <= 1.0 + 1e-12)
    }
    val nk = rows.head.getAs[Long]("nk")
    val rev = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("y"))
    val base = Tables.customer(spark, dir)
      .filter(col("c_nationkey").cast("long") === nk)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(30,2)") * 100).cast("long").as("x"))
      .join(rev, col("c_custkey") === col("o_custkey"), "left")
      .select(col("x"), coalesce(col("y"), lit(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var nc = 0L; var nd = 0L
    for (i <- base.indices; j <- (i + 1) until base.length) {
      val s = java.lang.Long.signum(java.lang.Long.compare(base(i)._1, base(j)._1)) *
        java.lang.Long.signum(java.lang.Long.compare(base(i)._2, base(j)._2))
      if (s > 0) nc += 1 else if (s < 0) nd += 1
    }
    val r0 = rows.find(_.getAs[Long]("nk") == nk).get
    assert(r0.getAs[Long]("nc") == nc && r0.getAs[Long]("nd") == nd)
    assert(r0.getAs[Long]("n_pairs") ==
      base.length.toLong * (base.length - 1) / 2)
  }

  test("LAW kruskal-wallis: doubled ranks conserve 2*N*(N+1)/2 and H " +
      "matches a driver-side tied-rank replay within quantization") {
    val row = run("q327_kruskal_wallis").head
    val xs = orderCents()
    val n = xs.length
    assert(row.getAs[Long]("n") == n.toLong)
    // driver replay: average ranks with ties (doubled to stay integral)
    val byVal = xs.map(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val sortedVals = byVal.keys.toArray.sorted
    val firstRank = scala.collection.mutable.Map[Long, Long]()
    var acc = 1L
    sortedVals.foreach { v => firstRank(v) = acc; acc += byVal(v) }
    def r2(v: Long): Long = 2 * firstRank(v) + byVal(v) - 1
    val groups = xs.groupBy(_._1)
    val t = groups.values.map { g =>
      val s = g.map(x => BigInt(r2(x._2))).sum
      s * s / g.length
    }.sum
    val nd = n.toDouble
    val h = 3.0 * t.toDouble / (nd * (nd + 1.0)) - 3.0 * (nd + 1.0)
    assert(math.abs(row.getAs[Double]("h") - h) <= math.abs(h) * 1e-12 + 1e-9)
    val tieS = byVal.values.map(t0 => BigInt(t0) * t0 * t0 - t0).sum
    val c = 1.0 - tieS.toDouble / (nd * nd * nd - nd)
    assert(math.abs(row.getAs[Double]("c_tie") - c) <= 1e-12)
  }

  test("LAW kappa: confusion counts partition n and kappa in [-1,1]") {
    val row = run("q328_cohens_kappa").head
    val n = row.getAs[Long]("n")
    assert(n == row.getAs[Long]("n11") + row.getAs[Long]("n10") +
      row.getAs[Long]("n01") + row.getAs[Long]("n00"))
    if (!row.isNullAt(row.fieldIndex("kappa"))) {
      val kap = row.getAs[Double]("kappa")
      assert(kap >= -1.0 - 1e-12 && kap <= 1.0 + 1e-12)
    }
  }

  test("LAW resource allocation: every pair has >=2 shared parts, " +
      "ra_micro <= n_common * 500000 (deg >= 2), and one pair matches " +
      "a driver-side set replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q329_resource_allocation")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("s1") < r.getAs[Long]("s2"))
      assert(r.getAs[Long]("n_common") >= 2)
      assert(r.getAs[Long]("ra_micro") <= r.getAs[Long]("n_common") * 500000L)
    }
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = ps.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val r0 = rows.head
    val (s1, s2) = (r0.getAs[Long]("s1"), r0.getAs[Long]("s2"))
    val p1 = ps.filter(_._2 == s1).map(_._1).toSet
    val p2 = ps.filter(_._2 == s2).map(_._1).toSet
    val shared = (p1 & p2).filter(p => deg(p) >= 2 && deg(p) <= 20)
    assert(r0.getAs[Long]("n_common") == shared.size.toLong)
    assert(r0.getAs[Long]("ra_micro") ==
      shared.toSeq.map(p => 1000000L / deg(p)).sum)
  }

  test("LAW bellman-ford: seeds sit at distance 0 and the 6-round fixed " +
      "point matches a driver-side Dijkstra capped at 6 hops") {
    import org.apache.spark.sql.functions._
    val rows = run("q330_bellman_ford")
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("d")).toMap
    val seeds = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 100 === 0)
      .select((col("c_custkey") * 2)).collect().map(_.getLong(0)).toSet
    seeds.foreach(sd => assert(rows(sd) == 0L))
    assert(rows.values.forall(_ >= 0L))
    // driver replay: round-synchronous relaxation (exactly 6 rounds)
    val base = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .agg(countDistinct(col("o_orderkey")).as("no"))
      .collect().map(r => (r.getLong(0), r.getLong(1), 1000000L / r.getLong(2)))
    val adj = (base.map(e => (e._1, e._2, e._3)) ++
      base.map(e => (e._2, e._1, e._3))).groupBy(_._1)
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 6) {
      val relaxed = dist.toSeq.flatMap { case (u, du) =>
        adj.getOrElse(u, Array.empty).map(e => e._2 -> (du + e._3))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .view.mapValues(_.map(_._2).min).toMap
    }
    assert(rows == dist)
  }

  test("LAW ewma: one region matches a driver-side closed-form replay " +
      "and the weights sum to exactly 1e8") {
    import org.apache.spark.sql.functions._
    val wts = Seq(50000000L, 25000000L, 12500000L, 6250000L,
      3125000L, 1562500L, 781250L, 781250L)
    assert(wts.sum == 100000000L)
    val rows = run("q332_ewma_exact")
    assert(rows.nonEmpty)
    val rg = rows.head.getAs[String]("r_name")
    val series = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === rg)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("c"))
      .orderBy(col("d"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    val expected = (7 until series.length).map { t =>
      series(t)._1 -> wts.zipWithIndex.map { case (w, j) =>
        series(t - j)._2 * w
      }.sum
    }.toMap
    rows.filter(_.getAs[String]("r_name") == rg).foreach { r =>
      assert(r.getAs[Long]("ewma_e8") == expected(r.getAs[java.sql.Date]("d")))
    }
  }

  test("LAW rake: deg >= freq so score_ppm >= 1e6, and freq respects " +
      "the min-support gate") {
    val rows = run("q333_rake_keywords")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("freq") >= 5)
      assert(r.getAs[Long]("deg") >= r.getAs[Long]("freq"))
      assert(r.getAs[Long]("score_ppm") >= 1000000L)
    }
  }

  test("LAW textrank: every surviving word scores positive and the " +
      "md5 node space is collision-free on this vocabulary") {
    import org.apache.spark.sql.functions._
    val rows = run("q334_textrank")
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("score") > 0))
    val words = rows.map(_.getAs[String]("w"))
    assert(words.distinct.length == words.length)
  }

  test("LAW map: ap and map stay within the 1e6 grid") {
    val rows = run("q335_map_eval")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("map_micro") >= 0L)
      assert(r.getAs[Long]("map_micro") <= 1000000L)
      assert(r.getAs[Long]("ap_sum") <=
        r.getAs[Long]("n_users") * 1000000L)
    }
  }

  test("LAW quantile normalize: every supplier maps, and the mapping " +
      "is monotone in the source value") {
    val rows = run("q336_quantile_normalize")
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("x_orig"),
        r.getAs[Long]("x_mapped")))
    val nSupp = Tables.supplier(spark, dir).count()
    assert(rows.length.toLong == nSupp)
    val sorted = rows.sortBy(r => (r._2, r._1))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3)
      case _ =>
    }
  }

  test("LAW haar: one block matches a driver-side transform and the " +
      "level sums telescope (a3 = sum of the 8 days)") {
    import org.apache.spark.sql.functions._
    val rows = run("q337_haar_wavelet")
    assert(rows.nonEmpty)
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("c"))
      .orderBy(col("d"))
      .collect().map(_.getLong(1))
    val blk0 = rows.find(_.getAs[Long]("blk") == 0L).get
    val x = daily.take(8)
    assert(blk0.getAs[Long]("a3") == x.sum)
    assert(blk0.getAs[Long]("d3") == x.take(4).sum - x.drop(4).sum)
    assert(blk0.getAs[Long]("d2_0") == x(0) + x(1) - x(2) - x(3))
    assert(blk0.getAs[Long]("d2_1") == x(4) + x(5) - x(6) - x(7))
    assert(blk0.getAs[Long]("d1_0") == x(0) - x(1))
    assert(blk0.getAs[Long]("d1_3") == x(6) - x(7))
  }

  test("LAW jsd: bounded by ln2 in micro-nats (up to one quantum per " +
      "vocab term) and non-negative up to quantization") {
    val rows = run("q339_js_divergence")
    assert(rows.nonEmpty)
    val v = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.explode(
        graft.text.TextOps.tokens(
          org.apache.spark.sql.functions.col("text"))).as("t"))
      .distinct().count()
    rows.foreach { r =>
      val j = r.getAs[Long]("jsd_micro")
      assert(j >= -v && j <= 693148L)
    }
  }

  test("LAW brown-forsythe: sums of squares stay non-negative within " +
      "per-group quantization and W >= 0") {
    val row = run("q340_brown_forsythe").head
    assert(row.getAs[Double]("ssb") >= -row.getAs[Long]("k").toDouble)
    assert(row.getAs[Double]("ssw") >= 0.0)
    if (!row.isNullAt(row.fieldIndex("w_stat")))
      assert(row.getAs[Double]("w_stat") >= 0.0)
  }

  test("LAW pacf: phi11 equals r1 and the Durbin-Levinson values match " +
      "a driver-side replay from the emitted r's") {
    val row = run("q341_pacf").head
    val (r1, r2, r3) = (row.getAs[Double]("r1"), row.getAs[Double]("r2"),
      row.getAs[Double]("r3"))
    assert(row.getAs[Double]("pacf1") == r1)
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(row.getAs[Double]("pacf2") == p2)
    val phi21 = r1 * (1.0 - p2)
    val p3 = (r3 - phi21 * r2 - p2 * r1) / (1.0 - phi21 * r1 - p2 * r2)
    assert(row.getAs[Double]("pacf3") == p3)
  }

  test("LAW friedman: Q is non-negative and the grid is complete " +
      "(k treatments x n blocks)") {
    val row = run("q342_friedman").head
    assert(row.getAs[Double]("q_stat") >= -1e-9)
    assert(row.getAs[Long]("k") >= 2L)
    assert(row.getAs[Long]("n") >= 2L)
  }

  test("LAW theil-sen: one nation's slope is the exact lower median of " +
      "the driver-side pairwise slope set") {
    import org.apache.spark.sql.functions._
    val rows = run("q343_theil_sen")
    assert(rows.nonEmpty)
    val nk = rows.head.getAs[Long]("nk")
    val rev = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("y"))
    val base = Tables.customer(spark, dir)
      .filter(col("c_nationkey").cast("long") === nk)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(30,2)") * 100).cast("long").as("x"))
      .join(rev, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("x"), coalesce(col("y"), lit(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slopes = (for {
      i <- base.indices; j <- (i + 1) until base.length
      if base(i)._2 != base(j)._2
    } yield ((base(j)._3 - base(i)._3).toDouble /
        (base(j)._2 - base(i)._2).toDouble,
      base(i)._1, base(j)._1)).sortBy(identity)
    val r0 = rows.find(_.getAs[Long]("nk") == nk).get
    assert(r0.getAs[Long]("n_slopes") == slopes.length.toLong)
    assert(r0.getAs[Double]("ts_slope") ==
      slopes((slopes.length + 1) / 2 - 1)._1)
  }

  test("LAW wilcoxon: doubled signed ranks conserve n(n+1)") {
    val row = run("q344_wilcoxon").head
    val n = row.getAs[Long]("n")
    assert(row.getAs[Long]("w2_plus") + row.getAs[Long]("w2_minus") ==
      n * (n + 1))
  }

  test("LAW gumbel: scale is positive and the 12-block return level " +
      "sits above the location parameter") {
    val row = run("q345_gumbel_maxima").head
    assert(row.getAs[Double]("beta") > 0.0)
    assert(row.getAs[Double]("rl12") > row.getAs[Double]("mu"))
  }

  test("LAW hurst: one block matches a driver-side R/S replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q346_hurst_rs")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("r16") >= 0L)
      assert(r.getAs[Double]("rs") > 0.0)
    }
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("c"))
      .orderBy(col("d"))
      .collect().map(_.getLong(1))
    val x = daily.take(16)
    val s16 = x.sum
    val dev = x.map(_ * 16 - s16)
    val z = dev.scanLeft(0L)(_ + _).drop(1)
    val r16 = z.max - math.min(z.min, 0L)
    val sDev = math.sqrt(dev.map(d => BigInt(d) * d).sum.toDouble / 16.0) / 16.0
    val blk0 = rows.find(_.getAs[Long]("blk") == 0L).get
    assert(blk0.getAs[Long]("r16") == r16)
    assert(math.abs(blk0.getAs[Double]("rs") - r16.toDouble / 16.0 / sDev)
      <= 1e-9 * blk0.getAs[Double]("rs"))
  }

  test("LAW brier: score lies on the [0, 1e6] micro grid") {
    val row = run("q347_brier_score").head
    val b = row.getAs[Long]("brier_micro")
    assert(b >= 0L && b <= 1000000L)
    assert(row.getAs[Double]("sse_d") >= 0.0)
  }

  test("LAW smd balance: three covariate rows, arms partition the " +
      "customer table") {
    val rows = run("q348_smd_balance")
    assert(rows.length == 3)
    val nCust = Tables.customer(spark, dir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n0") + r.getAs[Long]("n1") == nCust)
    }
  }

  test("LAW mde: absolute and relative effects are strictly positive") {
    val rows = run("q349_mde")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mde_abs") > 0.0)
      assert(r.getAs[Long]("mde_rel_micro") > 0L)
    }
  }

  test("LAW rolling beta: emits exactly days-15 rows and Europe never " +
      "exceeds the global series") {
    import org.apache.spark.sql.functions._
    val rows = run("q350_rolling_beta")
    val nDays = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(rows.length.toLong == nDays - 15)
    rows.foreach { r =>
      assert(r.getAs[Long]("y") <= r.getAs[Long]("x"))
    }
  }

  test("LAW price index: Fisher is the geometric mean, between L and P") {
    val row = run("q351_price_index").head
    val l = row.getAs[Long]("l_ppm").toDouble / 1e6
    val p = row.getAs[Long]("p_ppm").toDouble / 1e6
    val f = row.getAs[Double]("fisher")
    assert(f >= math.min(l, p) - 1e-9 && f <= math.max(l, p) + 1e-9)
    assert(math.abs(f - math.sqrt(l * p)) <= 1e-9)
  }

  test("LAW knee point: rank within range, share on the ppm grid, " +
      "chord distance non-negative at the argmax") {
    val row = run("q352_knee_point").head
    val i = row.getAs[Long]("knee_i")
    val n = row.getAs[Long]("n_parts")
    assert(i >= 1L && i <= n)
    assert(row.getAs[Long]("share_ppm") <= 1000000L)
    assert(row.getAs[Double]("cross_d") >= 0.0)
  }

  test("LAW motif: V and A matches carry strictly positive amplitude") {
    val rows = run("q354_motif_vshape")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("V", "A").contains(r.getAs[String]("motif")))
      assert(r.getAs[Long]("amplitude_cents") > 0L)
    }
  }

  test("LAW nearest join: every supplier maps to the true brute-force " +
      "nearest customer balance") {
    import org.apache.spark.sql.functions._
    val rows = run("q355_nearest_value_join")
    val nSupp = Tables.supplier(spark, dir).count()
    assert(rows.length.toLong == nSupp)
    val cust = Tables.customer(spark, dir)
      .select((col("c_acctbal").cast("decimal(30,2)") * 100).cast("long"))
      .collect().map(_.getLong(0))
    rows.foreach { r =>
      val best = cust.map(cv => math.abs(r.getAs[Long]("s_val") - cv)).min
      assert(r.getAs[Long]("dist") == best)
    }
  }

  test("LAW naive bayes: confusion counts every test doc with an " +
      "in-vocabulary token, predictions drawn from train langs") {
    import org.apache.spark.sql.functions._
    val rows = run("q356_naive_bayes")
    val langs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(langs.contains(r.getAs[String]("pred"))))
    val total = rows.map(_.getAs[Long]("n")).sum
    val nTest = Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 1).count()
    assert(total <= nTest && total > 0)
  }

  test("LAW woe/iv: bins partition the customers and total IV is " +
      "non-negative up to quantization") {
    val rows = run("q357_woe_iv")
    assert(rows.length == 10)
    val nCust = Tables.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_b")).sum == nCust)
    val iv = rows.map(_.getAs[Long]("iv_term_pico")).sum
    assert(iv >= -10L * 1000000L)
  }

  test("LAW calendarize: prorated cents conserve the gated line total " +
      "exactly") {
    import org.apache.spark.sql.functions._
    val rows = run("q358_calendarize")
    val prorated = rows.map(_.getAs[Long]("prorated_cents")).sum
    val gated = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(30,2)") * 100)
          .cast("long").as("v"),
        to_date(col("l_shipdate")).as("ship"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("ship"), col("od")).between(0, 120))
      .agg(sum(col("v"))).collect().head.getLong(0)
    assert(prorated == gated)
  }

  test("LAW grid neighbors: matches the brute-force all-pairs scan " +
      "within radius 10") {
    val rows = run("q359_grid_neighbors")
      .map(r => (r.getAs[Long]("ck"), r.getAs[Long]("sk"))).toSet
    def coord(salt: String, k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + k).getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    import org.apache.spark.sql.functions._
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
      .collect().map(_.getLong(0))
      .map(k => (k, coord("cgx", k), coord("cgy", k)))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"))
      .collect().map(_.getLong(0))
      .map(k => (k, coord("sgx", k), coord("sgy", k)))
    val brute = (for {
      (ck, cx, cy) <- cust; (sk, sx, sy) <- supp
      if (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy) <= 100
    } yield (ck, sk)).toSet
    assert(rows == brute)
  }

  test("LAW grid search: the winner's SSE is no worse than the " +
      "identity calibration (a=10, b=0), which the grid contains") {
    import org.apache.spark.sql.functions._
    val row = run("q360_grid_search_calibration").head
    assert(row.getAs[Long]("a") >= 0L && row.getAs[Long]("a") <= 20L)
    assert(row.getAs[Long]("b") >= -10L && row.getAs[Long]("b") <= 10L)
    val base = {
      val nOrd = Tables.orders(spark, dir)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
      Tables.customer(spark, dir)
        .select(col("c_custkey"),
          (col("c_acctbal").cast("decimal(30,2)") * 100).cast("long").as("x"))
        .join(nOrd, col("c_custkey") === col("o_custkey"), "left")
        .select(col("x"), col("c_custkey"),
          when(coalesce(col("n_ord"), lit(0L)) >= 2, 1L).otherwise(0L)
            .as("label"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))
    }
    val n = base.length
    val identSse = base.zipWithIndex.map { case ((_, _, y), i) =>
      val conf = i.toLong * 1000000L / (n - 1)
      val e = BigInt(conf - y * 1000000L); e * e
    }.sum
    assert(BigInt(row.getAs[Double]("sse_d").toLong) <= identSse)
  }

  test("LAW greedy cover: marginal gains are non-increasing, the total " +
      "telescopes, and round 1 is the global argmax") {
    import org.apache.spark.sql.functions._
    val rows = run("q361_greedy_cover").sortBy(_.getAs[Long]("round"))
    assert(rows.length == 5)
    val gains = rows.map(_.getAs[Long]("gain"))
    gains.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    assert(rows.last.getAs[Long]("covered_total") == gains.sum)
    val top1 = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey"), col("o_custkey")).distinct()
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("g"))
      .orderBy(col("g").desc, col("l_partkey")).limit(1)
      .collect()(0)
    assert(rows.head.getAs[Long]("pk") == top1.getLong(0))
    assert(rows.head.getAs[Long]("gain") == top1.getLong(1))
  }

  test("LAW prefix top-k: every top completion starts with its prefix " +
      "and never outweighs the prefix total") {
    val rows = run("q362_prefix_topk")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("top_token")
        .startsWith(r.getAs[String]("prefix")))
      assert(r.getAs[Long]("top_cnt") <= r.getAs[Long]("total_cnt"))
      assert(r.getAs[Long]("n_completions") >= 1L)
    }
  }

  test("LAW median polish: the interpolated median of residuals is " +
      "exactly zero within every column (segment)") {
    val rows = run("q363_median_polish")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("x4") == r.getAs[Long]("row_eff") +
        r.getAs[Long]("col_eff") + r.getAs[Long]("resid_x4"))
    }
    rows.groupBy(_.getAs[String]("seg")).foreach { case (_, rs) =>
      val v = rs.map(_.getAs[Long]("resid_x4")).sorted
      val m = v.length
      val med2 = if (m % 2 == 1) 2 * v(m / 2)
        else v(m / 2 - 1) + v(m / 2)
      assert(med2 == 0L)
    }
  }

  test("LAW hash ring: assignments partition the keys, kept <= after, " +
      "and the remap fraction is consistent-hashing small") {
    val rows = run("q364_hash_ring")
    val nCust = Tables.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_after")).sum == nCust)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_after")))
    val remapped = rows.head.getAs[Long]("n_remapped")
    assert(remapped == nCust - rows.map(_.getAs[Long]("n_kept")).sum)
    assert(remapped <= nCust / 4)
  }

  test("LAW skyline: mutually non-dominated, and every excluded part " +
      "is dominated by a skyline member") {
    import org.apache.spark.sql.functions._
    val sky = run("q365_skyline_2d")
      .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("price"),
        r.getAs[Long]("sz")))
    assert(sky.nonEmpty)
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean =
      a._2 <= b._2 && a._3 <= b._3 && (a._2 < b._2 || a._3 < b._3)
    for (a <- sky; b <- sky if a._1 != b._1)
      assert(!dominates(a, b))
    val all = Tables.part(spark, dir)
      .select(col("p_partkey"),
        (col("p_retailprice").cast("decimal(30,2)") * 100).cast("long"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet.contains(p._1)).foreach { p =>
      assert(sky.exists(s => dominates(s, p)))
    }
  }

  test("LAW apportionment: seats conserve to exactly 100") {
    val rows = run("q366_apportionment")
    assert(rows.map(_.getAs[Long]("seats")).sum == 100L)
    rows.foreach { r =>
      val e = r.getAs[Long]("extra")
      assert(e == 0L || e == 1L)
      assert(r.getAs[Long]("seats") == r.getAs[Long]("base") + e)
    }
  }

  test("LAW intra-list diversity: bounded pair counts and the milli " +
      "grid bound (brand term 1000 + max size delta)") {
    val rows = run("q367_intra_list_diversity")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") <= 45L)
      // d per pair <= 1000 (brand) + 49 (max size delta); ild is the
      // milli-scaled average, so the ceiling is 1049 * 1000
      assert(r.getAs[Long]("ild_milli") <= 1049000L)
      assert(r.getAs[Long]("ild_milli") >= 0L)
    }
  }

  test("LAW synthetic control: a single data-chosen donor region, gaps " +
      "reconcile exactly") {
    val rows = run("q368_synthetic_control")
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("donor")).distinct.length == 1)
    assert(rows.head.getAs[String]("donor") != "EUROPE")
    rows.foreach { r =>
      assert(r.getAs[Long]("gap_cents") ==
        r.getAs[Long]("target_cents") - r.getAs[Long]("donor_cents"))
      assert(r.getAs[Double]("pre_sse_d") >= 0.0)
    }
  }

  test("LAW bom rollup: one ancestor's subtree matches a driver-side " +
      "4-level descendant scan") {
    import org.apache.spark.sql.functions._
    val rows = run("q369_bom_rollup")
    assert(rows.nonEmpty)
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"),
        (col("p_retailprice").cast("decimal(30,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val anc0 = rows.head.getAs[Long]("anc")
    val desc = parts.filter { case (pk, _) =>
      (1 to 4).exists(l => pk / math.pow(7, l).toLong == anc0)
    }
    assert(rows.head.getAs[Long]("n_desc") == desc.length.toLong)
    assert(rows.head.getAs[Long]("subtree_cents") == desc.map(_._2).sum)
  }

  test("LAW kneser-ney: smoothed probabilities sit strictly inside the " +
      "ppm grid") {
    val rows = run("q370_kneser_ney")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("pkn_ppm")
      assert(p > 0L && p <= 1000000L)
    }
  }

  test("LAW bandit replay: one pick per day and the regret ledger " +
      "telescopes exactly") {
    import org.apache.spark.sql.functions._
    val rows = run("q371_bandit_replay")
      .sortBy(_.getAs[java.sql.Date]("d").getTime)
    val nDays = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(rows.length.toLong == nDays)
    var acc = 0L
    rows.foreach { r =>
      acc += r.getAs[Long]("best_daily_cents") -
        r.getAs[Long]("realized_cents")
      assert(r.getAs[Long]("cum_regret_cents") == acc)
    }
  }

  test("LAW raking: after the final column pass, every segment margin " +
      "matches its target within one truncation quantum per cell") {
    import org.apache.spark.sql.functions._
    val rows = run("q372_raking")
    assert(rows.nonEmpty)
    val ct = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(to_date(col("o_orderdate")) >= to_date(lit("1997-01-01")))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("ct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("seg")).foreach { case (seg, rs) =>
      val got = rs.map(_.getAs[Long]("x_micro")).sum
      val want = ct(seg) * 1000000L
      assert(math.abs(got - want) <= rs.length.toLong,
        s"$seg margin off by ${got - want} for ${rs.length} cells")
    }
  }

  test("LAW skyline stream: the streamed merge equals the one-shot " +
      "batch skyline exactly") {
    val streamed = graft.queries.StreamingQueries
      .queries("q373_skyline_stream")(spark, dir)
      .collect().map(r => (r.getAs[Long]("pk"), r.getAs[Long]("price"),
        r.getAs[Long]("sz"))).toSet
    val batch = run("q365_skyline_2d")
      .map(r => (r.getAs[Long]("pk"), r.getAs[Long]("price"),
        r.getAs[Long]("sz"))).toSet
    assert(streamed == batch)
  }

  test("LAW peer LOO z-score: mean of others reconciles with the " +
      "global sum") {
    val rows = run("q374_peer_loo_zscore")
    val k = rows.length
    val s = rows.map(_.getAs[Long]("x")).sum
    rows.foreach { r =>
      val expect = (s - r.getAs[Long]("x")).toDouble / (k - 1)
      assert(math.abs(r.getAs[Double]("mean_others") - expect) <=
        math.ulp(expect) * 4)
    }
  }

  test("LAW allen: only the seven start-ordered relations appear and " +
      "pairs count (orders - 1) per customer") {
    import org.apache.spark.sql.functions._
    val rows = run("q375_allen_relations")
    val allowed = Set("precedes", "meets", "overlaps", "starts", "equals",
      "finished_by", "contains")
    rows.foreach(r => assert(allowed.contains(r.getAs[String]("relation"))))
    val total = rows.map(_.getAs[Long]("n")).sum
    val expect = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("o_orderkey")).distinct()
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") - 1)).collect().head.getLong(0)
    assert(total == expect)
  }

  test("LAW sax: words are length-4 strings over the a-d alphabet") {
    val rows = run("q376_sax")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      assert(w.length == 4 && w.forall("abcd".contains(_)))
      assert(r.getAs[Long]("n") >= 1L)
    }
  }

  test("LAW hill: 99 tail items above xmin, positive alpha") {
    val row = run("q377_hill_tail").head
    assert(row.getAs[Long]("k_tail") == 99L)
    assert(row.getAs[Long]("sum_ln_micro") >= 0L)
    if (!row.isNullAt(row.fieldIndex("alpha")))
      assert(row.getAs[Double]("alpha") > 0.0)
  }

  test("LAW period detect: thirteen candidates, ranks a permutation, " +
      "scores on the ppm grid") {
    val rows = run("q378_period_detect")
    assert(rows.length == 13)
    assert(rows.map(_.getAs[Long]("p")).sorted.toSeq == (2L to 14L))
    assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to 13L))
    rows.foreach { r =>
      val s = r.getAs[Long]("score_ppm")
      assert(s >= 0L && s <= 1000000L)
    }
  }

  test("LAW bitemporal: both time gates hold, v2 only on mod-3 keys " +
      "with the +500 correction") {
    import org.apache.spark.sql.functions._
    val rows = run("q379_bitemporal_lookup")
    assert(rows.nonEmpty)
    val vv = java.sql.Date.valueOf("1997-06-01")
    val tt = java.sql.Date.valueOf("1997-09-01")
    val basePrice = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(30,2)") * 100).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(!r.getAs[java.sql.Date]("valid_from").after(vv))
      assert(!r.getAs[java.sql.Date]("tx_from").after(tt))
      val k = r.getAs[Long]("k")
      if (r.getAs[Long]("ver") == 2L) {
        assert(k % 3 == 0)
        assert(r.getAs[Long]("price") == basePrice(k) + 500L)
      } else assert(r.getAs[Long]("price") == basePrice(k))
    }
  }

  test("LAW conformal: realized coverage clears the 90% target within " +
      "finite-sample slack") {
    val row = run("q380_conformal").head
    assert(row.getAs[Long]("q_hat") >= 0L)
    assert(row.getAs[Long]("n_covered") <= row.getAs[Long]("n_test"))
    assert(row.getAs[Long]("coverage_ppm") >= 850000L)
  }

  test("LAW ips: match counts and value stay on their grids") {
    val row = run("q381_ips_eval").head
    assert(row.getAs[Long]("n_match") <= row.getAs[Long]("n"))
    assert(row.getAs[Long]("n_match") > 0L)
    assert(row.getAs[Long]("ips_value_micro") >= 0L)
    assert(row.getAs[Long]("snips_den_nano") > 0L)
  }

  test("LAW pinball: losses are non-negative and the ledger telescopes") {
    val rows = run("q382_pinball_loss")
      .sortBy(_.getAs[java.sql.Date]("month").getTime)
    assert(rows.nonEmpty)
    var acc = 0L
    rows.foreach { r =>
      val p = r.getAs[Long]("pinball_x10")
      assert(p >= 0L)
      val d = r.getAs[Long]("actual_cents") - r.getAs[Long]("pred_cents")
      assert(p == math.max(9 * d, -d))
      acc += p
      assert(r.getAs[Long]("cum_pinball_x10") == acc)
    }
  }

  test("LAW icc/deff: ICC bounded by 1 and DEFF at least 1 when " +
      "clustering is non-negative") {
    val row = run("q383_icc_deff").head
    val icc = row.getAs[Double]("icc")
    assert(icc <= 1.0 + 1e-12)
    if (icc >= 0) assert(row.getAs[Double]("deff") >= 1.0 - 1e-12)
  }

  test("LAW l-diversity: l bounded by the sensitive alphabet, entropy " +
      "bounded by ln(l), min_l is the true minimum") {
    val rows = run("q384_l_diversity")
    assert(rows.nonEmpty)
    val minL = rows.map(_.getAs[Long]("l_distinct")).min
    rows.foreach { r =>
      val l = r.getAs[Long]("l_distinct")
      assert(l >= 1L && l <= 5L)
      assert(r.getAs[Long]("min_l") == minL)
      // quantized entropy stays under ln(l) plus one quantum per cell
      assert(r.getAs[Long]("ent_micro") <=
        math.ceil(1e6 * math.log(l.toDouble)).toLong + l)
      assert(r.getAs[Long]("ent_micro") >= -l)
    }
  }

  test("LAW bias model: predictions clamp to the rating range so RMSE " +
      "is bounded by the range width") {
    val row = run("q385_bias_model").head
    assert(row.getAs[Long]("n_test") > 0L)
    assert(row.getAs[Double]("rmse_c") >= 0.0)
    assert(row.getAs[Double]("rmse_c") <= 4900.0)
  }

  test("LAW hits: scores lie in [0, 1e6] and each side's max is " +
      "exactly the 1e6 grid top") {
    val rows = run("q331_hits")
    val hubs = rows.filter(_.getAs[String]("kind") == "hub")
      .map(_.getAs[Long]("score"))
    val auths = rows.filter(_.getAs[String]("kind") == "auth")
      .map(_.getAs[Long]("score"))
    assert(hubs.nonEmpty && auths.nonEmpty)
    assert(hubs.forall(s => s >= 0 && s <= 1000000L))
    assert(auths.forall(s => s >= 0 && s <= 1000000L))
    assert(hubs.max == 1000000L)
    assert(auths.max == 1000000L)
  }

  test("DIFFERENTIAL nationPairs cap: cap-off == cap-on on fixture-sized " +
      "groups, and an engaged cap keeps exactly the md5-order prefix") {
    import org.apache.spark.sql.functions._
    // fixture groups (~6 customers/nation at sf0.001) sit far under the
    // 256 default, so the capped frame must be IDENTICAL to the uncapped
    // one — the cap only ever changes semantics where a group actually
    // exceeds it (the q78/incrementalDupMarks mirror discipline)
    def pairSet(cap: Long) =
      Analytics3Queries.nationPairs(spark, dir, cap)
        .select("nk", "k1", "k2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val capped = pairSet(Analytics3Queries.NationPairCap)
    val uncapped = pairSet(Long.MaxValue)
    assert(capped === uncapped,
      "slack cap must be a no-op on fixture-sized groups")
    assert(capped.nonEmpty)

    // force the cap to engage (cap=3): kept keys per nation must be the
    // driver-computed md5(custkey)-order prefix, and pair volume exactly
    // C(min(n,3), 2) per nation
    val kept3 = Analytics3Queries.nationPairs(spark, dir, 3L)
      .select("nk", "k1", "k2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byNation = Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    byNation.foreach { case (nk, cs) =>
      val want = cs.map(_._2).sortBy(k => (md5hex(k.toString), k)).take(3).toSet
      val gotKeys = kept3.filter(_._1 == nk)
        .flatMap(p => Seq(p._2, p._3)).toSet
      val m = math.min(cs.length, 3)
      assert(kept3.count(_._1 == nk) == m * (m - 1) / 2,
        s"nation $nk pair count")
      if (m >= 2) assert(gotKeys.subsetOf(want),
        s"nation $nk kept keys $gotKeys not the md5 prefix $want")
    }
  }
}
