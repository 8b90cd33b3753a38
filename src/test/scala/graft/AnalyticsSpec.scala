package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.AnalyticsQueries

/** Invariant laws for the round-9 analytics family (q253–q282), run over
  * the sf0.001 fixtures: each test pins a mathematical property the
  * DuckDB hash-differential cannot express by itself (bounds, exact
  * conservation, monotonicity, driver-side brute-force agreement). */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    AnalyticsQueries.queries(name)(spark, dir).collect()

  test("LAW gini per nation lies in [0, 1) and matches the driver-side " +
      "rank formula on collected revenues") {
    import org.apache.spark.sql.functions._
    val rows = run("q253_gini_coefficient")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
    // brute-force one nation end-to-end
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("v"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_custkey"), col("v"))
      .collect()
    val nation = rows.head.getAs[String]("n_name")
    val vs = rev.filter(_.getString(0) == nation)
      .map(r => (r.getAs[Long]("v"), r.getAs[Long]("o_custkey")))
      .sortBy(identity).map(_._1)
    val n = vs.length.toDouble
    val s = vs.map(BigDecimal(_)).sum.toDouble
    val sw = vs.zipWithIndex
      .map { case (v, i) => BigDecimal(v) * (i + 1) }.sum.toDouble
    val expected = (2.0 * sw - (n + 1.0) * s) / (n * s)
    val got = rows.find(_.getAs[String]("n_name") == nation).get
      .getAs[Double]("gini")
    assert(got === expected)
  }

  test("LAW mann-whitney doubled rank sums conserve: R1+R2 = N(N+1), " +
      "so U1+U2 = n1*n2") {
    import org.apache.spark.sql.functions._
    val r = run("q255_mann_whitney").head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val r1d = r.getAs[Long]("r1_doubled")
    val nn = n1 + n2
    // Σ doubled avg ranks over EVERYONE = 2·(1+..+N) = N(N+1)
    val r2d = nn * (nn + 1) - r1d
    val u1 = r.getAs[Double]("u1")
    val u2 = r2d / 2.0 - n2.toDouble * (n2 + 1.0) / 2.0
    assert(u1 + u2 === n1.toDouble * n2.toDouble)
  }

  test("LAW life table conserves population: first n_risk = users, " +
      "n_risk never increases, exits sum to the population") {
    val rows = run("q264_life_table").sortBy(_.getAs[Long]("t_day"))
    val users = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_risk") === users)
    val risks = rows.map(_.getAs[Long]("n_risk"))
    assert(risks.zip(risks.tail).forall { case (a, b) => a >= b })
    val exits = rows.map(r =>
      r.getAs[Long]("n_event") + r.getAs[Long]("n_censored")).sum
    assert(exits === users)
    // each row's risk drop equals the prior row's exits
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_risk") - b.getAs[Long]("n_risk") ===
        a.getAs[Long]("n_event") + a.getAs[Long]("n_censored"))
    }
  }

  test("LAW KMV kth_min is the true k-th smallest hash; k_eff = " +
      "min(k, n_exact); estimate within 3x of exact at k=32") {
    import org.apache.spark.sql.functions._
    val rows = run("q276_kmv_distinct")
    assert(rows.nonEmpty)
    val hashes = Tables.events(spark, dir)
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val hs = hashes(t)
      val kEff = r.getAs[Long]("k_eff")
      assert(kEff === math.min(32, hs.length).toLong)
      assert(r.getAs[Long]("kth_min") === hs(kEff.toInt - 1))
      val est = r.getAs[Long]("est")
      val exact = r.getAs[Long]("n_exact")
      assert(est > 0 && est < exact * 3 + 32 && exact < est * 3 + 32,
        s"KMV estimate implausible: $r")
    }
  }

  test("LAW ndcg/mrr bounds: ndcg means, hit rates and stickiness are " +
      "all <= 1e6 ppm; wau <= mau") {
    run("q271_ndcg_popularity").foreach { r =>
      assert(r.getAs[Long]("mean_ndcg_ppm") <= 1000000L)
    }
    run("q275_mrr_hitrate").foreach { r =>
      assert(r.getAs[Long]("hit_ppm") <= 1000000L)
      assert(r.getAs[Long]("mean_rr_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_users"))
    }
    run("q273_wau_mau").foreach { r =>
      assert(r.getAs[Long]("wau") <= r.getAs[Long]("mau"))
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
    }
  }

  test("LAW gini stump partitions exactly: n_left + n_right = |lineitem|, " +
      "impurity >= 0") {
    val r = run("q257_gini_stump").head
    val total = Tables.lineitem(spark, dir).count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") === total)
    assert(r.getAs[Double]("impurity") >= 0.0)
    assert(r.getAs[Long]("pos_left") <= r.getAs[Long]("n_left"))
    assert(r.getAs[Long]("pos_right") <= r.getAs[Long]("n_right"))
  }

  test("LAW roc curve: cumulative points are monotone and end at " +
      "(1e6, 1e6)") {
    val rows = run("q270_roc_points").sortBy(_.getAs[Long]("bin"))
    val tprs = rows.map(_.getAs[Long]("tpr_ppm"))
    val fprs = rows.map(_.getAs[Long]("fpr_ppm"))
    // bins sorted ascending by value; cumulative-from-top means bin 1
    // (lowest scores) accumulates EVERYTHING
    assert(tprs.head === 1000000L && fprs.head === 1000000L)
    assert(tprs.zip(tprs.tail).forall { case (a, b) => a >= b })
    assert(fprs.zip(fprs.tail).forall { case (a, b) => a >= b })
  }

  test("LAW psi bins: reference-half counts sum to the pre-1998 order " +
      "count and each decile bin holds ~10% of the reference") {
    import org.apache.spark.sql.functions._
    val rows = run("q266_psi_bins")
    val refN = Tables.orders(spark, dir)
      .filter(year(col("o_orderdate")) < 1998).count()
    assert(rows.map(_.getAs[Long]("c1")).sum === refN)
    rows.foreach { r =>
      val p1 = r.getAs[Long]("p1_ppm")
      assert(p1 > 50000L && p1 < 150000L,
        s"reference decile far from 10%: $r")
    }
  }

  test("LAW target encoding shrinks toward the global rate: every " +
      "encoded value sits between its brand rate and the global rate " +
      "(or equals both)") {
    val rows = run("q256_target_encoding")
    val gp = rows.map(_.getAs[Long]("pos")).sum.toDouble /
      rows.map(_.getAs[Long]("n")).sum.toDouble
    rows.foreach { r =>
      val raw = r.getAs[Long]("pos").toDouble / r.getAs[Long]("n").toDouble
      val enc = r.getAs[Double]("enc")
      val lo = math.min(raw, gp) - 1e-12
      val hi = math.max(raw, gp) + 1e-12
      assert(enc >= lo && enc <= hi, s"encoding not a shrinkage: $r")
    }
  }

  test("LAW sma crossover == driver brute force over the collected daily " +
      "series; every emitted day is a genuine sign flip") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("v"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    // driver replay: trailing sums, sign of s7·28 − s28·7, flips only
    val sigs = daily.indices.collect { case i if i >= 27 =>
      val s7 = daily.slice(i - 6, i + 1).map(_._2).sum
      val s28 = daily.slice(i - 27, i + 1).map(_._2).sum
      (daily(i)._1, (s7 * 28 - s28 * 7).sign)
    }
    val want = sigs.sliding(2).collect {
      case Seq((_, p), (dd, s)) if s != p => (dd, p, s)
    }.toSet
    val got = run("q295_sma_crossover")
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got === want, "crossover days must equal the brute-force replay")
  }

  test("LAW bollinger breakouts == driver brute force: flagged days " +
      "violate the 2-sigma band against the 20 PRIOR days, others don't") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("v"))
      .orderBy(col("d")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    val want = daily.indices.collect { case i if i >= 20 =>
      val win = daily.slice(i - 20, i).map(_._2).map(BigInt(_))
      val s = win.sum; val q = win.map(x => x * x).sum
      val x = BigInt(daily(i)._2)
      val dev = x * 20 - s
      val var4 = (q * 20 - s * s) * 4
      (daily(i)._1, daily(i)._2, dev, dev * dev > var4)
    }.collect { case (dd, v, dev, true) =>
      (dd, v, if (dev > 0) 1L else -1L)
    }.toSet
    val got = run("q296_bollinger_breakouts")
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got === want, "breakout set must equal the exact integer replay")
  }
}
