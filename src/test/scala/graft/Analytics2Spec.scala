package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Analytics2Queries

/** Invariant laws for the round-9 continuation family (q298–q310), over
  * the sf0.001 fixtures: driver-side brute-force replays and exact
  * conservation/bound properties the DuckDB hash-differential cannot
  * express by itself. */
class Analytics2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    Analytics2Queries.queries(name)(spark, dir).collect()

  test("LAW basket overlap: inclusion-exclusion unions, jaccard <= " +
      "overlap coefficient, and one pair matches a driver-side set replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q298_basket_overlap")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n1") < r.getAs[Long]("n2"))
      assert(r.getAs[Long]("inter") <= r.getAs[Long]("uni"))
      assert(r.getAs[Long]("jaccard_ppm") <= r.getAs[Long]("overlap_ppm"))
      assert(r.getAs[Long]("overlap_ppm") <= 1000000L)
    }
    val np = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val r0 = rows.head
    val (a, b) = (np(r0.getAs[Long]("n1")), np(r0.getAs[Long]("n2")))
    assert(r0.getAs[Long]("inter") == (a & b).size.toLong)
    assert(r0.getAs[Long]("uni") == (a | b).size.toLong)
    assert(r0.getAs[Long]("jaccard_ppm")
      == (a & b).size.toLong * 1000000L / (a | b).size)
  }

  test("LAW spearman rho lies in [-1,1] and matches a driver-side " +
      "tied-average-rank Pearson on one segment") {
    import org.apache.spark.sql.functions._
    val rows = run("q299_spearman_corr")
    rows.foreach { r =>
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 - 1e-12 && rho <= 1.0 + 1e-12)
    }
    val seg = rows.head.getAs[String]("c_mktsegment")
    // independent brute force: average ranks with ties, then Pearson
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(30,2)") * 100)
        .cast("long")).as("y"))
    val base = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === seg)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(30,2)") * 100).cast("long").as("x"))
      .join(rev, col("c_custkey") === col("o_custkey"), "left")
      .select(col("x"), coalesce(col("y"), lit(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def avgRanks(vs: Array[Long]): Array[Double] = {
      val sorted = vs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](vs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
        val avg = (i + 1 + j + 1) / 2.0
        (i to j).foreach(k => out(sorted(k)._2) = avg)
        i = j + 1
      }
      out
    }
    val rx = avgRanks(base.map(_._1)); val ry = avgRanks(base.map(_._2))
    val n = rx.length.toDouble
    val mx = rx.sum / n; val my = ry.sum / n
    val num = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val den = math.sqrt(rx.map(a => (a - mx) * (a - mx)).sum) *
      math.sqrt(ry.map(b => (b - my) * (b - my)).sum)
    val expected = num / den
    val got = rows.find(_.getAs[String]("c_mktsegment") == seg).get
      .getAs[Double]("rho")
    assert(math.abs(got - expected) < 1e-9, s"got $got want $expected")
  }

  test("LAW active streaks match a driver-side consecutive-day replay " +
      "for every user and conserve active days") {
    import org.apache.spark.sql.functions._
    val rows = run("q300_active_streaks")
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_streaks"), r.getAs[Long]("n_active_days"),
          r.getAs[Long]("best_streak"), r.getAs[Long]("ending_streak")))
      .toMap
    val byUser = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
      .groupBy(_._1)
    byUser.foreach { case (u, ds) =>
      val days = ds.map(_._2.toEpochDay).sorted
      val streaks = days.foldLeft(List.empty[List[Long]]) {
        case (acc, d) => acc match {
          case (h @ (last :: _)) :: t if d == last + 1 => (d :: h) :: t
          case _ => List(d) :: acc
        }
      }.map(_.length.toLong)
      val got = rows(u)
      assert(got._1 == streaks.length.toLong, s"user $u n_streaks")
      assert(got._2 == days.length.toLong, s"user $u active days")
      assert(got._3 == streaks.max, s"user $u best")
      // foldLeft prepends: head of `streaks` is the LATEST island
      assert(got._4 == streaks.head, s"user $u ending")
    }
  }

  test("LAW trimmed mean matches a driver-side sort-and-slice per segment " +
      "and never exceeds the untrimmed extremes") {
    import org.apache.spark.sql.functions._
    val rows = run("q303_trimmed_mean")
    val all = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (col("o_totalprice").cast("decimal(30,2)") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    rows.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      val vs = all(seg).map(_._2).sorted
      val cut = vs.length / 10
      val kept = vs.slice(cut, vs.length - cut)
      assert(r.getAs[Long]("kept_n") == kept.length)
      assert(r.getAs[Long]("kept_sum") == kept.sum)
      assert(r.getAs[Long]("mean_cents") == kept.sum / kept.length)
    }
  }

  test("LAW mutual information: marginals conserve the table count and " +
      "the quantized MI sum is nonnegative up to floor slack per cell") {
    val rows = run("q302_mutual_information")
    val byPair = rows.groupBy(_.getAs[String]("pair"))
    val nOrders = Tables.orders(spark, dir).count()
    val nLines = Tables.lineitem(spark, dir).count()
    assert(byPair("priority_status").map(_.getAs[Long]("n_xy")).sum == nOrders)
    assert(byPair("returnflag_linestatus").map(_.getAs[Long]("n_xy")).sum
      == nLines)
    byPair.foreach { case (p, cells) =>
      val mi = cells.map(_.getAs[Long]("term_micro")).sum
      // true MI >= 0; each floor loses < 1 micro-nat
      assert(mi >= -cells.length, s"pair $p quantized MI $mi")
    }
  }

  test("LAW theil index is nonnegative up to quantization slack and zero " +
      "for a constructed equal distribution") {
    val rows = run("q305_theil_index")
    rows.foreach { r =>
      // per-customer floor loses < 1 micro-nat weighted by v/S (< 1 total),
      // the ln(S/n) floor adds < 1 more
      assert(r.getAs[Long]("theil_micro") >= -2L, s"$r")
    }
    // equal distribution: term1 = floor(1e6 ln v) exactly = term2
    val v = 12345L; val n = 7
    val lv = math.floor(math.log(v.toDouble) * 1e6).toLong
    val term1 = (BigInt(v) * lv * n / (BigInt(v) * n)).toLong
    val term2 = math.floor(math.log(v.toDouble * n / n) * 1e6).toLong
    assert(term1 - term2 == 0L)
  }

  test("LAW zipf fit: slope is negative on the natural corpus and " +
      "recovers -1 within tolerance on a constructed 1/r law") {
    val r = run("q301_zipf_slope").head
    assert(r.getAs[Long]("n_terms") > 10) // sf0.001 vocab is tiny (~31)
    assert(r.getAs[Double]("slope") < 0.0)
    // constructed f_r = round(1e6 / r): the quantized-ln least squares
    // must read slope ~ -1
    val ranks = (1 to 1000).map(_.toLong)
    val lx = ranks.map(rr => math.floor(math.log(rr.toDouble) * 1e6).toLong)
    val ly = ranks.map(rr =>
      math.floor(math.log(math.round(1e6 / rr).toDouble) * 1e6).toLong)
    val n = BigInt(1000)
    val sx = lx.map(BigInt(_)).sum; val sy = ly.map(BigInt(_)).sum
    val sxy = lx.zip(ly).map { case (a, b) => BigInt(a) * b }.sum
    val sxx = lx.map(a => BigInt(a) * a).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    assert(math.abs(slope + 1.0) < 0.01, s"constructed slope $slope")
  }

  test("LAW cross-correlation r lies in [-1,1] and every lag row aligned " +
      "at least one day") {
    val rows = run("q304_cross_correlation")
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0)
      if (!r.isNullAt(r.fieldIndex("r"))) {
        val v = r.getAs[Double]("r")
        assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12)
      }
    }
  }

  test("LAW burstiness lies in [-1,1] and matches the driver-side " +
      "(sqrt(nQ-S^2)-S)/(sqrt(nQ-S^2)+S) for one user") {
    import org.apache.spark.sql.functions._
    val rows = run("q309_burstiness")
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("b_coeff"))) {
        val b = r.getAs[Double]("b_coeff")
        assert(b >= -1.0 - 1e-12 && b <= 1.0 + 1e-12)
      }
    }
    val u = rows.head.getAs[Long]("user_id")
    val ts = Tables.events(spark, dir)
      .filter(col("user_id") === u)
      .select(unix_micros(col("ts").cast("timestamp")).as("t"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.map(_._1)
    val gaps = ts.sliding(2).map(p => (p(1) - p(0)) / 1000000L).toArray
    val n = gaps.length
    val s = gaps.sum
    val q = gaps.map(g => BigInt(g) * g).sum
    val dd = (BigInt(n) * q - BigInt(s) * s).toDouble
    val expected = (math.sqrt(dd) - s) / (math.sqrt(dd) + s)
    val got = rows.find(_.getAs[Long]("user_id") == u).get
      .getAs[Double]("b_coeff")
    assert(math.abs(got - expected) < 1e-12)
  }

  test("LAW calibration bins partition the customer base with monotone " +
      "confidence and in-range ppm") {
    val rows = run("q310_calibration_ece").sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    val nCust = Tables.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_b")).sum == nCust)
    rows.foreach { r =>
      Seq("acc_ppm", "conf_mean_ppm", "gap_ppm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 1000000L, s"$c=$v")
      }
    }
    val confs = rows.map(_.getAs[Long]("conf_mean_ppm"))
    assert(confs.zip(confs.tail).forall { case (a, b) => a < b },
      "bin mean confidence must strictly increase")
  }

  test("LAW matryoshka: overlap <= 10, recall in [0,1e6], and the " +
      "full-dimension prefix recalls itself perfectly") {
    import org.apache.spark.sql.functions._
    val rows = run("q307_matryoshka_recall")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val o = r.getAs[Long]("overlap")
      assert(o >= 0L && o <= 10L)
      assert(r.getAs[Long]("recall_ppm") == o * 1000000L / 10L)
    }
    // prefix m = full dim reproduces the full ranking exactly
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val full = llm.Similarity.bruteForceTopK(q, c, k = 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sliced = llm.Similarity.bruteForceTopK(
        q.withColumn("q_emb", slice(col("q_emb"), 1, 64)),
        c.withColumn("n_emb", slice(col("n_emb"), 1, 64)), k = 10)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(full.toSet == sliced.toSet)
  }

  test("LAW edf distances match a driver-side two-sample CDF sweep " +
      "(KS max and CvM integral) and classical stats are in range") {
    import org.apache.spark.sql.functions._
    val rows = run("q312_edf_distances")
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("ks"))) {
        val d = r.getAs[Double]("ks")
        assert(d >= 0.0 && d <= 1.0)
        assert(r.getAs[Double]("cvm") >= 0.0)
      }
    }
    val seg = rows.head.getAs[String]("c_mktsegment")
    val vals = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === seg &&
        col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(30,2)") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = vals.filter(_._1 == "1-URGENT").map(_._2).sorted
    val b = vals.filter(_._1 == "5-LOW").map(_._2).sorted
    val pooled = (a ++ b).distinct.sorted
    val gaps = pooled.map { v =>
      val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
      val cnt = a.count(_ == v).toLong + b.count(_ == v).toLong
      (math.abs(ca * b.length - cb * a.length), cnt)
    }
    val ksNum = gaps.map(_._1).max
    val cvmNum = gaps.map { case (g, cnt) => BigInt(g) * g * cnt }.sum
    val got = rows.find(_.getAs[String]("c_mktsegment") == seg).get
    assert(got.getAs[Long]("n_a") == a.length)
    assert(got.getAs[Long]("n_b") == b.length)
    assert(BigInt(got.getAs[String]("ks_num")) == BigInt(ksNum))
    assert(BigInt(got.getAs[String]("cvm_num")) == cvmNum,
      s"cvm_num ${got.getAs[String]("cvm_num")} vs $cvmNum")
  }

  test("LAW lorenz decile points: ten deciles per nation, terminal point " +
      "is (1e6, 1e6), curve is below the diagonal and monotone") {
    val rows = run("q311_lorenz_points")
    rows.groupBy(_.getAs[String]("n_name")).foreach { case (nat, ps) =>
      val byK = ps.sortBy(_.getAs[Long]("k"))
      val last = byK.last
      assert(last.getAs[Long]("k") == 10L, s"$nat missing terminal decile")
      assert(last.getAs[Long]("pop_ppm") == 1000000L)
      assert(last.getAs[Long]("value_ppm") == 1000000L)
      byK.foreach { p =>
        // ascending-value order means cumulative value share can never
        // exceed cumulative population share (truncation slack 1 ppm)
        assert(p.getAs[Long]("value_ppm")
          <= p.getAs[Long]("pop_ppm") + 1L, s"$nat above diagonal: $p")
      }
      val shares = byK.map(_.getAs[Long]("value_ppm"))
      assert(shares.zip(shares.tail).forall { case (x, y) => x <= y })
    }
  }

  test("LAW covisitation counts are symmetric, bounded by basket " +
      "participation, and the oversized-basket cap is LOUD") {
    import org.apache.spark.sql.functions._
    val (serving, dropped) = ops.Stats.covisitationTopK(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey",
      k = 5, maxBasket = 20)
    // the registered surface carries the drop count on every row
    val reg = run("q313_covisitation")
    assert(reg.forall(_.getAs[Long]("n_dropped_baskets") == 0L))
    val pairs = serving.select("item", "co_item", "n_cobaskets").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // symmetry on pairs present in both directions' top-k
    pairs.foreach { case ((i, j), n) =>
      pairs.get((j, i)).foreach(m => assert(m == n, s"asym ($i,$j)"))
    }
    assert(dropped.collect().isEmpty) // TPC-H baskets are <= 7 lines
    // forced oversized basket surfaces loudly and leaves the serving
    // table free of its items
    val spark2 = spark
    import spark2.implicits._
    val big = (1 to 25).map(i => (999L, i.toLong)) :+ (1L, 1L) :+ (1L, 2L)
    val (srv2, drop2) = ops.Stats.covisitationTopK(
      big.toDF("bk", "it"), "bk", "it", k = 5, maxBasket = 20)
    val d2 = drop2.collect()
    assert(d2.length == 1 && d2.head.getAs[Long]("basket") == 999L
      && d2.head.getAs[Long]("basket_size") == 25L)
    assert(srv2.collect().length == 2) // only the small basket's pair
  }

  test("LAW segment migration: classes in 0..5, no inactive-to-inactive " +
      "cell, matrix conserves the active customer base, row shares sum " +
      "to 1e6 within truncation slack") {
    import org.apache.spark.sql.functions._
    val rows = run("q314_segment_migration")
    rows.foreach { r =>
      val f = r.getAs[Int]("from_class"); val t = r.getAs[Int]("to_class")
      assert(f >= 0 && f <= 5 && t >= 0 && t <= 5)
      assert(!(f == 0 && t == 0), "customers come from orders - (0,0) impossible")
    }
    val active = Tables.orders(spark, dir)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == active)
    rows.groupBy(_.getAs[Int]("from_class")).foreach { case (f, cells) =>
      val s = cells.map(_.getAs[Long]("row_ppm")).sum
      assert(s <= 1000000L && s >= 1000000L - cells.length,
        s"from_class $f row shares sum $s")
    }
  }

  test("LAW embedding audit: counts conserve the corpus, no zero/ragged " +
      "vectors in the fixture, and one vector's norm matches a driver " +
      "replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q315_embedding_audit")
    val total = Tables.embeddings(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_zero") == 0L)
      assert(r.getAs[Long]("n_ragged") == 0L)
      assert(r.getAs[Long]("min_norm_micro") <= r.getAs[Long]("max_norm_micro"))
      assert(r.getAs[Long]("min_norm_micro") > 0L)
    }
    val one = Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding")).head()
    val emb = one.getAs[scala.collection.Seq[Float]]("embedding")
    val dotSelf = emb.map(x =>
      math.floor(x.toDouble * x.toDouble * 1e12).toLong).sum
    val normMicro = math.floor(math.sqrt(dotSelf.toDouble / 1e12) * 1e6).toLong
    val lab = rows.find(_.getAs[Int]("label") == one.getAs[Int]("label")).get
    assert(lab.getAs[Long]("min_norm_micro") <= normMicro &&
      normMicro <= lab.getAs[Long]("max_norm_micro"))
  }

  test("LAW rank momentum: each month's ranks are a 1..n permutation and " +
      "deltas telescope per brand") {
    val rows = run("q316_rank_momentum")
    rows.groupBy(_.getAs[java.sql.Date]("month")).foreach { case (m, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted.toSeq
      assert(ranks == (1L to ranks.length.toLong), s"month $m ranks")
    }
    rows.groupBy(_.getAs[String]("p_brand")).foreach { case (b, rs) =>
      val ordered = rs.sortBy(_.getAs[java.sql.Date]("month").getTime)
      assert(ordered.head.isNullAt(ordered.head.fieldIndex("prev_rnk")))
      ordered.sliding(2).filter(_.length == 2).foreach { pair =>
        val p = pair(0); val c = pair(1)
        assert(c.getAs[Long]("prev_rnk") == p.getAs[Long]("rnk"), s"$b")
        assert(c.getAs[Long]("rank_delta")
          == p.getAs[Long]("rnk") - c.getAs[Long]("rnk"))
      }
    }
  }

  test("LAW price/volume/mix bridge reconciles exactly per brand and " +
      "one brand matches a driver-side decomposition") {
    import org.apache.spark.sql.functions._
    val rows = run("q317_price_volume_mix")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("d_rev") == r.getAs[Long]("vol_effect")
        + r.getAs[Long]("price_effect") + r.getAs[Long]("residual"))
    }
    val b = rows.head.getAs[String]("p_brand")
    val parts = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === b &&
        year(col("l_shipdate")).isin(1996, 1997))
      .select(col("l_partkey"), year(col("l_shipdate")).as("yr"),
        col("l_quantity").cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(30,2)") * 100)
          .cast("long").as("r"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getLong(3)))
      .groupBy(_._1)
    var vol = 0L; var price = 0L; var n = 0L
    parts.foreach { case (_, ls) =>
      val q0 = ls.filter(_._2 == 1996).map(_._3).sum
      val r0 = ls.filter(_._2 == 1996).map(_._4).sum
      val q1 = ls.filter(_._2 == 1997).map(_._3).sum
      val r1 = ls.filter(_._2 == 1997).map(_._4).sum
      if (q0 > 0 && q1 > 0) {
        n += 1; val p0 = r0 / q0; val p1 = r1 / q1
        vol += (q1 - q0) * p0; price += q1 * (p1 - p0)
      }
    }
    val got = rows.find(_.getAs[String]("p_brand") == b).get
    assert(got.getAs[Long]("n_parts") == n)
    assert(got.getAs[Long]("vol_effect") == vol)
    assert(got.getAs[Long]("price_effect") == price)
  }

  test("LAW sprt: llr path matches driver math per day and states " +
      "respect the ln(19) boundaries") {
    val rows = run("q318_sprt")
    val up = math.floor(math.log(19.0) * 1e6).toLong
    rows.foreach { r =>
      val k = r.getAs[Long]("k_cum"); val n = r.getAs[Long]("n_cum")
      val expect = math.floor((k.toDouble * math.log(0.05 / 0.04)
        + (n - k).toDouble * math.log(0.95 / 0.96)) * 1e6).toLong
      assert(r.getAs[Long]("llr_micro") == expect)
      val st = r.getAs[String]("state")
      val l = r.getAs[Long]("llr_micro")
      assert(st == (if (l >= up) "accept_h1"
        else if (l <= -up) "accept_h0" else "continue"))
    }
  }

  test("LAW nelson-aalen: cumulative hazard is nondecreasing, at-risk " +
      "is strictly decreasing, and exits conserve the population") {
    val rows = run("q319_nelson_aalen").sortBy(_.getAs[Long]("t_day"))
    val h = rows.map(_.getAs[Long]("h_cum_micro"))
    assert(h.zip(h.tail).forall { case (a, b) => a <= b })
    val risk = rows.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => a > b })
    val nUsers = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(risk.head == nUsers, "first at-risk set is everyone")
  }

  test("LAW k-core peel matches a driver-side fixpoint replay (node set " +
      "and degrees)") {
    import org.apache.spark.sql.functions._
    val got = run("q321_kcore")
      .map(r => r.getAs[Long]("n") -> r.getAs[Long]("degree")).toMap
    val edges = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .agg(countDistinct(col("o_orderkey")).as("w"))
      .filter(col("w") >= 2)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    var e = edges.toSet
    var stable = false
    while (!stable) { // true fixpoint (the 8 fixed rounds cover it here)
      val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 2).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      stable = e2 == e; e = e2
    }
    val deg = (e.toSeq.map(_._1) ++ e.toSeq.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == deg)
  }

  test("LAW markov attribution: removal probabilities are monotone below " +
      "baseline, shares in range, and baseline agrees with an exact " +
      "rational absorbing-chain solve within iteration tolerance") {
    import org.apache.spark.sql.functions._
    val rows = run("q322_markov_attribution")
    val base = rows.find(_.getAs[String]("removed") == "(none)").get
      .getAs[Long]("p_start_micro")
    rows.foreach { r =>
      val p = r.getAs[Long]("p_start_micro")
      assert(p >= 0L && p <= 1000000L)
      assert(p <= base, "removal can only reduce conversion probability")
      val rm = r.getAs[Long]("removal_micro")
      assert(rm >= 0L && rm <= 1000000L)
    }
    // independent exact solve: P = (I - Q)^-1 R via Gaussian
    // elimination on the transition counts
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val ranked = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_type"))
      .withColumn("rn", row_number().over(w))
    val convRank = ranked.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("rn")).as("cr"))
    val kept = ranked.join(convRank, Seq("user_id"), "left")
      .filter(col("cr").isNull || col("rn") <= col("cr"))
      .withColumn("state", when(col("event_type") === "purchase",
        lit("CONV")).otherwise(col("event_type")))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    val trans = kept.withColumn("src",
        coalesce(lag(col("state"), 1).over(w2), lit("START")))
      .select(col("src"), col("state").as("dst"))
    val terminal = kept.withColumn("mx",
        max(col("rn")).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === col("mx") && col("state") =!= "CONV")
      .select(col("state").as("src"), lit("NULL").as("dst"))
    val counts = trans.unionByName(terminal)
      .groupBy("src", "dst").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = counts.map(_._1).distinct.sorted
    val idx = states.zipWithIndex.toMap
    val nS = states.length
    val tot = counts.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    // solve (I - Q) x = r with doubles (fixture-sized; tolerance below)
    val a = Array.tabulate(nS, nS) { (i, j) => if (i == j) 1.0 else 0.0 }
    val b = new Array[Double](nS)
    counts.foreach { case (s0, d0, n) =>
      val i = idx(s0); val p = n.toDouble / tot(s0)
      if (d0 == "CONV") b(i) += p
      else if (d0 != "NULL") a(i)(idx(d0)) -= p
    }
    for (c <- 0 until nS) {
      val piv = (c until nS).maxBy(r0 => math.abs(a(r0)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      for (r0 <- 0 until nS if r0 != c && a(r0)(c) != 0.0) {
        val f = a(r0)(c) / a(c)(c)
        for (cc <- 0 until nS) a(r0)(cc) -= f * a(c)(cc)
        b(r0) -= f * b(c)
      }
    }
    val exact = b(idx("START")) / a(idx("START"))(idx("START"))
    assert(math.abs(base / 1e6 - exact) < 1e-3,
      s"baseline ${base / 1e6} vs exact $exact")
  }

  test("LAW personalized pagerank: seeds-equal-everyone degenerates to " +
      "uniform pagerank exactly; mass stays bounded by the scale unit") {
    import org.apache.spark.sql.functions._
    val rows = run("q323_personalized_pagerank")
    val total = rows.map(_.getAs[Long]("score")).sum
    assert(total > 0L && total <= 1000000000000L,
      s"teleport mass must not be created: $total")
    // degenerate law: seeds == all nodes -> identical to pageRankInt
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val allNodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val uni = ops.Graph.pageRankInt(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val per = ops.Graph.personalizedPageRankInt(edges, allNodes, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uni == per)
  }

  test("LAW decay attribution: decay in (0, 1e6], U-credits per " +
      "conversion conserve up to declared div truncation") {
    import org.apache.spark.sql.functions._
    val rows = run("q324_decay_attribution")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_credited")
      // a ~24h-old touch floors to 0 micro (0.5^24 * 1e6 < 1) — zero is
      // a legitimate bucket sum
      assert(r.getAs[Long]("decay_micros") >= 0L)
      assert(r.getAs[Long]("decay_micros") <= n * 1000000L)
      assert(r.getAs[Long]("u_micros") <= n * 1000000L)
    }
    // per-conversion conservation, independently re-derived
    val ev = Tables.events(spark, dir)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id").as("_u"),
        unix_micros(col("ts").cast("timestamp")).as("conv_us"))
    val touch = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("_u"),
        unix_micros(col("ts").cast("timestamp")).as("touch_us"))
    val perConv = conv.join(touch, Seq("_u"))
      .filter(col("touch_us") <= col("conv_us") &&
        col("touch_us") > col("conv_us") - lit(86400000000L))
      .groupBy(col("conv_id")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    def uMass(n: Long): Long =
      if (n == 1) 1000000L else if (n == 2) 1000000L
      else 800000L + (n - 2) * (200000L / (n - 2))
    val expectedU = perConv.map(uMass).sum
    assert(rows.map(_.getAs[Long]("u_micros")).sum == expectedU)
    assert(rows.map(_.getAs[Long]("n_credited")).sum == perConv.sum)
  }

  test("LAW order-day gaps: span/active/missing conserve and gap counts " +
      "match a driver-side replay per nation") {
    import org.apache.spark.sql.functions._
    val rows = run("q308_order_day_gaps")
    val days = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        to_date(col("o_orderdate")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
      .groupBy(_._1)
    rows.foreach { r =>
      val nk = r.getAs[Number]("c_nationkey").longValue
      val ds = days(nk).map(_._2).sortBy(_.toEpochDay)
      val gaps = ds.sliding(2).map(p =>
        p(1).toEpochDay - p(0).toEpochDay - 1).toArray
      assert(r.getAs[Long]("n_active") == ds.length)
      assert(r.getAs[Long]("span_days")
        == ds.last.toEpochDay - ds.head.toEpochDay + 1)
      assert(r.getAs[Long]("n_missing") == gaps.sum)
      assert(r.getAs[Long]("n_gaps") == gaps.count(_ > 0))
      assert(r.getAs[Long]("max_gap")
        == (if (gaps.isEmpty) 0L else math.max(gaps.max, 0L)))
    }
  }
}
