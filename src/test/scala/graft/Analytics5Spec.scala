package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch plain-Scala replays of the round-12 statistics surfaces
  * (q423–q426) at sf0.001 — the independent-differential discipline: the
  * engine's distributed plan and a naive in-memory reimplementation of the
  * DECLARED integer algebra must agree bit-for-bit. */
class Analytics5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def lnMicro(x: Long): Long =
    math.floor(1e6 * math.log(x.toDouble)).toLong

  test("q423 t-closeness equals a naive ordered-EMD replay") {
    val base = Tables.orders(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    val alphabet = base.map(_._3).distinct.sorted
    val m = alphabet.length.toLong
    val nTotal = base.length.toLong
    val globC = base.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val expected = base.groupBy(t => (t._1, t._2)).map { case (g, rows) =>
      val n = rows.length.toLong
      val cs = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      var cum = 0L
      var absum = 0L
      alphabet.foreach { sv =>
        cum += cs.getOrElse(sv, 0L) * 1000000L / n -
          globC(sv) * 1000000L / nTotal
        absum += math.abs(cum)
      }
      g -> absum / (m - 1)
    }
    val got = SparkEntry.queries("q423_t_closeness")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (g, (t, maxT)) =>
      assert(t === expected(g), s"t_ppm mismatch for $g")
      assert(maxT === expected.values.max)
    }
  }

  test("q424 BH step-up equals a naive replay; rejections are a p-prefix") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val n = rows.length.toLong
      val odd = rows.count(_._2 % 2 == 1).toLong
      val x2 = (2 * odd - n) * (2 * odd - n)
      val z2 = (x2 / n) * 1000000L + (x2 % n) * 1000000L / n
      val p = math.min(1000000L, 1000000000000L / math.max(z2, 1L))
      t -> ((n, odd, z2, p))
    }
    val m = expected.size.toLong
    val order = expected.toSeq.sortBy { case (t, (_, _, _, p)) => (p, t) }
    val kStar = order.zipWithIndex.collect {
      case ((_, (_, _, _, p)), i) if p * m * 20 <= 1000000L * (i + 1) =>
        (i + 1).toLong
    }.foldLeft(0L)(math.max)
    val got = SparkEntry.queries("q424_bh_fdr")(spark, TestSpark.sf)
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(7)))
      }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (t, (n, odd, z2, p, rk, rej)) =>
      val (en, eodd, ez2, ep) = expected(t)
      assert((n, odd, z2, p) === ((en, eodd, ez2, ep)), s"stats for $t")
      assert(rk === order.indexWhere(_._1 == t).toLong + 1)
      assert(rej === (rk <= kStar), s"BH decision for $t")
    }
  }

  test("q425 Kaplan-Meier equals a naive product-limit replay") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // .toSeq BEFORE the map: mapping a Map to pairs rebuilds a Map and
    // would collapse users sharing a t_day
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val first = rows.map(_._2).min
      val conv = rows.filter(_._3 == "purchase").map(_._2).minOption
      val last = rows.map(_._2).max
      val t = (conv.getOrElse(last) - first) / 86400000000L
      (t, conv.isDefined)
    }
    val days = perUser.map(_._1).distinct.sorted
    val total = perUser.size.toLong
    var priorExits = 0L
    var cumLn = 0L
    var zero = false
    val expected = days.map { d =>
      val exits = perUser.filter(_._1 == d)
      val nEvent = exits.count(_._2).toLong
      val nCens = exits.size.toLong - nEvent
      val nRisk = total - priorExits
      priorExits += exits.size.toLong
      val lnInc =
        if (nEvent < nRisk) Some(lnMicro(nRisk - nEvent) - lnMicro(nRisk))
        else None
      if (nEvent == nRisk) zero = true
      cumLn += lnInc.getOrElse(0L)
      d -> ((nRisk, nEvent, nCens, lnInc,
        if (zero) None else Some(cumLn), if (zero) 1L else 0L))
    }.toMap
    val got = SparkEntry.queries("q425_kaplan_meier")(spark, TestSpark.sf)
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getLong(6)))
      }.toMap
    assert(got === expected)
    // survival is non-increasing: cumulative log never rises
    val lnSeq = days.flatMap(d => expected(d)._5)
    assert(lnSeq === lnSeq.sorted.reverse)
  }

  test("q431 gate median equals q115's scored distribution; flags are consistent") {
    // q115 is the independently-differentialed scorer (LmSpec); the gate
    // surface must agree with a replay over ITS output
    val scored = SparkEntry.queries("q115_bigram_nll")(spark, TestSpark.sf)
      .select(col("doc_id"), col("nll_q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val med = scored.sortBy(t => (t._2, t._1))
      .apply(((scored.length + 1) / 2) - 1)._2
    val srcOf = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = scored.groupBy(t => srcOf(t._1)).map { case (src, rows) =>
      val flagged = rows.count(_._2 * 100 > med * 125).toLong
      src -> ((rows.length.toLong, flagged,
        flagged * 1000000L / rows.length))
    }
    val got = SparkEntry.queries("q431_lm_quality_gate")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (src, (n, nf, ppm, m)) =>
      assert(m === med, s"gate median for $src")
      assert((n, nf, ppm) === expected(src), s"gate counts for $src")
    }
  }

  test("q432 ROUGE: P/R bounded, F1 between harmonic bounds, clip symmetric-consistent") {
    val rows = SparkEntry.queries("q432_rouge_ngram_eval")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty, "the LSH screen must surface candidate pairs")
    rows.foreach { case (a, b, n, clip, p, r, f1) =>
      assert(a < b && (n == 1L || n == 2L))
      assert(clip >= 1L && p >= 0L && p <= 1000000L && r >= 0L && r <= 1000000L,
        s"ppm bounds for ($a,$b,$n)")
      assert(f1 <= math.max(p, r) && f1 >= 0L, s"F1 bound for ($a,$b,$n)")
      // exact F1 identity on the reported ppms
      assert(f1 === 2 * p * r / math.max(p + r, 1L))
    }
    // every pair carries both gram orders (unigram row implies bigram row
    // may be absent only when no bigram overlaps — but n=1 must exist)
    val byPair = rows.groupBy(t => (t._1, t._2))
    byPair.foreach { case (pr, rs) =>
      assert(rs.exists(_._3 == 1L), s"pair $pr missing its unigram row")
    }
  }

  test("q433 isotonic fit equals a from-scratch sequential PAVA (exact rationals)") {
    val got = SparkEntry.queries("q433_isotonic_calibration")(
        spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // sequential pool-adjacent-violators on exact (pos, n) rationals,
    // quantized per element at the END — the classical minimax
    // equivalence means the engine's max-min over quantized interval
    // averages must land on exactly these values
    var blocks = List.empty[(Long, Long)] // (pos, n), newest first
    got.foreach { case (_, n, pos, _, _) =>
      blocks = (pos, n) :: blocks
      var merged = true
      while (merged && blocks.size >= 2) {
        val (p1, n1) :: (p0, n0) :: rest = blocks: @unchecked
        // violation: newer block avg < older block avg (cross-multiplied)
        if (p1 * n0 < p0 * n1) blocks = (p0 + p1, n0 + n1) :: rest
        else merged = false
      }
    }
    val fitted = blocks.reverse.flatMap { case (p, n0) =>
      // every element of the block gets the block average; recover the
      // element count from n0 by expanding per bin below
      List((p, n0))
    }
    // expand block averages back onto bins in order
    val isoExpected = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var remaining = got.map(_._2).toList
      fitted.foreach { case (p, n0) =>
        var acc = 0L
        while (acc < n0) {
          out += p * 1000000L / n0
          acc += remaining.head
          remaining = remaining.tail
        }
      }
      out.toSeq
    }
    assert(got.map(_._5) === isoExpected,
      "engine minimax fit must equal sequential PAVA")
    // monotone by construction
    assert(got.map(_._5) === got.map(_._5).sorted)
    assert(got.map(_._4).sum / got.length >= 0) // raw ppm sanity
  }

  test("q434 pack curve equals a naive grid replay") {
    val toks = Tables.documents(spark, TestSpark.sf)
      .select(col("text")).collect()
      .map(r => "[a-z0-9]+".r.findAllIn(r.getString(0).toLowerCase).length.toLong)
      .filter(_ > 0)
    val expected = Seq(128L, 256L, 512L, 1024L).map { l =>
      val chunks = toks.map(n => (n + l - 1) / l)
      val padded = chunks.zip(toks).map { case (c, _) => c * l }.sum
      l -> ((toks.length.toLong, toks.sum, padded, chunks.sum,
        (padded - toks.sum) * 1000000L / padded))
    }.toMap
    val got = SparkEntry.queries("q434_pack_efficiency_curve")(
        spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
  }

  test("q435/q438/q439/q440 invariants: pair ordering, cell conservation, bounds") {
    val pp = SparkEntry.queries("q435_preference_pairs")(spark, TestSpark.sf)
      .collect()
    assert(pp.nonEmpty)
    pp.foreach { r =>
      val (chosen, cq, rejected, rq, gap) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(chosen != rejected && cq >= rq && gap === cq - rq)
    }
    val mc = SparkEntry.queries("q438_mcnemar")(spark, TestSpark.sf).head()
    assert(mc.getLong(1) + mc.getLong(2) + mc.getLong(3) + mc.getLong(4)
      === mc.getLong(0), "McNemar cells must conserve n")
    val mh = SparkEntry.queries("q439_mantel_haenszel")(spark, TestSpark.sf)
      .collect()
    mh.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5)
        === r.getLong(1), s"MH stratum ${r.getString(0)} must conserve n")
    }
    val cc = SparkEntry.queries("q440_clustering_coeff")(spark, TestSpark.sf)
      .collect()
    assert(cc.nonEmpty)
    cc.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L,
        "clustering coefficient must live in [0, 1] ppm")
    }
  }

  test("q441/q442 invariants: candidate caps and recipe conservation") {
    val kd = SparkEntry.queries("q441_knn_density")(spark, TestSpark.sf)
      .collect()
    assert(kd.nonEmpty)
    kd.foreach { r =>
      assert(r.getLong(1) >= 1L && r.getLong(1) <= 64L,
        "candidate count must respect the md5-order cap")
    }
    val compiled = SparkEntry.queries("q442_corpus_compile")(
        spark, TestSpark.sf)
      .collect()
    assert(compiled.nonEmpty)
    compiled.foreach { r =>
      val (nRaw, nSurv, nTrain, trainTok, alloc, nSel, selTok) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))
      assert(nSurv <= nRaw && nTrain <= nSurv && nSel <= nTrain,
        s"funnel must only shrink: ${r.getString(0)}")
      assert(alloc <= trainTok, "waterfill never allocates above capacity")
      assert(selTok <= alloc, "greedy selection never exceeds the allocation")
    }
    // the budget binds globally: Σ alloc ≤ 60% of surviving train tokens
    val totTrain = compiled.map(_.getLong(4)).sum
    val totAlloc = compiled.map(_.getLong(5)).sum
    assert(totAlloc <= totTrain * 6 / 10)
  }

  test("q484 Gumbel block maxima equals a driver-side replay; return " +
      "level sits above the fitted location") {
    val row = SparkEntry.queries("q484_gumbel_maxima")(spark, TestSpark.sf)
      .head()
    // driver replay from the weekly maxima in exact cents
    val maxima = Tables.orders(spark, TestSpark.sf)
      .groupBy(date_trunc("week", col("o_orderdate")).cast("date").as("wk"))
      .agg(max((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")).as("mc"))
      .collect().map(_.getLong(1))
    val n = maxima.length.toLong
    assert(row.getAs[Long]("n_blocks") === n)
    assert(row.getAs[Long]("max_cents") === maxima.max)
    val sx = maxima.sum
    val sxx = maxima.map(m => m * m).sum
    val mean = sx.toDouble / n
    val beta = math.sqrt((sxx.toDouble - sx.toDouble * sx.toDouble / n)
      / (n - 1)) * 0.779696801233676
    val mu = mean - 0.5772156649015329 * beta
    assert(row.getAs[Double]("mean_cents") === mean)
    assert(row.getAs[Double]("beta_cents") === beta)
    assert(row.getAs[Double]("mu_cents") === mu)
    assert(row.getAs[Double]("rl100_cents") ===
      mu + 4.600149226776579 * beta)
    // EVT sanity: scale positive, location below the mean (Gumbel mean
    // = μ + γβ), 100-block return level above the observed mean
    assert(beta > 0 && mu < mean)
    assert(row.getAs[Double]("rl100_cents") > mean,
      "1-in-100 return level must exceed the typical weekly max")
    assert(n >= 100, "block grain must be non-trivial at fixture scale")
  }

  test("q485 source overlap: matrix is upper-triangular, bounded by the " +
      "source alphabet, and symmetric under relabeling") {
    val rows = SparkEntry.queries("q485_source_overlap")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty, "fixture must have cross-source verbatim grams")
    rows.foreach { case (a, b, n) =>
      assert(a < b, "strictly upper-triangular pair grain")
      assert(n >= 1L)
    }
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length,
      "one row per source pair")
    val nSources = Tables.documents(spark, TestSpark.sf)
      .select(col("source")).distinct().count()
    assert(rows.length <= nSources * (nSources - 1) / 2,
      "pair grain bounded by C(|sources|, 2)")
  }

  test("q486 runs test equals a driver-side replay of the daily series") {
    val row = SparkEntry.queries("q486_runs_test")(spark, TestSpark.sf)
      .head()
    val daily = Tables.events(spark, TestSpark.sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(30,6)")).as("v"))
      .orderBy(col("day"))
      .collect().map(r => r.getDecimal(1))
    val signs = daily.sliding(2).collect {
      case Array(a, b) if b.compareTo(a) != 0 =>
        if (b.compareTo(a) > 0) 1 else -1
    }.toSeq
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == -1).toLong
    val nRuns = if (signs.isEmpty) 0L
      else 1L + signs.sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Long]("n2") === n2)
    assert(row.getAs[Long]("n_runs") === nRuns)
    assert(row.getAs[Long]("mu_ppm") ===
      2 * n1 * n2 * 1000000L / math.max(n1 + n2, 1L) + 1000000L)
    assert(n1 > 0 && n2 > 0, "fixture series must move both ways")
  }

  test("q487 Jarque-Bera equals an exact-BigInt driver replay") {
    val rows = SparkEntry.queries("q487_jarque_bera")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val cents = Tables.customer(spark, TestSpark.sf)
      .select(col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(12,2)") * 100)
          .cast("decimal(10,0)").cast("long"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
    cents.groupBy(_._1).foreach { case (seg, xs) =>
      val v = xs.map(_._2)
      val n = v.length.toLong
      val (s1, s2, s3, s4) = (v.sum, v.map(x => x * x).sum,
        v.map(x => x * x * x).sum, v.map(x => x * x * x * x).sum)
      val mean = s1.toDouble / n
      val (r2, r3, r4) =
        (s2.toDouble / n, s3.toDouble / n, s4.toDouble / n)
      val m2 = r2 - mean * mean
      val m3 = r3 - 3 * mean * r2 + 2 * mean * mean * mean
      val m4 = r4 - 4 * mean * r3 + 6 * mean * mean * r2 -
        3 * mean * mean * mean * mean
      val skew = m3 / (m2 * math.sqrt(m2))
      val kurt = m4 / (m2 * m2) - 3.0
      val row = rows(seg)
      assert(row.getAs[Long]("n") === n, seg)
      assert(row.getAs[Double]("mean") === mean, seg)
      assert(row.getAs[Double]("skew") === skew, seg)
      assert(row.getAs[Double]("kurt_excess") === kurt, seg)
      assert(row.getAs[Double]("jb") ===
        n.toDouble / 6.0 * (skew * skew + kurt * kurt / 4.0), seg)
      assert(m2 > 0, s"$seg: degenerate variance would poison the test")
    }
    assert(rows.size >= 2, "segment grain must be non-trivial")
  }

  test("q488 prefix cache: per-source identities hold and planted " +
      "duplicate prefixes are counted") {
    val rows = SparkEntry.queries("q488_prefix_cache")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nPfx, dup, cacheable, total, ppm) =>
      assert(dup === nDocs - nPfx,
        s"$src: dup_prefix_docs must equal docs minus distinct prefixes")
      assert(cacheable <= dup * 32,
        s"$src: cacheable tokens bounded by 32 per duplicate doc")
      assert(cacheable <= total, s"$src: cannot cache more than exists")
      assert(ppm === (if (total > 0) cacheable * 1000000L / total else 0L),
        s"$src: ppm identity")
    }
    val docTotal = Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_._2).sum === docTotal,
      "every document lands in exactly one source row")
    assert(rows.map(_._4).sum > 0,
      "fixture's planted exact dups must share prefixes")
  }

  test("q426 Adamic-Adar equals a naive capped replay") {
    val items = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
      .filter { case (_, its) => its.size >= 2 && its.size <= 20 }
    val expected = baskets.toSeq.flatMap { case (_, its) =>
      val inv = 1000000000000L / lnMicro(its.size.toLong)
      for (a <- its; b <- its if a < b) yield (a, b) -> inv
    }.groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum))
      .filter(_._2._1 >= 2).toMap
    val got = SparkEntry.queries("q426_adamic_adar")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
  }

  /** Shared by the q492/q493 replays: the per-region daily revenue series
    * (r_name → sorted (t, y cents)) exactly as both queries stage it. */
  private def dailySeries(): Map[String, Seq[(Long, Long)]] = {
    val epoch = java.time.LocalDate.parse("1992-01-01")
    Tables.orders(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, TestSpark.sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, TestSpark.sf),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")).as("y"))
      .collect()
      .map(r => (r.getString(0),
        java.time.temporal.ChronoUnit.DAYS.between(
          epoch, r.getDate(1).toLocalDate),
        r.getLong(2)))
      .groupBy(_._1)
      .map { case (rn, xs) =>
        rn -> xs.map(x => (x._2, x._3)).sortBy(_._1).toSeq
      }
  }

  private def olsFit(pts: Seq[(Long, Long)]): (Long, Double, Double) = {
    val n = pts.length.toLong
    val st = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val stt = pts.map(p => p._1 * p._1).sum
    val sty = pts.map(p => p._1 * p._2).sum
    val mt = st.toDouble / n
    val my = sy.toDouble / n
    val vt = stt.toDouble / n - mt * mt
    val cty = sty.toDouble / n - mt * my
    val slope = cty / vt
    (n, slope, my - slope * mt)
  }

  test("q492 Durbin-Watson equals an exact driver replay; 0 < dw < 4") {
    val rows = SparkEntry.queries("q492_durbin_watson")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val series = dailySeries()
    assert(rows.keySet === series.keySet)
    series.foreach { case (rn, pts) =>
      val (n, slope, intercept) = olsFit(pts)
      val e = pts.map { case (t, y) =>
        math.floor(y.toDouble - (intercept + slope * t.toDouble)).toLong
      }
      val den = e.map(x => BigInt(x) * x).sum
      val num = e.sliding(2).collect { case Seq(a, b) =>
        val d = BigInt(b) - BigInt(a); d * d
      }.sum
      val dw = num.toDouble / den.toDouble
      val (gn, gs, gi, gdw) = rows(rn)
      assert(gn === n, rn)
      assert(gs === slope, rn)
      assert(gi === intercept, rn)
      assert(gdw === dw, rn)
      assert(gdw > 0.0 && gdw < 4.0, s"$rn: DW out of its (0,4) range")
    }
  }

  test("q493 Chow break equals an exact driver replay; split never " +
      "increases RSS") {
    val rows = SparkEntry.queries("q493_chow_break")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))))
      .toMap
    val split = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse("1992-01-01"),
      java.time.LocalDate.parse("1995-06-17"))
    def rssOf(pts: Seq[(Long, Long)]): Double = {
      val n = pts.length.toLong
      val st = pts.map(_._1).sum
      val sy = pts.map(_._2).sum
      val stt = pts.map(p => p._1 * p._1).sum
      val sty = pts.map(p => p._1 * p._2).sum
      val syy = pts.map(p => BigInt(p._2) * p._2).sum
      n.toDouble * ((syy.toDouble / n -
        (sy.toDouble / n) * (sy.toDouble / n)) -
        (sty.toDouble / n - (st.toDouble / n) * (sy.toDouble / n)) *
          (sty.toDouble / n - (st.toDouble / n) * (sy.toDouble / n)) /
          (stt.toDouble / n - (st.toDouble / n) * (st.toDouble / n)))
    }
    dailySeries().foreach { case (rn, pts) =>
      val (a, b) = pts.partition(_._1 < split)
      val (rss1, rss2, rssp) = (rssOf(a), rssOf(b), rssOf(pts))
      val f = ((rssp - rss1 - rss2) / 2.0d) /
        ((rss1 + rss2) / (a.length + b.length - 4).toDouble)
      val (gn1, gn2, g1, g2, gp, gf) = rows(rn)
      assert(gn1 === a.length.toLong, rn)
      assert(gn2 === b.length.toLong, rn)
      assert(g1 === rss1, rn)
      assert(g2 === rss2, rn)
      assert(gp === rssp, rn)
      assert(gf === f, rn)
      assert(rss1 + rss2 <= rssp * (1 + 1e-12),
        s"$rn: a free break point can never fit worse than the pooled line")
    }
  }

  test("q494 Bartlett equals an exact driver replay and is positive on " +
      "the fixture's unequal segment variances") {
    val got = SparkEntry.queries("q494_bartlett")(spark, TestSpark.sf)
      .collect()
    assert(got.length === 1)
    val segs = Tables.customer(spark, TestSpark.sf)
      .select(col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSeq }
    val per = segs.values.map { v =>
      val n = v.length.toLong
      val s1 = v.sum
      val s2 = v.map(x => x * x).sum
      val variance =
        (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1)
      (n, math.floor((n - 1) * math.log(variance) * 1000000).toLong,
        math.floor((n - 1) * variance).toLong, 1000000000000L / (n - 1))
    }.toSeq
    val k = per.length.toLong
    val nn = per.map(_._1).sum
    val t1 = per.map(_._2).sum
    val spn = per.map(_._3).sum
    val inv = per.map(_._4).sum
    val sp2 = spn.toDouble / (nn - k).toDouble
    val t = ((nn - k).toDouble * math.log(sp2) - t1.toDouble / 1000000.0d) /
      (1.0d + (inv.toDouble / 1000000000000.0d -
        1.0d / (nn - k).toDouble) / (3.0d * (k - 1).toDouble))
    val row = got.head
    assert(row.getAs[Long]("k") === k)
    assert(row.getAs[Long]("nn") === nn)
    assert(row.getAs[Double]("sp2") === sp2)
    assert(row.getAs[Double]("t_bartlett") === t)
    assert(t > 0.0, "fixture variances differ across segments")
  }

  test("q495 Welch t equals an exact driver replay; df within its " +
      "theoretical band") {
    val got = SparkEntry.queries("q495_welch_t")(spark, TestSpark.sf)
      .collect()
    assert(got.length === 1)
    val orders = Tables.orders(spark, TestSpark.sf)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nOrders = orders.values.sum
    val custs = Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = custs.length.toLong
    val groups = custs
      .map { case (ck, x) =>
        (if (orders.getOrElse(ck, 0L) * nCust >= nOrders) 1 else 0, x)
      }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSeq }
    def stats(v: Seq[Long]): (Long, Double, Double) = {
      val n = v.length.toLong
      val s1 = v.sum
      val s2 = v.map(x => x * x).sum
      (n, s1.toDouble / n,
        (s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1))
    }
    val (n0, m0, v0) = stats(groups(0))
    val (n1, m1, v1) = stats(groups(1))
    val se2 = v0 / n0 + v1 / n1
    val tW = (m1 - m0) / math.sqrt(se2)
    val df = se2 * se2 / ((v0 / n0) * (v0 / n0) / (n0 - 1) +
      (v1 / n1) * (v1 / n1) / (n1 - 1))
    val d = (m1 - m0) /
      math.sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2).toDouble)
    val row = got.head
    assert(row.getAs[Long]("n0") === n0)
    assert(row.getAs[Long]("n1") === n1)
    assert(row.getAs[Double]("mean0") === m0)
    assert(row.getAs[Double]("mean1") === m1)
    assert(row.getAs[Double]("t_welch") === tW)
    assert(row.getAs[Double]("df_welch") === df)
    assert(row.getAs[Double]("cohens_d") === d)
    assert(df >= math.min(n0, n1) - 1.0 && df <= (n0 + n1 - 2).toDouble,
      "Welch-Satterthwaite df must sit between min(n)-1 and pooled df")
  }

  test("q496 Ljung-Box equals an exact driver replay and is " +
      "non-negative") {
    val got = SparkEntry.queries("q496_ljung_box")(spark, TestSpark.sf)
      .collect()
    assert(got.length === 1)
    val epoch = java.time.LocalDate.parse("2024-01-01")
    val daily = Tables.events(spark, TestSpark.sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => java.time.temporal.ChronoUnit.DAYS.between(
        epoch, r.getDate(0).toLocalDate) -> r.getLong(1))
      .toMap
    val nn = daily.size.toLong
    val s1 = daily.values.sum
    val s2 = daily.values.map(x => BigInt(x) * x).sum.toDouble
    val mean = s1.toDouble / nn
    val terms = (1 to 7).map { k =>
      val pairs = daily.toSeq.flatMap { case (t, x) =>
        daily.get(t + k).map(y => (x, y))
      }
      val np = pairs.length.toLong
      val sx = pairs.map(_._1).sum
      val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum.toDouble
      val rho = (sxy - mean * (sx.toDouble + sy.toDouble) +
        np * mean * mean) / (s2 - nn * mean * mean)
      math.floor(rho * rho / (nn - k).toDouble * 1000000000000L).toLong
    }
    val lbSum = terms.sum
    val qLb = (nn * (nn + 2)).toDouble * (lbSum.toDouble / 1000000000000.0d)
    val row = got.head
    assert(row.getAs[Long]("n") === nn)
    assert(row.getAs[Long]("h") === 7L)
    assert(row.getAs[Long]("lb_sum_q") === lbSum)
    assert(row.getAs[Double]("q_lb") === qLb)
    assert(qLb >= 0.0)
  }

  test("q498 DoReMi reweight equals an exact driver replay; mixture " +
      "sums to ~1e6 ppm and moves weight toward high-loss sources") {
    val got = SparkEntry.queries("q498_doremi_reweight")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))))
      .toMap
    assert(got.nonEmpty)
    // from-scratch unigram-NLL replay (the q83 algebra) + the MW step
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        "[a-z0-9]+".r.findAllIn(r.getString(2).toLowerCase).toSeq))
    val counts = docs.flatMap(_._3).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val total = counts.values.sum
    val vq = counts.map { case (t, c) =>
      t -> math.floor(1e6 * (math.log(total.toDouble) -
        math.log(c.toDouble))).toLong
    }
    val perDoc = docs.filter(_._3.nonEmpty).map { case (id, src, ts) =>
      val nTok = ts.length.toLong
      val sumQ = ts.map(vq).sum
      (src, nTok, sumQ / nTok)
    }
    val perSrc = perDoc.groupBy(_._1).map { case (src, xs) =>
      val nTok = xs.map(_._2).sum
      src -> ((xs.length.toLong, nTok,
        xs.map(x => x._3 * x._2).sum / nTok,
        xs.map(x => x._3 * x._2).sum))
    }
    val rtok = perSrc.values.map(_._2).sum
    val refQ = perSrc.values.map(_._4).sum / rtok
    val u = perSrc.map { case (src, (nd, nt, nq, _)) =>
      src -> ((nd, nt, nq, nq - refQ,
        math.floor(nt.toDouble *
          math.exp((nq - refQ).toDouble / 1000000.0d)).toLong))
    }
    val tu = u.values.map(_._5).sum
    u.foreach { case (src, (nd, nt, nq, ex, uq)) =>
      val (gnd, gnt, gnq, gex, gwOld, gwNew) = got(src)
      assert(gnd === nd, src)
      assert(gnt === nt, src)
      assert(gnq === nq, src)
      assert(gex === ex, src)
      assert(gwOld === nt * 1000000L / rtok, src)
      assert(gwNew === uq * 1000000L / tu, src)
    }
    assert(got.keySet === u.keySet)
    val sumNew = got.values.map(_._6).sum
    assert(sumNew <= 1000000L && sumNew > 1000000L - got.size,
      "floor-quantized mixture must sum to 1e6 ppm minus sub-ppm dust")
    assert(got.values.exists(v => v._6 != v._5),
      "the multiplicative-weights step must actually move some weight")
  }

  test("q499 Breusch-Pagan equals an exact driver replay; LM bounded " +
      "by n") {
    val rows = SparkEntry.queries("q499_breusch_pagan")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val series = dailySeries()
    assert(rows.keySet === series.keySet)
    series.foreach { case (rn, pts) =>
      val (n, slope, intercept) = olsFit(pts)
      val e2 = pts.map { case (t, y) =>
        val e = math.floor(
          (y.toDouble - (intercept + slope * t.toDouble)) / 100.0d).toLong
        (t, BigInt(e) * e)
      }
      val st = pts.map(_._1).sum
      val stt = pts.map(p => p._1 * p._1).sum
      val se = e2.map(_._2).sum
      val ste = e2.map(p => BigInt(p._1) * p._2).sum
      val see = e2.map(p => p._2 * p._2).sum
      val mt = st.toDouble / n
      val me2 = se.toDouble / n
      val vt = stt.toDouble / n - mt * mt
      val vy = see.toDouble / n - me2 * me2
      val cty = ste.toDouble / n - mt * me2
      val r2 = cty * cty / (vt * vy)
      val (gn, gr2, glm) = rows(rn)
      assert(gn === n, rn)
      assert(gr2 === r2, rn)
      assert(glm === n.toDouble * r2, rn)
      assert(gr2 >= 0.0 && gr2 <= 1.0, s"$rn: R² out of [0,1]")
      assert(glm <= n.toDouble, s"$rn: LM = nR² cannot exceed n")
    }
  }

  test("q500 classical decomposition: exact identities hold on every " +
      "row and seasonal cells balance to zero") {
    val rows = SparkEntry.queries("q500_classical_decomposition")(
        spark, TestSpark.sf)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val epoch = java.time.LocalDate.parse("1992-01-01")
    rows.foreach { case (day, y, ma7, det7, dow, nDow, sumDow, remX) =>
      assert(det7 === y * 7 - ma7, s"$day: det7 identity")
      assert(dow === java.time.temporal.ChronoUnit.DAYS.between(epoch, day) % 7,
        s"$day: weekday cell")
      assert(remX === nDow * det7 - sumDow, s"$day: remainder identity")
    }
    // within each weekday cell the remainders sum to zero EXACTLY —
    // the division-free analogue of "residuals around the cell mean"
    rows.groupBy(_._5).foreach { case (dow, cell) =>
      assert(cell.map(_._8).sum === 0L,
        s"dow $dow: cross-multiplied remainders must cancel")
      assert(cell.map(_._4).sum === cell.head._7 * 1,
        s"dow $dow: cell total consistent")
      assert(cell.length.toLong === cell.head._6, s"dow $dow: cell size")
    }
    // trend window is ±3 ROWS of the t-ordered daily series (calendar
    // gaps close up, as in the engine's rows-frame): full replay
    val daily = Tables.orders(spark, TestSpark.sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")).as("y"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1))
      .sortBy(_._1)
    val ma = daily.sliding(7).map { w =>
      w(3)._1 -> w.map(_._2).sum
    }.toMap
    val got = rows.map(r => r._1 -> r._3).toMap
    assert(got === ma, "moving totals must equal the sliding-7 replay " +
      "over the t-ordered daily series")
  }

  test("q504 Granger equals an exact driver replay; restricted RSS " +
      "never beats unrestricted") {
    val got = SparkEntry.queries("q504_granger")(spark, TestSpark.sf)
      .collect()
    assert(got.length === 1)
    val daily = Tables.orders(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, TestSpark.sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, TestSpark.sf),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name").isin("EUROPE", "AMERICA"))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(
        sum(when(col("r_name") === "EUROPE",
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")).otherwise(0L)).as("x"),
        sum(when(col("r_name") === "AMERICA",
          (col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")).otherwise(0L)).as("y"),
        sum(when(col("r_name") === "EUROPE", 1L).otherwise(0L)).as("ne"),
        sum(when(col("r_name") === "AMERICA", 1L).otherwise(0L)).as("na"))
      .filter(col("ne") > 0 && col("na") > 0)
      .select(col("day"), col("x"), col("y"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val triples = daily.sliding(2).collect { case Array(p, c) =>
      (c._3, p._3, p._2) // (w = y_t, u = y_{t-1}, v = x_{t-1})
    }.toSeq
    val n = triples.length.toLong
    def dsum(f: ((Long, Long, Long)) => BigInt): BigInt = triples.map(f).sum
    val (su, sv, sw) = (triples.map(_._2).sum, triples.map(_._3).sum,
      triples.map(_._1).sum)
    val (mu, mv, mw) = (su.toDouble / n, sv.toDouble / n, sw.toDouble / n)
    val cuu = dsum(t => BigInt(t._2) * t._2).toDouble / n - mu * mu
    val cvv = dsum(t => BigInt(t._3) * t._3).toDouble / n - mv * mv
    val cww = dsum(t => BigInt(t._1) * t._1).toDouble / n - mw * mw
    val cuv = dsum(t => BigInt(t._2) * t._3).toDouble / n - mu * mv
    val cuw = dsum(t => BigInt(t._2) * t._1).toDouble / n - mu * mw
    val cvw = dsum(t => BigInt(t._3) * t._1).toDouble / n - mv * mw
    val det = cuu * cvv - cuv * cuv
    val bY = (cvv * cuw - cuv * cvw) / det
    val cX = (cuu * cvw - cuv * cuw) / det
    val rssU = cww - bY * cuw - cX * cvw
    val rssR = cww - cuw * cuw / cuu
    val f = (rssR - rssU) * (n - 3).toDouble / rssU
    val row = got.head
    assert(row.getAs[Long]("n") === n)
    assert(row.getAs[Double]("coef_ylag") === bY)
    assert(row.getAs[Double]("coef_xlag") === cX)
    assert(row.getAs[Double]("rss_u") === rssU)
    assert(row.getAs[Double]("rss_r") === rssR)
    assert(row.getAs[Double]("f_granger") === f)
    assert(rssR >= rssU - math.abs(rssU) * 1e-12,
      "dropping a regressor can never reduce RSS")
    assert(det > 0, "centered moment matrix must be positive definite")
  }
}
