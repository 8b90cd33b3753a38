package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profile

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profileColumns: counts, nulls, distinct, min/max per column in one frame") {
    val df = Seq(
      (1L, Some("a"), 1.5), (2L, None, 2.5), (3L, Some("a"), 1.5),
      (4L, Some("b"), -1.0)
    ).toDF("id", "s", "v")
    val out = Profile.profileColumns(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(out("id") === ((4L, 0L, 4L, Some("1"), Some("4"))))
    assert(out("s") === ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(out("v")._1 === 4L)
    assert(out("v")._3 === 3L, "distinct over the string form")
  }

  test("madOutliers: heavy tail flagged by MAD, zero-spread group flags nothing extra") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("a", 5L, 100.0), // med 3, devs (2,1,0,1,97), mad 1 -> only 100 flags
      ("b", 6L, 5.0), ("b", 7L, 5.0), ("b", 8L, 5.0) // mad 0, all dev 0
    ).toDF("g", "id", "v")
    val out = graft.ops.Profile
      .madOutliers(df, "g", "v", keepCols = Seq("id"), k = 3.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 5L, 100.0)))
  }

  test("keySkewProfile: uniform keys gini ~ 0, degenerate key gini -> 1, top-k ranked") {
    val uniform = (1 to 100).map(i => (i % 10).toString).toDF("k")
    val gU = Profile.keySkewProfile(uniform, "k", topK = 3)
      .filter($"key" === "__gini__").collect()(0).getLong(2)
    assert(gU === 0L, "10 keys x 10 rows each is perfectly uniform")

    val skewed = (("hot" * 1) * 1, 1) // placate scalafmt
    val skewDf = ((1 to 991).map(_ => "hot") ++ Seq("a", "b", "c", "d", "e",
      "f", "g", "h", "i")).toDF("k")
    val rows = Profile.keySkewProfile(skewDf, "k", topK = 2).collect()
    val gS = rows.filter(_.getString(0) == "__gini__")(0).getLong(2)
    assert(gS > 880000L && gS < 1000000L,
      s"one key owning 99.1% of rows must push gini toward 1, got $gS")
    val top = rows.filter(_.getString(0) != "__gini__")
      .sortBy(_.getLong(2)).map(r => (r.getString(0), r.getLong(1)))
    assert(top(0) === (("hot", 991L)))
    assert(top(1)._2 === 1L)
  }

  test("winsorizedStats: clamp counts, exact bounds, order-free clamped mean") {
    // group "a": values 1..20 -> p05 = 1.95, p95 = 19.05 (exact
    // interpolated percentile); 1 clamps low, 20 clamps high.
    val df = ((1 to 20).map(i => ("a", i.toDouble)) ++
      Seq(("b", 5.0), ("b", 7.0))).toDF("g", "v")
    val out = Profile.winsorizedStats(df, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") === 20L)
    assert(a.getAs[Long]("n_low") === 1L, "only v=1 sits below p05")
    assert(a.getAs[Long]("n_high") === 1L, "only v=20 sits above p95")
    assert(math.abs(a.getAs[Double]("p_lo") - 1.95) < 1e-9)
    assert(math.abs(a.getAs[Double]("p_hi") - 19.05) < 1e-9)
    // clamped sum = (2..19 sum = 189) + 1.95 + 19.05 = 210.0
    assert(a.getAs[Long]("wsum_micros") === 210000000L)
    assert(a.getAs[Double]("wmean") === 10.5)
    // two-point group: p05 = 5.1, p95 = 6.9 — both points clamp inward,
    // but the winsorized mean stays the midpoint
    val b = out("b")
    assert(b.getAs[Long]("n_low") === 1L)
    assert(b.getAs[Long]("n_high") === 1L)
    assert(b.getAs[Double]("wmean") === 6.0)
    assert(a.getAs[Long]("n_null") === 0L)
  }

  test("winsorizedStats: NULL values are excluded and surfaced, not clamped to p_hi") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("a", None)).toDF("g", "v")
    val r = Profile.winsorizedStats(df, "g", "v", pLo = 0.0, pHi = 1.0)
      .collect()(0)
    // without the null filter, least/greatest would map each NULL to
    // p_hi=3.0 and report n=5, wmean=(1+2+3+3+3)/5; the contract is
    // n=3 present rows, n_null=2, mean over present values only
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("n_null") === 2L)
    assert(r.getAs[Double]("wmean") === 2.0)
    // an ALL-NULL group must still surface (n=0, its n_null) rather
    // than vanish from the report
    val withDead = df.unionByName(
      Seq(("dead", None: Option[Double]), ("dead", None)).toDF("g", "v"))
    val dead = Profile.winsorizedStats(withDead, "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap.apply("dead")
    assert(dead.getAs[Long]("n") === 0L)
    assert(dead.getAs[Long]("n_null") === 2L)
    assert(dead.getAs[Long]("n_low") === 0L)
  }

  test("HLL merge law: shard-union estimate equals one-shot estimate; error bounded") {
    import org.apache.spark.sql.functions.{expr, col}
    // 60k values, 20k distinct — dense HLL regime, where merge order
    // could plausibly matter if sketches weren't truly mergeable
    val df = spark.range(60000)
      .selectExpr("id % 8 AS shard", "CAST(id % 20000 AS STRING) AS v")
    val oneShot = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 12))"))
      .collect()(0).getLong(0)
    val viaShards = df.groupBy(col("shard"))
      .agg(expr("hll_sketch_agg(v, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .collect()(0).getLong(0)
    // the union operator's coupon handling is not bit-identical to a
    // single-pass sketch — the merge contract is the error bound
    assert(math.abs(viaShards - oneShot).toDouble / oneShot < 0.01,
      s"shard-union $viaShards must land within 1% of one-shot $oneShot")
    assert(math.abs(oneShot - 20000L) < 1000L,
      s"lgK=12 HLL must land within ~5% of the exact 20k, got $oneShot")
  }

  test("expectations: NULL counts as violation; uniqueness counts duplicated-key rows") {
    val df = Seq(
      (Some(1L), Some(10.0)),
      (Some(1L), Some(-5.0)),   // dup key + negative value
      (Some(2L), None),         // null value -> violates v_positive
      (None, Some(3.0))         // null key  -> violates key_not_null
    ).toDF("id", "v")
    val out = Profile.expectations(df, Seq(
        "key_not_null" -> $"id".isNull,
        "v_positive" -> !($"v" > 0.0)),
        uniqueKeys = Seq("id"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("key_not_null") === ((4L, 1L, false)))
    // -5.0 violates outright; NULL v makes the predicate NULL -> violation
    assert(out("v_positive") === ((4L, 2L, false)))
    // both rows of key 1 count as rows-in-duplicated-keys
    assert(out("unique(id)") === ((4L, 2L, false)))

    val clean = Profile.expectations(
        df.filter($"id".isNotNull && $"v" > 0.0),
        Seq("v_positive" -> !($"v" > 0.0)))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    assert(clean.toSeq === Seq(("v_positive", 0L, true)))
  }

  test("LAW weightedMedian == driver brute force on random weighted groups") {
    val rnd = new scala.util.Random(41)
    for (round <- 1 to 6) {
      val rows = (1 to 40 + round).map(_ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(1000).toLong,
          rnd.nextInt(9) + 1L))
      val got = Profile
        .weightedMedian(rows.toDF("g", "v", "wt"), "g", "v", "wt")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val tot = rs.map(_._3).sum
        val sorted = rs.sortBy(_._2)
        var cum = 0L
        val med = sorted.find { r => cum += r._3; cum * 2 >= tot }.get._2
        g -> ((med, tot))
      }
      assert(got === want, s"round $round diverged")
    }
  }

  test("expectations: rule names with quotes/backslashes round-trip verbatim") {
    // names travel as typed lits, never through a SQL string — the
    // expr(stack(...)) form would mangle the backslash or break on '
    val nasty = Seq("""has\backslash""", "has'quote", "unié中code")
    val out = Profile.expectations(
        Seq((1L, 2.0)).toDF("id", "v"),
        nasty.map(n => n -> !($"v" > 0.0)))
      .collect().map(_.getString(0)).toSeq
    assert(out === nasty)
  }
}
