package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right row at or before each left ts, per key; null when none") {
    val right = Seq(
      (1L, ts("2020-01-01 00:00:00"), 10.0),
      (1L, ts("2020-01-01 02:00:00"), 20.0),
      (2L, ts("2020-01-01 05:00:00"), 99.0)
    ).toDF("k", "ts", "v")
    val left = Seq(
      (100L, 1L, ts("2020-01-01 01:00:00")), // between the two -> 10.0
      (101L, 1L, ts("2020-01-01 02:00:00")), // exactly coincident -> 20.0 (>= semantics)
      (102L, 1L, ts("2020-01-01 03:00:00")), // after both -> 20.0
      (103L, 2L, ts("2020-01-01 04:00:00")), // before key-2's only row -> null
      (104L, 3L, ts("2020-01-01 04:00:00"))  // key with no right rows -> null
    ).toDF("id", "k", "ts")
    val got = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got === Map(
      100L -> Some(10.0), 101L -> Some(20.0), 102L -> Some(20.0),
      103L -> None, 104L -> None))
  }

  test("asofJoinForward: earliest right row at or after each left ts; " +
      "coincident rows visible; null when none follows") {
    val right = Seq(
      (1L, ts("2020-01-01 00:00:00"), 10.0),
      (1L, ts("2020-01-01 02:00:00"), 20.0),
      (2L, ts("2020-01-01 05:00:00"), 99.0)
    ).toDF("k", "ts", "v")
    val left = Seq(
      (100L, 1L, ts("2020-01-01 01:00:00")), // next is the 02:00 row
      (101L, 1L, ts("2020-01-01 02:00:00")), // exactly coincident -> 20.0
      (102L, 1L, ts("2020-01-01 03:00:00")), // nothing follows -> null
      (103L, 2L, ts("2020-01-01 04:00:00")), // key-2's row follows -> 99.0
      (104L, 3L, ts("2020-01-01 04:00:00"))  // key with no right rows -> null
    ).toDF("id", "k", "ts")
    val got = Temporal.asofJoinForward(left, right, Seq("k"), "ts", Seq("v"))
      .select($"id", $"v").as[(Long, Option[Double])].collect().toMap
    assert(got === Map(
      100L -> Some(20.0), 101L -> Some(20.0), 102L -> None,
      103L -> Some(99.0), 104L -> None))
  }

  test("sequenceDeltas: lag/lead/delta/day-gap per entity with total-order tie-break") {
    val df = Seq(
      (10L, 1L, ts("2024-01-01 00:00:00"), 100.0),
      (11L, 1L, ts("2024-01-03 00:00:00"), 150.0),
      (12L, 1L, ts("2024-01-03 00:00:00"), 120.0), // same ts as 11 — id breaks the tie
      (20L, 2L, ts("2024-02-01 00:00:00"), 50.0)   // singleton entity: all-NULL deltas
    ).toDF("id", "ent", "ts", "v")
    val got = Temporal.sequenceDeltas(df, "ent", "ts", "v", tieBreak = "id")
      .select($"id", $"prev_value", $"next_value", $"value_delta", $"days_since_prev")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Long])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(10L) === ((None, Some(150.0), None, None)))
    assert(got(11L) === ((Some(100.0), Some(120.0), Some(50.0), Some(2L))))
    assert(got(12L) === ((Some(150.0), None, Some(-30.0), Some(0L))))
    assert(got(20L) === ((None, None, None, None)))
    // column-contract guard: reserved output names must be rejected
    assertThrows[IllegalArgumentException](
      Temporal.sequenceDeltas(
        df.withColumnRenamed("v", "prev_value"), "ent", "ts", "prev_value", "id"))
  }

  test("rollingStats: trailing-window count/sum equal brute-force recomputation; RANGE includes ties") {
    import spark.implicits._
    val rows = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100L, 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 100L, 2.0),
      (3L, Timestamp.valueOf("2024-01-01 10:30:00"), 100L, 4.0),  // tie with 2
      (4L, Timestamp.valueOf("2024-01-01 11:15:00"), 100L, 8.0),  // 10:00 out of window
      (5L, Timestamp.valueOf("2024-01-01 10:40:00"), 200L, 16.0)) // other key
    val df = rows.toDF("event_id", "ts", "user_id", "value")
    val got = Temporal.rollingStats(df, "user_id", "ts", "value")
      .select($"event_id", $"n_win", $"sum_win").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((1L, 1.0)))
    // RANGE frame: both ties at 10:30 see each other regardless of order
    assert(got(2L) === ((3L, 7.0)))
    assert(got(3L) === ((3L, 7.0)))
    // trailing hour at 11:15 spans (10:15, 11:15]: events 2,3,4
    assert(got(4L) === ((3L, 14.0)))
    assert(got(5L) === ((1L, 16.0)))
    // brute-force cross-check on fixture events
    val ev = Tables.events(spark, TestSpark.sf).limit(500)
      .select($"event_id".cast("long"), $"ts", $"user_id".cast("long"), $"value")
    val fast = Temporal.rollingStats(ev, "user_id", "ts", "value")
      .select($"event_id", $"n_win").as[(Long, Long)].collect().toMap
    val raw = ev.select($"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"), $"user_id")
      .as[(Long, Long, Long)].collect()
    raw.foreach { case (id, us, u) =>
      val n = raw.count { case (_, us2, u2) => u2 == u && us2 <= us && us2 >= us - 3600000000L }
      assert(fast(id) === n.toLong, s"event $id")
    }
  }

  test("asofJoin struct carry: all attach columns come from the SAME right row") {
    val right = Seq(
      (1L, ts("2020-01-01 00:00:00"), Some(10.0), Some("a")),
      (1L, ts("2020-01-01 01:00:00"), None, Some("b")) // v null in the newest row
    ).toDF("k", "ts", "v", "tag")
    val left = Seq((7L, 1L, ts("2020-01-01 02:00:00"))).toDF("id", "k", "ts")
    val got = Temporal.asofJoin(left, right, Seq("k"), "ts", Seq("v", "tag"))
      .select($"v", $"tag").as[(Option[Double], String)].head()
    // the newest row wins as a unit: v is ITS null, not 10.0 seen through
    assert(got === (None, "b"))
  }

  test("asofJoin matches a brute-force inequality-join argmax on fixture events") {
    val ev = Tables.events(spark, TestSpark.sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("pv"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")

    val fast = Temporal.asofJoin(clicks, purchases, Seq("user_id"), "ts", Seq("pv"))
      .select($"event_id", $"pv").as[(Long, Option[Double])].collect().toMap

    // independent recomputation: inner-join eligible purchases, argmax on
    // p_ts; clicks with no eligible purchase must surface as None in `fast`
    val matched = clicks
      .join(purchases.select($"user_id", $"ts".as("p_ts"), $"pv"), Seq("user_id"))
      .filter($"p_ts" <= $"ts")
      .groupBy($"event_id")
      .agg(max_by($"pv", $"p_ts").as("pv"))
      .select($"event_id", $"pv").as[(Long, Double)].collect().toMap

    assert(fast.size === clicks.count())
    fast.foreach { case (id, v) => assert(v === matched.get(id), s"event $id") }
  }

  test("asofJoin plan shape: no join operator, one exchange (union + window only)") {
    val ev = Tables.events(spark, TestSpark.sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("pv"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val df = Temporal.asofJoin(clicks, purchases, Seq("user_id"), "ts", Seq("pv"))
    df.write.format("noop").mode("overwrite").save() // finalize AQE plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin must not produce a join:\n$plan")
    // the window pass shuffles once on the key; the purchases pre-agg adds
    // its own exchange upstream — but nothing may shuffle the union twice
    val windowExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(windowExchanges <= 2, s"unexpected extra shuffles:\n$plan")
  }

  test("rangeJoin: inclusive bounds, key isolation, grain-invariant result") {
    val points = Seq(
      (1L, ts("2020-01-01 00:10:00")),
      (1L, ts("2020-01-01 00:30:00")), // == hi, inclusive
      (1L, ts("2020-01-01 00:31:00")), // outside
      (2L, ts("2020-01-01 00:10:00"))  // right key, interval belongs to key 1
    ).toDF("k", "pt")
    val intervals = Seq(
      (900L, 1L, ts("2020-01-01 00:00:00"), ts("2020-01-01 00:30:00"))
    ).toDF("iid", "k", "lo", "hi")
    def run(grain: Long) =
      Temporal.rangeJoin(points, intervals, Seq("k"), "pt", "lo", "hi", grain)
        .select($"iid", $"pt").as[(Long, Timestamp)].collect().toSet
    val expected = Set((900L, ts("2020-01-01 00:10:00")), (900L, ts("2020-01-01 00:30:00")))
    assert(run(60L) === expected)
    assert(run(3600L) === expected)
    assert(run(7L) === expected) // grain not dividing the bounds evenly
  }

  test("rangeJoin with NO keys: pure interval containment still equi-joins on the cell") {
    val points = Seq(Tuple1(ts("2020-01-01 00:05:00")), Tuple1(ts("2020-01-01 09:00:00")))
      .toDF("pt")
    val intervals = Seq((1L, ts("2020-01-01 00:00:00"), ts("2020-01-01 01:00:00")))
      .toDF("iid", "lo", "hi")
    val got = Temporal.rangeJoin(points, intervals, Seq.empty, "pt", "lo", "hi", 600L)
      .select($"iid", $"pt").as[(Long, Timestamp)].collect().toSet
    assert(got === Set((1L, ts("2020-01-01 00:05:00"))))
  }

  test("overlapJoin: half-open semantics, multi-cell dedup, grain-invariant, key isolation") {
    val a = Seq(
      (1L, 10L, ts("2020-01-01 00:00:00"), ts("2020-01-01 02:00:00")), // long: many cells
      (1L, 11L, ts("2020-01-01 03:00:00"), ts("2020-01-01 04:00:00")), // touches b20's start
      (2L, 12L, ts("2020-01-01 00:30:00"), ts("2020-01-01 01:00:00"))  // other key
    ).toDF("k", "a_id", "a_lo", "a_hi")
    val b = Seq(
      (1L, 20L, ts("2020-01-01 01:00:00"), ts("2020-01-01 03:00:00")), // overlaps 10, touches 11
      (1L, 21L, ts("2020-01-01 05:00:00"), ts("2020-01-01 06:00:00"))  // disjoint
    ).toDF("k", "b_id", "b_lo", "b_hi")
    def run(grain: Long) =
      Temporal.overlapJoin(a, b, Seq("k"), "a_lo", "a_hi", "b_lo", "b_hi", grain)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq.sorted
    // half-open: touching at a point (11 ends where 20 starts… actually 20
    // ends at 03:00 where 11 starts) is NOT an overlap; key 2 never joins
    assert(run(600L) === Seq((10L, 20L)))
    assert(run(3600L) === Seq((10L, 20L)))
    assert(run(7L) === Seq((10L, 20L)), "pair must appear once despite sharing many cells")
  }

  test("overlapJoin matches a brute-force inequality join on fixture events") {
    val ev = Tables.events(spark, TestSpark.sf)
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id",
        $"ts".as("c_lo"), ($"ts" + expr("INTERVAL 20 MINUTES")).as("c_hi"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id",
        $"ts".as("p_lo"), ($"ts" + expr("INTERVAL 35 MINUTES")).as("p_hi"))
    val fast = Temporal.overlapJoin(c, p, Seq("user_id"),
        "c_lo", "c_hi", "p_lo", "p_hi", 1800L)
      .select($"c_id", $"p_id").as[(Long, Long)].collect().toSet
    val brute = c.join(p,
        c("user_id") === p("user_id") &&
          c("c_lo") < p("p_hi") && p("p_lo") < c("c_hi"))
      .select($"c_id", $"p_id").as[(Long, Long)].collect().toSet
    assert(fast === brute)
    assert(fast.nonEmpty, "fixture should produce overlapping windows")
  }

  test("overlapJoin: randomized intervals equal brute force at several grains") {
    val rnd = new scala.util.Random(17)
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      val lo = rnd.nextInt(100000)
      (rnd.nextInt(4).toLong, s"$tag$i",
        ts("2020-01-01 00:00:00").getTime / 1000 + lo,
        ts("2020-01-01 00:00:00").getTime / 1000 + lo + 1 + rnd.nextInt(7200))
    }.toDF("k", "id", "lo_s", "hi_s")
      .select($"k", $"id",
        timestamp_seconds($"lo_s").as("lo"), timestamp_seconds($"hi_s").as("hi"))
    val a = mk(120, "a").select($"k", $"id".as("a_id"), $"lo".as("a_lo"), $"hi".as("a_hi"))
    val b = mk(120, "b").select($"k", $"id".as("b_id"), $"lo".as("b_lo"), $"hi".as("b_hi"))
    val brute = a.join(b, a("k") === b("k") &&
        $"a_lo" < $"b_hi" && $"b_lo" < $"a_hi")
      .select($"a_id", $"b_id").as[(String, String)].collect().toSet
    for (grain <- Seq(60L, 977L, 3600L)) {
      val fast = Temporal.overlapJoin(a, b, Seq("k"),
          "a_lo", "a_hi", "b_lo", "b_hi", grain)
        .select($"a_id", $"b_id").as[(String, String)].collect().toSet
      assert(fast === brute, s"grain=$grain: ${fast.size} vs ${brute.size}")
    }
    assert(brute.nonEmpty)
  }

  test("rangeJoin matches a brute-force inequality join on fixture events") {
    val ev = Tables.events(spark, TestSpark.sf)
    val windows = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id",
        $"ts".as("lo"), ($"ts" + expr("INTERVAL 30 MINUTES")).as("hi"))
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"ts")
    val fast = Temporal.rangeJoin(clicks, windows, Seq("user_id"), "ts", "lo", "hi", 1800L)
      .select($"purchase_id", $"ts").as[(Long, Timestamp)].collect().toSet
    val brute = clicks.join(windows,
        clicks("user_id") === windows("user_id") &&
          clicks("ts") >= windows("lo") && clicks("ts") <= windows("hi"))
      .select($"purchase_id", clicks("ts")).as[(Long, Timestamp)].collect().toSet
    assert(fast === brute)
    assert(fast.nonEmpty, "fixture should produce at least one in-window click")
  }

  test("scd2: no-op changes collapse, duplicate ts resolved by tiebreak, open current version") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-02 00:00:00"), 2L, "A"),  // no-op: collapsed
      (1L, ts("2024-01-03 00:00:00"), 3L, "B"),
      (1L, ts("2024-01-03 00:00:00"), 4L, "C"),  // same ts as B: id orders it after
      (2L, ts("2024-01-05 00:00:00"), 5L, "Z")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Temporal
      .scd2(changes, "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((Option(r.getTimestamp(2)), Option(r.getTimestamp(3)), r.getInt(4))))
      .toMap
    assert(out.keySet === Set((1L, "A"), (1L, "B"), (1L, "C"), (2L, "Z")),
      "the collapsed no-op must not produce a version row")
    // A runs until B takes over; the duplicate-ts B version is zero-length
    assert(out((1L, "A")) ===
      ((Some(ts("2024-01-01 00:00:00")), Some(ts("2024-01-03 00:00:00")), 0)))
    assert(out((1L, "B")) ===
      ((Some(ts("2024-01-03 00:00:00")), Some(ts("2024-01-03 00:00:00")), 0)))
    assert(out((1L, "C")) === ((Some(ts("2024-01-03 00:00:00")), None, 1)))
    assert(out((2L, "Z")) === ((Some(ts("2024-01-05 00:00:00")), None, 1)))
  }

  test("rollingAnomaly: spike flagged, steady stream silent, cold start unjudged") {
    // 12 steady observations then one spike; per-minute spacing inside
    // one window
    val steady = (0 until 12).map(m =>
      (1L, ts(f"2024-01-01 10:$m%02d:00"), 100.0))
    val spike = Seq((1L, ts("2024-01-01 10:12:00"), 5000.0))
    // second key: identical spike pattern but only 3 trailing rows — below
    // minN, never judged
    val cold = Seq(
      (2L, ts("2024-01-01 10:00:00"), 100.0),
      (2L, ts("2024-01-01 10:01:00"), 100.0),
      (2L, ts("2024-01-01 10:02:00"), 5000.0))
    val df = (steady ++ spike ++ cold).toDF("user_id", "ts", "v")
    val got = graft.ops.Temporal
      .rollingAnomaly(df, "user_id", "ts", "v",
        windowMicros = 3600000000L, z = 3, minN = 12L)
      .select($"user_id", $"v_c").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 500000L)),
      "only the post-warmup spike flags; steady rows and the cold-start key stay silent")
  }

  test("funnel: strict ordering — out-of-order later steps don't advance the stage") {
    val ev = Seq(
      // u1: full funnel in order
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // u2: purchase BEFORE the first click — must stall at stage 2
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:30:00"), "purchase"),
      (2L, ts("2024-01-01 01:00:00"), "click"),
      // u3: click before any view — never enters stage 2
      (3L, ts("2024-01-01 01:00:00"), "view"),
      (3L, ts("2024-01-01 00:00:00"), "click"),
      // u4: no view at all — not in the funnel
      (4L, ts("2024-01-01 00:00:00"), "click"),
      // u5: two views, click between them — earliest view binds
      (5L, ts("2024-01-01 00:00:00"), "view"),
      (5L, ts("2024-01-01 00:10:00"), "click"),
      (5L, ts("2024-01-01 00:20:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Temporal
      .funnel(ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getInt(4))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 5L), "u4 never viewed — not an entrant")
    assert(out(1L)._4 === 3)
    assert(out(2L) === ((Some(ts("2024-01-01 00:00:00")),
      Some(ts("2024-01-01 01:00:00")), None, 2)),
      "pre-click purchase must not count as stage 3")
    assert(out(3L) === ((Some(ts("2024-01-01 01:00:00")), None, None, 1)))
    assert(out(5L)._2 === Some(ts("2024-01-01 00:10:00")))
  }

  test("funnel equals an independent per-user brute-force scan on fixture events") {
    // fixture ts is timestamp_ntz; cast for java.sql.Timestamp collection
    // (UTC session — both sides of the comparison read the same cast)
    val ev = Tables.events(spark, TestSpark.sf)
      .withColumn("ts", col("ts").cast("timestamp"))
    val steps = Seq("view", "click", "purchase")
    val got = Temporal.funnel(ev, "user_id", "ts", "event_type", steps)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)), r.getInt(4)))).toMap
    // driver-side reference: sort each user's events, walk the chain
    val byUser = ev.select($"user_id", $"ts", $"event_type")
      .as[(Long, Timestamp, String)].collect().groupBy(_._1)
    val want = byUser.flatMap { case (u, rows) =>
      def minAfter(step: String, after: Option[Timestamp]): Option[Timestamp] =
        after.flatMap(a => rows.filter(r => r._3 == step && r._2.after(a))
          .map(_._2).sortBy(_.getTime).headOption)
      val t1 = rows.filter(_._3 == "view").map(_._2).sortBy(_.getTime).headOption
      if (t1.isEmpty) None else {
        val t2 = minAfter("click", t1)
        val t3 = minAfter("purchase", t2)
        Some(u -> ((t1, t2, t3, 1 + t2.size + t3.size)))
      }
    }
    assert(got === want)
  }

  test("retentionCohorts: day-0 row counts every cohort member; offsets from first day") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 23:00:00")),
      (2L, ts("2024-01-01 23:30:00")), // same day twice — still one distinct
      (3L, ts("2024-01-02 00:00:00"))
    ).toDF("user_id", "ts")
    val out = Temporal.retentionCohorts(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L,   // u1 + u2 on their first day
      ("2024-01-01", 2L) -> 1L,   // u1 back two days later
      ("2024-01-02", 0L) -> 1L))  // u3's own cohort
  }

  test("resampleLocf: gaps carry the last value forward; leading grid points stay NULL") {
    val pts = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10.0),
      (1L, ts("2024-01-01 03:15:00"), 30.0),
      (2L, ts("2024-01-01 05:59:00"), 7.0)
    ).toDF("user_id", "ts", "v")
    val out = Temporal
      .resampleLocf(pts, Seq("user_id"), "ts", "v", "hour", 3600L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> Option(r.get(2))).toMap
    assert(out === Map(
      (1L, ts("2024-01-01 00:00:00")) -> None,        // before first obs
      (1L, ts("2024-01-01 01:00:00")) -> Some(10.0),  // LOCF across the gap
      (1L, ts("2024-01-01 02:00:00")) -> Some(10.0),
      (1L, ts("2024-01-01 03:00:00")) -> Some(10.0),  // 03:15 obs is later
      (2L, ts("2024-01-01 05:00:00")) -> None),       // single-point span
      "grid must span [trunc(min), trunc(max)] per key with LOCF values")
  }

  test("resampleLocf bounded staleness: grid points beyond the tolerance read NULL") {
    val pts = Seq(
      (1L, ts("2024-01-01 00:30:00"), 10.0),
      (1L, ts("2024-01-01 06:00:00"), 60.0)
    ).toDF("user_id", "ts", "v")
    val out = Temporal
      .resampleLocf(pts, Seq("user_id"), "ts", "v", "hour", 3600L,
        maxStalenessSeconds = Some(7200L))
      .collect()
      .map(r => r.getTimestamp(1).toString.take(13) -> Option(r.get(2))).toMap
    assert(out("2024-01-01 00") === None, "before first obs")
    assert(out("2024-01-01 01") === Some(10.0), "30 min stale — carried")
    assert(out("2024-01-01 02") === Some(10.0), "90 min stale — carried")
    assert(out("2024-01-01 03") === None, "150 min stale — past the 2 h bound")
    assert(out("2024-01-01 05") === None)
    assert(out("2024-01-01 06") === Some(60.0), "fresh observation")
  }

  test("sessionPaths: trigrams never cross a session gap; ties ordered by tie col") {
    val ev = Seq(
      // u1 session 1: A B C D -> trigrams ABC, BCD
      (1L, 100L, ts("2024-01-01 10:00:00"), "A"),
      (2L, 100L, ts("2024-01-01 10:05:00"), "B"),
      (3L, 100L, ts("2024-01-01 10:10:00"), "C"),
      (4L, 100L, ts("2024-01-01 10:15:00"), "D"),
      // 31-min gap -> new session: C B A -> trigram CBA only
      (5L, 100L, ts("2024-01-01 10:46:00"), "C"),
      (6L, 100L, ts("2024-01-01 10:50:00"), "B"),
      (7L, 100L, ts("2024-01-01 10:55:00"), "A"),
      // u2: tie at equal ts resolved by event_id -> ABC, not BAC
      (10L, 200L, ts("2024-01-01 12:00:00"), "A"),
      (11L, 200L, ts("2024-01-01 12:00:00"), "B"),
      (12L, 200L, ts("2024-01-01 12:01:00"), "C")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Temporal
      .sessionPaths(ev, "user_id", "ts", "event_type",
        tieCols = Seq("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(out === Map(
      ("A", "B", "C") -> 2L,   // u1 session 1 + u2's tie-ordered run
      ("B", "C", "D") -> 1L,
      ("C", "B", "A") -> 1L),  // second session only — no cross-gap DCB/CBA mix
      "gap must reset the path window and ties must follow event_id")
  }

  test("intervalConcurrency: half-open touch doesn't overlap; peak and earliest peak instant exact") {
    val iv = Seq(
      // key "a": [10:00,10:30) [10:10,10:40) [10:20,10:50) -> 3 live at
      // 10:20; [10:30,11:00) starts exactly as the first ends (touching,
      // NOT overlapping under half-open) -> peak stays 3, first at 10:20
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      ("a", ts("2024-01-01 10:10:00"), ts("2024-01-01 10:40:00")),
      ("a", ts("2024-01-01 10:20:00"), ts("2024-01-01 10:50:00")),
      ("a", ts("2024-01-01 10:30:00"), ts("2024-01-01 11:00:00")),
      // key "b": disjoint intervals -> peak 1 at the FIRST start
      ("b", ts("2024-01-01 09:00:00"), ts("2024-01-01 09:10:00")),
      ("b", ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00"))
    ).toDF("k", "s_t", "e_t")
    // bucketSeconds = 60 forces many cumsum buckets so the two-phase
    // decomposition (not the degenerate one-bucket case) is what's tested
    val out = Temporal
      .intervalConcurrency(iv, Seq("k"), "s_t", "e_t", bucketSeconds = 60L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getTimestamp(2)))).toMap
    assert(out === Map(
      "a" -> ((3L, ts("2024-01-01 10:20:00"))),
      "b" -> ((1L, ts("2024-01-01 09:00:00")))),
      "half-open sweep: -1 before +1 at equal t; earliest peak instant")
  }
}
