package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Law-based differential checks over SEEDED random inputs: each law pits
  * a distributed operator against an independent driver-side brute-force
  * model on a batch of randomized scenarios. Deterministic seeds keep the
  * suite reproducible; inputs stay tiny so each case is a handful of local
  * Spark jobs.
  */
class LawsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("LAW funnel == per-user brute-force chain walk on random event sets") {
    val steps = Seq("a", "b", "c")
    val types = steps ++ Seq("x", "y") // noise types must be ignored
    val rnd = new Random(7)
    for (round <- 1 to 8) {
      val events = (1 to 40 + round).map { _ =>
        (rnd.nextInt(5) + 1L, ts(rnd.nextInt(60)),
          types(rnd.nextInt(types.size)))
      }
      val got = graft.ops.Temporal
        .funnel(events.toDF("u", "t", "ty"), "u", "t", "ty", steps)
        .collect()
        .map(r => r.getLong(0) ->
          ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
            Option(r.getTimestamp(3)), r.getInt(4)))).toMap
      val want = events.groupBy(_._1).flatMap { case (u, evs) =>
        def minAfter(step: String, after: Option[Timestamp]) =
          after.flatMap(a => evs.filter(e => e._3 == step && e._2.after(a))
            .map(_._2).sortBy(_.getTime).headOption)
        val t1 = evs.filter(_._3 == "a").map(_._2).sortBy(_.getTime).headOption
        if (t1.isEmpty) None else {
          val t2 = minAfter("b", t1)
          val t3 = minAfter("c", t2)
          Some(u -> ((t1, t2, t3, 1 + t2.size + t3.size)))
        }
      }
      assert(got === want, s"round $round diverged")

      // windowed variant: each step must land within 10 min of the
      // previous step's first-chain time
      val gapMs = 600000L
      val gotW = graft.ops.Temporal
        .funnel(events.toDF("u", "t", "ty"), "u", "t", "ty", steps,
          maxStepGapSeconds = Some(gapMs / 1000))
        .collect()
        .map(r => r.getLong(0) ->
          ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
            Option(r.getTimestamp(3)), r.getInt(4)))).toMap
      val wantW = events.groupBy(_._1).flatMap { case (u, evs) =>
        def minIn(step: String, after: Option[Timestamp]) =
          after.flatMap(a => evs.filter(e => e._3 == step && e._2.after(a) &&
              e._2.getTime <= a.getTime + gapMs)
            .map(_._2).sortBy(_.getTime).headOption)
        val t1 = evs.filter(_._3 == "a").map(_._2).sortBy(_.getTime).headOption
        if (t1.isEmpty) None else {
          val t2 = minIn("b", t1)
          val t3 = minIn("c", t2)
          Some(u -> ((t1, t2, t3, 1 + t2.size + t3.size)))
        }
      }
      assert(gotW === wantW, s"round $round windowed diverged")
    }
  }

  test("LAW applyCdcOps(old, snapshotDiff(old, new)) == new on random keyed tables") {
    val rnd = new Random(11)
    for (round <- 1 to 8) {
      def table() = (1 to 30).flatMap { k =>
        if (rnd.nextBoolean()) Some((k.toLong, s"s${rnd.nextInt(4)}",
          rnd.nextInt(100).toDouble))
        else None
      }
      val v0r = table(); val v1r = table()
      val v0 = v0r.toDF("k", "s", "v")
      val v1 = v1r.toDF("k", "s", "v")
      val diff = graft.ops.Relational
        .snapshotDiff(v0, v1, Seq("k"), Seq("s", "v"))
      val opLog = diff.select($"k", $"new_s".as("s"), $"new_v".as("v"),
        $"change_type".as("op"), lit(1L).as("ver"), $"k".as("tie"))
      val applied = graft.ops.Relational
        .applyCdcOps(v0, opLog, Seq("k"), "op", "ver", "tie")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(applied === v1r.toSet, s"round $round diverged")
    }
  }

  test("LAW bfsHops == driver-side BFS on random graphs") {
    val rnd = new Random(13)
    for (round <- 1 to 8) {
      val n = 12
      val pairs = (1 to 25).map(_ =>
        (rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L)).distinct
        .filter(p => p._1 != p._2)
      val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
      val seeds = Seq(1L, (rnd.nextInt(n) + 1).toLong).distinct
      val maxHops = 1 + rnd.nextInt(4)
      val got = graft.ops.Graph
        .bfsHops(edges, seeds.toDF("node"), maxHops)
        .as[(Long, Int)].collect().toMap
      // driver BFS
      val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
        .map { case (s, es) => s -> es.map(_._2).toSet }
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (h <- 1 to maxHops) {
        val next = frontier.flatMap(f => adj.getOrElse(f, Set.empty))
          .diff(dist.keySet)
        dist ++= next.map(_ -> h)
        frontier = next
      }
      assert(got === dist, s"round $round diverged (maxHops=$maxHops)")
    }
  }

  test("LAW merkleDiff == snapshotDiff on random snapshot pairs across bucket widths") {
    val rnd = new Random(23)
    for (round <- 1 to 6) {
      def snap(mutate: Boolean) = (1L to 80L).flatMap { k =>
        val dropped = mutate && rnd.nextInt(10) == 0
        if (dropped) None
        else Some((k, if (mutate && rnd.nextInt(8) == 0) s"m$k" else s"s$k",
          (k % 9).toString))
      }
      val v0 = snap(mutate = false).toDF("k", "a", "b")
      val v1 = (snap(mutate = true) ++
        Seq((900L + round, "new", "0"))).toDF("k", "a", "b")
      val nBuckets = Seq(4, 16, 64)(round % 3)
      val got = graft.ops.Relational
        .merkleDiff(v0, v1, Seq("k"), Seq("a", "b"), nBuckets)
        .collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"))).toSet
      val want = graft.ops.Relational
        .snapshotDiff(v0, v1, Seq("k"), Seq("a", "b"))
        .collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"))).toSet
      assert(got === want, s"round $round diverged (nBuckets=$nBuckets)")
    }
  }

  test("LAW winsorizedStats == driver brute force on random grouped doubles") {
    val rnd = new Random(17)
    for (round <- 1 to 6) {
      val rows = (1 to 60 + round).map(_ =>
        (s"g${rnd.nextInt(3)}", math.rint(rnd.nextGaussian() * 5000) / 100.0))
      val got = graft.ops.Profile
        .winsorizedStats(rows.toDF("g", "v"), "g", "v")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(6), r.getDouble(7)))).toMap
      val want = rows.groupBy(_._1).map { case (g, vs0) =>
        val vs = vs0.map(_._2).sorted
        val n = vs.size
        // Spark's exact interpolated percentile: pos = p·(n−1)
        def pct(p: Double) = {
          val pos = p * (n - 1)
          val lo = pos.toInt
          val frac = pos - lo
          if (lo + 1 < n) vs(lo) + frac * (vs(lo + 1) - vs(lo)) else vs(lo)
        }
        val (pLo, pHi) = (pct(0.05), pct(0.95))
        val clamped = vs.map(v => math.max(pLo, math.min(pHi, v)))
        val wsum = clamped.map(v =>
          BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
            .toLong).sum
        g -> ((n.toLong, vs.count(_ < pLo).toLong, vs.count(_ > pHi).toLong,
          wsum, wsum.toDouble / (n * 1e6)))
      }
      assert(got === want, s"round $round diverged")
    }
  }

  test("LAW sessionPaths == driver brute force on random event streams") {
    val types = Seq("A", "B", "C", "D")
    val rnd = new Random(19)
    for (round <- 1 to 6) {
      val events = (1 to 50 + round).map { i =>
        (i.toLong, rnd.nextInt(4) + 1L, ts(rnd.nextInt(300)),
          types(rnd.nextInt(types.size)))
      }
      val got = graft.ops.Temporal
        .sessionPaths(events.toDF("id", "u", "t", "ty"),
          "u", "t", "ty", tieCols = Seq("id"), gapSeconds = 1200L)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
          r.getLong(3)).toMap
      val want = events.groupBy(_._2).toSeq.flatMap { case (_, evs0) =>
        val evs = evs0.sortBy(e => (e._3.getTime, e._1))
        // split sessions on gaps >= 1200 s, then in-session trigrams
        val sessions = evs.foldLeft(List.empty[List[(Long, Long, Timestamp, String)]]) {
          case (acc, e) => acc match {
            case (cur @ (last :: _)) :: rest
              if e._3.getTime - last._3.getTime < 1200000L =>
              (e :: cur) :: rest
            case _ => List(e) :: acc
          }
        }.map(_.reverse)
        sessions.flatMap(sess => sess.map(_._4).sliding(3).filter(_.size == 3))
      }.groupBy(w => (w(0), w(1), w(2))).map { case (k, ws) => k -> ws.size.toLong }
      assert(got === want, s"round $round diverged")
    }
  }

  test("LAW intervalConcurrency == brute-force sweep on random interval sets") {
    val rnd = new Random(13)
    for (round <- 1 to 8) {
      // minute-granular random half-open intervals over a 3-hour span,
      // two keys; bucketSeconds varied so bucket boundaries land both ON
      // and BETWEEN interval endpoints
      val ivs = (1 to 30 + round).map { _ =>
        val s = rnd.nextInt(180)
        (if (rnd.nextBoolean()) "k1" else "k2",
          ts(s), ts(s + 1 + rnd.nextInt(40)))
      }
      val bucketSeconds = Seq(60L, 600L, 3600L)(round % 3)
      val got = graft.ops.Temporal
        .intervalConcurrency(ivs.toDF("k", "s_t", "e_t"),
          Seq("k"), "s_t", "e_t", bucketSeconds)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getTimestamp(2))))
        .toMap
      // driver sweep: sort (t, delta) with -1 first at equal t, scan
      val want = ivs.groupBy(_._1).map { case (k, is) =>
        val deltas = (is.map(i => (i._2.getTime, 1)) ++
          is.map(i => (i._3.getTime, -1))).sortBy(d => (d._1, d._2))
        var c = 0L; var mx = Long.MinValue; var peakT = 0L
        deltas.foreach { case (t, d) =>
          c += d
          if (c > mx) { mx = c; peakT = t }
        }
        k -> ((mx, new Timestamp(peakT)))
      }
      assert(got === want, s"round $round diverged (bucket=$bucketSeconds)")
    }
  }

  test("LAW distributedRank == naive global-window rank on random frames " +
      "(both tie modes, negative values, bucket widths straddling ties)") {
    val rnd = new Random(21)
    for (round <- 1 to 8) {
      // values drawn from a NARROW domain so ties are dense, spanning
      // negatives (acctbal cents go negative); keys unique
      val rows = (1L to (60 + round * 7).toLong)
        .map(k => (k, (rnd.nextInt(41) - 20).toLong))
      val df = rows.toDF("k", "v")
      // widths 1 (every distinct value its own bucket), a mid width, and
      // one wider than the whole domain (degenerates to the naive form)
      val width = Seq(1L, 7L, 1000L)(round % 3)

      // rank() mode: ties share the min rank
      val gotR = graft.ops.Stats
        .distributedRank(df, "v", out = "rk", bucketWidth = width)
        .select("k", "rk").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sortedV = rows.map(_._2).sorted
      val wantR = rows.map { case (k, v) =>
        k -> (sortedV.count(_ < v) + 1L)
      }.toMap
      assert(gotR === wantR, s"round $round rank() diverged (width=$width)")

      // row_number() mode over (v, k)
      val gotN = graft.ops.Stats
        .distributedRank(df, "v", tieBreak = Seq("k"), out = "rn",
          bucketWidth = width)
        .select("k", "rn").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val wantN = rows.sortBy(r => (r._2, r._1)).zipWithIndex
        .map { case ((k, _), i) => k -> (i + 1L) }.toMap
      assert(gotN === wantN,
        s"round $round row_number() diverged (width=$width)")

      // inclusive prefix sum of an indicator (the q355 running-ordinal
      // shape): addend = 1 iff the key is even
      val gotS = graft.ops.Stats
        .distributedPrefixSum(df, "v", Seq("k"),
          when(col("k") % 2 === 0, 1L).otherwise(0L), "ps",
          bucketWidth = width)
        .select("k", "ps").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ordered = rows.sortBy(r => (r._2, r._1))
      var acc = 0L
      val wantS = ordered.map { case (k, _) =>
        acc += (if (k % 2 == 0) 1L else 0L); k -> acc
      }.toMap
      assert(gotS === wantS,
        s"round $round prefixSum diverged (width=$width)")

      // strict prefix min over a second attribute (the skyline shape):
      // NULL exactly on the rows tied for the global minimum value
      val df2 = rows.map { case (k, v) => (k, v, (k * 31 % 17)) }
        .toDF("k", "v", "m")
      val gotM = graft.ops.Stats
        .distributedPrefixMin(df2, "v", "m", "pm", bucketWidth = width)
        .select("k", "pm").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val wantM = rows.map { case (k, v) =>
        val strictly = rows.filter(_._2 < v).map(r => r._1 * 31 % 17)
        k -> (if (strictly.isEmpty) None else Some(strictly.min))
      }.toMap
      assert(gotM === wantM,
        s"round $round prefixMin diverged (width=$width)")
    }
  }

  test("LAW driver-fold cardinality guards fail LOUDLY on a fact-scale " +
      "'alphabet' (guardedSmallFrame / guardedAlphabetArray) and stay " +
      "silent in bounds") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .take(12).map(_.toString).mkString("\n")
    // a degenerate domain: every row its own "state" — the q322-class
    // collect would absorb the fact table; the guard must raise with a
    // sizing message before the driver does
    val facts = (1L to 500L).map(k => (s"s$k", k)).toDF("st", "n")
    val big = intercept[Throwable] {
      graft.ops.Stats.guardedSmallFrame(facts, maxRows = 100,
        device = "law-test fold").collect()
    }
    assert(chain(big).contains("fact-scale") &&
      chain(big).contains("law-test fold"), chain(big))
    // in bounds: values AND row count unchanged
    val ok = graft.ops.Stats.guardedSmallFrame(
      facts.limit(50), maxRows = 100, device = "law-test fold")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ok.size === 50 && ok.contains(("s1", 1L)))

    // the collect_list alphabet twin (q423/q433 wiring)
    val arr = intercept[Throwable] {
      facts.agg(graft.ops.Stats.guardedAlphabetArray(
          collect_list(col("st")), maxLen = 100,
          device = "law-test alphabet").as("al"))
        .collect()
    }
    assert(chain(arr).contains("fact-scale") &&
      chain(arr).contains("law-test alphabet"), chain(arr))
    val okArr = facts.limit(50)
      .agg(graft.ops.Stats.guardedAlphabetArray(
        sort_array(collect_list(col("st"))), maxLen = 100,
        device = "law-test alphabet").as("al"))
      .head().getSeq[String](0)
    assert(okArr.size === 50 && okArr.contains("s1"))
  }

  test("LAW distributedRank family fails LOUDLY on a mis-sized bucketWidth " +
      "(all-one-bucket skew and bucket-explosion) instead of degrading") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .take(12).map(_.toString).mkString("\n")
    val df = (1L to 200L).map(k => (k, k % 7)).toDF("k", "v")

    // degenerate all-one-bucket domain (7 distinct values, width far
    // wider): the fattest-bucket guard must raise, never silently
    // recreate the single-task sort the device exists to prevent
    val fat = intercept[Throwable] {
      graft.ops.Stats.distributedRank(df, "v", tieBreak = Seq("k"),
          out = "rk", bucketWidth = 1L << 20, maxBucketRows = 100L)
        .collect()
    }
    assert(chain(fat).contains("fattest bucket"), chain(fat))

    // bucket explosion (unique values, width 1, bound below the count):
    // the broadcast-side guard must raise before the frame broadcasts
    val wide = (1L to 200L).map(k => (k, k)).toDF("k", "v")
    val many = intercept[Throwable] {
      graft.ops.Stats.distributedRank(wide, "v", tieBreak = Seq("k"),
          out = "rk", bucketWidth = 1L, maxBuckets = 50L)
        .collect()
    }
    assert(chain(many).contains("bucket-totals frame"), chain(many))

    // same wiring on the two siblings (one guard each suffices)
    val fatS = intercept[Throwable] {
      graft.ops.Stats.distributedPrefixSum(df, "v", Seq("k"), lit(1L),
          "ps", bucketWidth = 1L << 20, maxBucketRows = 100L)
        .collect()
    }
    assert(chain(fatS).contains("fattest bucket"), chain(fatS))
    val df2 = (1L to 200L).map(k => (k, k % 7, k % 17)).toDF("k", "v", "m")
    val fatM = intercept[Throwable] {
      graft.ops.Stats.distributedPrefixMin(df2, "v", "m", "pm",
          bucketWidth = 1L << 20, maxBucketRows = 100L)
        .collect()
    }
    assert(chain(fatM).contains("fattest bucket"), chain(fatM))

    // in-bounds frames stay silent: same calls, default bounds
    assert(graft.ops.Stats.distributedRank(df, "v", tieBreak = Seq("k"),
      out = "rk", bucketWidth = 1L << 20).count() === 200L)
  }

  test("LAW Mixture.waterfill == independent driver-side iterative " +
      "fixpoint waterfilling (exact rational saturation tests) on " +
      "random capacity/weight frames") {
    val rnd = new Random(31)
    for (round <- 1 to 12) {
      val k = 3 + rnd.nextInt(6)
      val rows = (1 to k).map(i =>
        (s"s$i", 1L + rnd.nextInt(100), 1L + rnd.nextInt(9)))
      val df = rows.toDF("source", "c", "w")
      val (num, den) = Seq((6L, 10L), (1L, 2L), (9L, 10L), (1L, 1L))(round % 4)
      val got = graft.llm.Mixture.waterfill(df, "source", num, den)
        .select("source", "capped", "alloc").collect()
        .map(r => r.getString(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap

      // independent model: iterate "mark any source whose proportional
      // share of the remaining budget covers its capacity" to fixpoint
      // (marking only raises the water level, so marks are monotone and
      // the fixpoint unique); exact BigInt cross-multiplication
      val b = rows.map(_._2).sum * num / den
      var capped = Set.empty[String]
      var changed = true
      while (changed) {
        changed = false
        val cc = rows.filter(r => capped(r._1)).map(_._2).sum
        val wu = rows.filter(r => !capped(r._1)).map(_._3).sum
        rows.filter(r => !capped(r._1)).foreach { r =>
          if (BigInt(r._2) * wu <= BigInt(b - cc).max(0) * r._3) {
            capped += r._1; changed = true
          }
        }
      }
      val cc = rows.filter(r => capped(r._1)).map(_._2).sum
      val wu = rows.filter(r => !capped(r._1)).map(_._3).sum
      val want = rows.map { r =>
        val alloc =
          if (capped(r._1)) r._2
          else math.min(r._2, math.max(0L, b - cc) * r._3 / wu)
        r._1 -> ((capped(r._1), alloc))
      }.toMap
      assert(got === want, s"round $round (b=$b, rows=$rows)")
      // invariants the recipe leans on, independent of either model
      val total = got.values.map(_._2).sum
      assert(total <= b, s"round $round overspent: $total > $b")
      got.foreach { case (s, (_, a)) =>
        val cap = rows.find(_._1 == s).get._2
        assert(a <= cap, s"round $round $s allocated past capacity")
      }
    }
  }

  test("Mixture.waterfill input-contract + overflow guards fire loudly " +
      "(round-11 ADVICE: degenerate inputs diverged engine vs oracle " +
      "instead of failing; Long-wrapping saturation tests were silent)") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .take(12).map(_.toString).mkString("\n")
    // negative capacity: the prefix-AND capped set is meaningless
    val negC = intercept[Throwable] {
      graft.llm.Mixture.waterfill(
        Seq(("a", -5L, 2L), ("b", 10L, 1L)).toDF("source", "c", "w"),
        "source", 1L, 2L).collect()
    }
    assert(chain(negC).contains("negative value"), chain(negC))
    // zero weight: divides by zero in the ratio order
    val zeroW = intercept[Throwable] {
      graft.llm.Mixture.waterfill(
        Seq(("a", 5L, 0L), ("b", 10L, 1L)).toDF("source", "c", "w"),
        "source", 1L, 2L).collect()
    }
    assert(chain(zeroW).contains("below 1"), chain(zeroW))
    // capacity grain that wraps the cross-multiplied saturation test:
    // Spark wraps Long silently where DuckDB raises — the guard makes
    // the engine the loud one
    val huge = intercept[Throwable] {
      graft.llm.Mixture.waterfill(
        Seq(("a", Long.MaxValue / 4, 3L), ("b", Long.MaxValue / 4, 5L))
          .toDF("source", "c", "w"),
        "source", 1L, 2L).collect()
    }
    assert(chain(huge).contains("overflows Long"), chain(huge))
    // in-bounds frames stay silent (the LAW test above covers values;
    // this pins that adding the guard changed no legal-input behavior)
    assert(graft.llm.Mixture.waterfill(
      Seq(("a", 5L, 1L), ("b", 10L, 2L)).toDF("source", "c", "w"),
      "source", 1L, 2L).count() === 2L)
  }
}
