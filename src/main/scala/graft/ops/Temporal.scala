package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark's built-in operator set lacks: as-of join and
  * point-in-interval range join. Both are composed from shuffle-minimal
  * primitives (per the engine rule: compose existing ops before reaching
  * for a custom SparkPlan).
  *
  * Scale design:
  *   - [[asofJoin]] is NOT a join at all: both sides union into one stream,
  *     one hash shuffle on the key, one per-key sort, one incremental
  *     window pass (`last(_, ignoreNulls)` over unbounded-preceding runs in
  *     O(rows)). A join formulation (`l.ts >= r.ts` + argmax) shuffles both
  *     sides AND explodes the inequality pairs before pruning; the union
  *     form's shuffle carries exactly |L| + |R| rows at any scale.
  *   - [[rangeJoin]] never evaluates the inequality against the full cross
  *     product: both sides are bucketed to coarse time cells (intervals
  *     explode to the cells they overlap), the join is EQUI on
  *     (keys, cell) — shuffle-partitionable, AQE-skew-splittable — and the
  *     residual `lo <= p <= hi` filters within cells only. Work scales with
  *     cell co-occupancy, not |P|×|I|.
  */
object Temporal {

  /** As-of join: attach to each left row the LATEST right row with
    * `right.ts <= left.ts` in the same key group (the time-series "most
    * recent fact as of" join — DuckDB `ASOF JOIN`, kdb `aj`). Left rows with
    * no prior right row keep NULL attach columns (left-outer semantics).
    *
    * Contract: `right`'s columns must be exactly `keys ++ tsCol ++
    * attachCols`; `attachCols` must not collide with `left`'s columns; and
    * (key, ts) should be unique on the right — pre-aggregate if not, or
    * which duplicate wins is unspecified (as in DuckDB/kdb).
    *
    * Attach columns are carried as ONE struct, so all values always come
    * from the SAME right row even when some of its fields are null. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      attachCols: Seq[String]): DataFrame =
    asofImpl(left, right, keys, tsCol, attachCols, forward = false)

  /** FORWARD as-of: each left row attaches the EARLIEST right row at or
    * after its timestamp — the "next reading / next fill" lookup
    * (backward [[asofJoin]]'s mirror; same union-window shape, one
    * shuffle, no inequality join; the only difference is the window's
    * ts direction). Exactly-coincident right rows are visible, ties
    * within the right side resolve to the window order like the
    * backward form. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      attachCols: Seq[String]): DataFrame =
    asofImpl(left, right, keys, tsCol, attachCols, forward = true)

  /** Backward as-of with a FRESHNESS TOLERANCE — the "stale quote is no
    * quote" rule every market-data / feature-store lookup needs: the
    * match is [[asofJoin]]'s match, but a right row older than
    * `toleranceUs` microseconds is nulled AFTER the window (a pure
    * post-projection — the tolerance must never turn the one-shuffle
    * union-window shape into a range join). Requires TIMESTAMP ts on
    * both sides. `matched_ts` and a 0/1 `fresh` flag ride the output so
    * staleness is auditable, never silent. */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      attachCols: Seq[String],
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"tolerance must be >= 0, got $toleranceUs")
    val joined = asofImpl(left,
      right.withColumn("__match_ts", col(tsCol)),
      keys, tsCol, attachCols :+ "__match_ts", forward = false)
    // fixture timestamps are NTZ; unix_micros wants TIMESTAMP (q319 rule)
    val fresh = col("__match_ts").isNotNull &&
      unix_micros(col(tsCol).cast("timestamp")) -
        unix_micros(col("__match_ts").cast("timestamp")) <= toleranceUs
    attachCols.foldLeft(joined) { (df, c) =>
        df.withColumn(c, when(fresh, col(c)))
      }
      .withColumn("matched_ts", when(fresh, col("__match_ts")))
      .withColumn("fresh", fresh.cast("long"))
      .drop("__match_ts")
  }

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      attachCols: Seq[String],
      forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(attachCols.nonEmpty, "asofJoin needs at least one attach column")
    val rightCols = right.columns.toSet
    require(rightCols == (keys ++ Seq(tsCol) ++ attachCols).toSet,
      s"right side must be exactly keys+ts+attach, got ${right.columns.mkString(",")}")
    require(attachCols.forall(!left.columns.contains(_)),
      "attach columns collide with left columns — rename before joining")

    val l = left.withColumn("__side", lit(1))
      .withColumn("__asof", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          attachCols.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val r = right
      .withColumn("__asof", struct(attachCols.map(col): _*))
      .drop(attachCols: _*)
      .withColumn("__side", lit(0))
    // right (side 0) sorts BEFORE left (side 1) at equal ts, so an
    // exactly-coincident right row is visible to the left row in BOTH
    // directions; forward mode just walks the timeline from the other
    // end (ts desc) so "last seen" becomes "earliest at-or-after"
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        attachCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Point-in-interval range join: every (point, interval) pair with the
    * same keys and `lo <= point <= hi` (inclusive bounds).
    *
    * `grainSeconds` is the bucketing grain: intervals explode to the grain
    * cells they overlap, points map to exactly one cell, and the join is
    * equi on (keys, cell) with the interval predicate as a residual filter.
    * Pick the grain near the typical interval length — each interval emits
    * `len/grain + 1` rows (too fine explodes the build side; too coarse
    * degrades toward per-cell cross products). A point meets an interval in
    * exactly one cell, so no post-join dedup is needed.
    *
    * Column contract: `points` and `intervals` may share only the key
    * columns. Timestamps may be timestamp or timestamp_ntz. */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointTs: String,
      loCol: String,
      hiCol: String,
      grainSeconds: Long): DataFrame = {
    require(grainSeconds > 0, "grainSeconds must be positive")
    val overlap = (points.columns.toSet -- keys)
      .intersect(intervals.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"points/intervals share non-key columns: ${overlap.mkString(",")}")
    def cellOf(c: String) =
      expr(s"cast(cast(`$c` as timestamp) as bigint) div $grainSeconds")
    val p = points.withColumn("__cell", cellOf(pointTs))
    val i = intervals
      .withColumn("__cell", explode(sequence(cellOf(loCol), cellOf(hiCol))))
    p.join(i, keys :+ "__cell")
      .filter(col(pointTs) >= col(loCol) && col(pointTs) <= col(hiCol))
      .drop("__cell")
  }

  /** INTERVAL×INTERVAL overlap join — the third temporal join shape next
    * to [[asofJoin]] (point→latest) and [[rangeJoin]] (point∈interval):
    * pairs of intervals with `a.lo < b.hi AND b.lo < a.hi` (half-open
    * overlap), the session-vs-session / downtime-vs-deploy analytics
    * shape. Same grain-cell decomposition as [[rangeJoin]] — both sides
    * explode to their covered cells and meet equi on (keys, cell) — but
    * unlike the point form an overlapping pair can share SEVERAL cells,
    * so the join result dedups on the pair identity before the residual
    * predicate. Shuffle carries `len/grain + 1` rows per interval; no
    * inequality-only join (which Spark would execute as a per-key cross
    * product) ever forms. */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftLo: String, leftHi: String,
      rightLo: String, rightHi: String,
      grainSeconds: Long): DataFrame = {
    require(grainSeconds > 0, "grainSeconds must be positive")
    val overlap = (left.columns.toSet -- keys)
      .intersect(right.columns.toSet -- keys)
    require(overlap.isEmpty,
      s"left/right share non-key columns: ${overlap.mkString(",")}")
    def cellOf(c: String) =
      expr(s"cast(cast(`$c` as timestamp) as bigint) div $grainSeconds")
    val l = left.withColumn("__cell",
      explode(sequence(cellOf(leftLo), cellOf(leftHi))))
    val r = right.withColumn("__cell",
      explode(sequence(cellOf(rightLo), cellOf(rightHi))))
    l.join(r, keys :+ "__cell")
      .drop("__cell")
      .distinct() // a pair overlapping k cells must appear once, not k times
      .filter(col(leftLo) < col(rightHi) && col(rightLo) < col(leftHi))
  }

  /** RANGE-frame rolling aggregate: per partition key, the count and exact
    * sum of `valueCol` over the trailing `windowMicros` (inclusive of the
    * current row and all ties on the timestamp — RANGE, not ROWS,
    * semantics). One hash shuffle on the key + one per-key sort; the frame
    * scan is incremental, O(rows) per partition. The sum accumulates in
    * decimal inside the frame (order-free, engine-portable — the
    * [[Relational.exactSum]] discipline applied to a window).
    *
    * Column contract: appends `ts_us` (epoch micros of `tsCol`), `n_win`,
    * and `sum_win` — the input must not already use those names (they
    * would be overwritten). `tsCol` may be timestamp or timestamp_ntz. */
  def rollingStats(
      df: DataFrame,
      partCol: String,
      tsCol: String,
      valueCol: String,
      windowMicros: Long = 3600000000L): DataFrame = {
    val reserved = Seq("ts_us", "n_win", "sum_win").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"rollingStats appends ${reserved.mkString(",")} — rename the input column(s)")
    val w = Window.partitionBy(col(partCol)).orderBy(col("ts_us"))
      .rangeBetween(-windowMicros, 0L)
    // NTZ → session-TZ timestamp (engine pins UTC) before epoch extraction;
    // DuckDB's epoch_us on the naive timestamp is the same as-if-UTC value
    df.withColumn("ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("n_win", count(lit(1)).over(w).cast("long"))
      .withColumn("sum_win",
        sum(col(valueCol).cast("decimal(30,2)")).over(w).cast("double"))
  }

  /** Rolling z-score anomaly detection, exactly reproducible: values are
    * quantized to cents, one RANGE window (same trailing-interval frame as
    * [[rollingStats]]) supplies count n, sum S, and sum-of-squares Q, and
    * the z·σ test runs denominator-free in DECIMAL(38,0):
    *
    *   (v − S/n)² > z²·(nQ − S²)/n²   ⟺   (n·v − S)² > z²·(nQ − S²)
    *
    * so no float division or sqrt ever happens — the flag set is
    * bit-identical across engines (the DuckDB mirror uses HUGEINT, the
    * q42 discipline). Rows with fewer than `minN` trailing observations
    * are not judged (cold-start guard). Emits only flagged rows.
    * Magnitude contract: |v_c| ≤ ~1e9 with windows ≤ ~1e9 rows keeps every
    * product under 38 digits; wider data needs a bigger decimal, not a
    * different algorithm. One shuffle on the key + one per-key sort, the
    * [[rollingStats]] scale shape. */
  def rollingAnomaly(
      df: DataFrame,
      partCol: String,
      tsCol: String,
      valueCol: String,
      windowMicros: Long = 3600000000L,
      z: Int = 3,
      minN: Long = 12L): DataFrame = {
    val w = Window.partitionBy(col(partCol)).orderBy(col("ts_us"))
      .rangeBetween(-windowMicros, 0L)
    df.withColumn("ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("v_c", floor(col(valueCol) * 100).cast("decimal(38,0)"))
      .withColumn("n_w", count(lit(1)).over(w).cast("decimal(38,0)"))
      .withColumn("s_w", sum(col("v_c")).over(w).cast("decimal(38,0)"))
      .withColumn("q_w", sum(col("v_c") * col("v_c")).over(w).cast("decimal(38,0)"))
      .filter(col("n_w") >= lit(minN))
      .withColumn("d", col("n_w") * col("v_c") - col("s_w"))
      .filter(col("d") * col("d") >
        lit(z.toLong * z) * (col("n_w") * col("q_w") - col("s_w") * col("s_w")))
      .select(col(partCol), col("ts_us"), col("v_c").cast("bigint").as("v_c"),
        col("n_w").cast("bigint").as("n_w"))
  }

  /** LAG/LEAD sequence deltas: per entity, each row sees its predecessor's
    * and successor's value plus the value delta and the day gap — the
    * order-history / time-between-events shape (churn features, inter-
    * arrival analysis). One hash shuffle on the entity key + one per-key
    * sort serves all four window expressions (single Window node, no
    * repeated exchange). `tieBreak` must make the ordering total, or
    * lag/lead are nondeterministic under ties — same discipline as
    * [[Relational.groupedTopK]]. First/last rows keep NULLs (no default
    * fill): a NULL gap is "no predecessor", which downstream feature code
    * must see, not a smuggled 0. Appends prev_value, next_value,
    * value_delta (IEEE subtraction — deterministic), days_since_prev. */
  def sequenceDeltas(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String,
      tieBreak: String): DataFrame = {
    val reserved = Seq("prev_value", "next_value", "value_delta", "days_since_prev")
      .filter(df.columns.contains)
    require(reserved.isEmpty,
      s"sequenceDeltas appends ${reserved.mkString(",")} — rename the input column(s)")
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieBreak))
    df.withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn("next_value", lead(col(valueCol), 1).over(w))
      .withColumn("value_delta", col(valueCol) - col("prev_value"))
      .withColumn("days_since_prev",
        datediff(to_date(col(tsCol)), to_date(lag(col(tsCol), 1).over(w)))
          .cast("long"))
  }

  /** Slowly-changing-dimension type-2 history build from a change log:
    * each surviving change becomes one version row
    * `[valid_from, valid_to)`, with `valid_to` NULL (open) on the current
    * version. No-op changes — rows whose attribute equals the previous
    * row's — are collapsed first, so consecutive identical versions never
    * split an interval. Order within a key is (`tsCol`, `tieCol`):
    * duplicate timestamps are resolved by the unique tiebreak, which makes
    * the whole history deterministic.
    *
    * Scale shape: one hash shuffle on the key, one per-key sort, two
    * window passes (the lag filter, then lead over the SURVIVORS — the
    * second pass must run after collapsing or a dropped no-op would leave
    * a hole in its predecessor's interval). No joins, no state beyond the
    * per-key sort — the same shape as [[sequenceDeltas]]. */
  def scd2(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCol: String,
      tieCol: String): DataFrame = {
    val ord = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val kept = changes
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .filter(col("prev_attr").isNull || col(attrCol) =!= col("prev_attr"))
      .drop("prev_attr")
    kept
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, lit(1)).otherwise(lit(0)))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Ordered conversion funnel (the product-analytics staple): for every
    * entity that performed `steps.head`, the earliest time of each later
    * step STRICTLY after the previous step's time — an event only advances
    * the funnel once every earlier stage has already happened, so a
    * purchase that precedes the first click does not count as stage 3.
    * Output: keyCol, one `t_<step>` timestamp per step (NULL once the
    * funnel is abandoned), and `stage` = furthest stage reached (1-based).
    *
    * Scale shape: one filtered grouped-min per step plus left equi joins
    * on the entity key — every exchange hashes on `keyCol` only, so after
    * the first shuffle all later stages co-partition (exchange reuse), and
    * the per-step frames are pre-filtered to that step's events before
    * they shuffle. Step count is a small constant; nothing is quadratic
    * in events or entities. */
  def funnel(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxStepGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(maxStepGapSeconds.forall(_ > 0),
      "maxStepGapSeconds must be positive when set")
    def t(step: String) = s"t_$step"
    val base = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(t(steps.head)))
    val chained = steps.tail.foldLeft((base, steps.head)) {
      case ((acc, prev), step) =>
        val si = events.filter(col(typeCol) === step)
          .select(col(keyCol), col(tsCol).as("__ts"))
        // left join keeps entities that stalled at `prev`; the strict
        // `__ts > t_prev` guard lives in the aggregate so a NULL t_prev
        // (funnel already abandoned) propagates NULL downstream for free.
        // With a conversion window, the step must also land within
        // `maxStepGapSeconds` of the previous step's FIRST-chain time —
        // a later out-of-window event does not resurrect the funnel
        // (first-attempt semantics, consistent with the unbounded chain).
        val inWindow = maxStepGapSeconds match {
          case None => col("__ts") > col(t(prev))
          case Some(g) => col("__ts") > col(t(prev)) &&
            col("__ts") <= col(t(prev)) + expr(s"INTERVAL $g SECONDS")
        }
        val next = acc.join(si, Seq(keyCol), "left")
          .groupBy(acc.columns.toIndexedSeq.map(col): _*)
          .agg(min(when(inWindow, col("__ts"))).as(t(step)))
        (next, step)
    }._1
    val stage = steps.tail.foldLeft(lit(1)) { (e, step) =>
      e + when(col(t(step)).isNotNull, 1).otherwise(0)
    }
    chained.withColumn("stage", stage.cast("int"))
  }

  /** Cohort-retention matrix: entities are assigned to the cohort of their
    * first active calendar day, and the output counts distinct entities per
    * (cohort day, day offset) — the classic retention triangle.
    *
    * Scale shape: a per-entity grouped min, a distinct over (entity, day)
    * — both hash on the entity key — then one co-partitioned equi join and
    * a final grouped count whose cardinality is cohorts × offsets, tiny
    * regardless of event volume. */
  def retentionCohorts(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val active = events
      .select(col(keyCol), to_date(col(tsCol)).as("day")).distinct()
    val first = active.groupBy(col(keyCol)).agg(min(col("day")).as("cohort_day"))
    active.join(first, Seq(keyCol))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("bigint").as("day_offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }

  /** Fixed-step resample with last-observation-carried-forward: build each
    * key its own time grid (`truncUnit`-aligned, `stepSeconds` apart,
    * spanning that key's [min, max]) and attach at every grid instant the
    * latest observation with `ts <= grid ts` via [[asofJoin]]. Grid points
    * before the first observation keep NULL (left-outer, no forward fill
    * from the future).
    *
    * Contract: `points` must be exactly keys + tsCol + valueCol with
    * (keys, ts) unique — pre-aggregate duplicates, as with [[asofJoin]].
    *
    * Scale shape: the grid explodes from ONE row per key (span/step rows,
    * bounded by each key's own observed span — days·24 for an hourly
    * resample, never |events|·grid), and the LOCF attach is the asofJoin
    * union-window: one shuffle carrying |grid| + |points| rows, one
    * incremental window pass. No inequality join anywhere. */
  def resampleLocf(
      points: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      truncUnit: String,
      stepSeconds: Long,
      maxStalenessSeconds: Option[Long] = None): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    require(maxStalenessSeconds.forall(_ > 0),
      "maxStalenessSeconds must be positive when set")
    val span = points.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val grid = span.select(
      keys.map(col) :+
        explode(expr(s"sequence(date_trunc('$truncUnit', __lo), " +
          s"date_trunc('$truncUnit', __hi), interval $stepSeconds seconds)"))
          .as(tsCol): _*)
    maxStalenessSeconds match {
      case None => asofJoin(grid, points, keys, tsCol, Seq(valueCol))
      case Some(tol) =>
        // bounded-staleness LOCF (pandas merge_asof `tolerance` / kdb
        // aj0-with-window): carry the matched observation's OWN ts as a
        // second attach column and null the value back out when the grid
        // instant has drifted more than `tol` past it — same one-shuffle
        // union-window plan, one extra struct field
        val pts = points.withColumn("__obs_ts", col(tsCol))
        asofJoin(grid, pts, keys, tsCol, Seq(valueCol, "__obs_ts"))
          .withColumn(valueCol,
            when(col(tsCol) <=
              col("__obs_ts") + expr(s"INTERVAL $tol SECONDS"),
              col(valueCol)))
          .drop("__obs_ts")
    }
  }

  /** Session path mining: sessionize by inactivity gap (gaps-and-islands —
    * the same island rule as the streaming/session-window sessionizers:
    * a new session starts iff the gap to the previous event is NOT
    * < `gapSeconds`), then count ordered event-type n-grams of length
    * `depth` WITHIN each session — the "what do users do in a sitting"
    * view the per-user transition matrix (q157) can't see across session
    * boundaries.
    *
    * `tieCols` break ordering ties at equal timestamps so the mined paths
    * are deterministic (and match an oracle using the same total order).
    *
    * Scale shape: every window (island mark, running session id, the
    * depth−1 lags) shares the user-key partitioning, so the whole operator
    * is ONE hash shuffle on `userCol` + one per-key sort; the final
    * grouped count's output is vocabulary-sized (≤ |event types|^depth),
    * never event-sized. */
  def sessionPaths(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCols: Seq[String],
      gapSeconds: Long = 1800L,
      depth: Int = 3): DataFrame = {
    require(depth >= 2, s"path depth must be >= 2, got $depth")
    val (marked, order) =
      withSessionIds(events, userCol, tsCol, tieCols, gapSeconds)
    val bySession = Window
      .partitionBy(col(userCol), col("__sid")).orderBy(order: _*)
    val steps = (depth - 1 to 1 by -1).map(i =>
      lag(col(typeCol), i).over(bySession).as(s"t${depth - i}")) :+
      col(typeCol).as(s"t$depth")
    marked
      .select(steps: _*)
      .filter(col("t1").isNotNull)
      .groupBy((1 to depth).map(i => col(s"t$i")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Peak interval concurrency per key — the sweep-line answer to "how
    * many sessions/calls/jobs were live at once" over half-open
    * `[start, end)` intervals: each interval emits a +1 at its start and
    * a −1 at its end, and the running sum of deltas in (t, delta) order
    * is the live count (−1 sorts before +1 at equal t, so back-to-back
    * intervals never double-count — exact half-open semantics).
    *
    * Reported per key: the max running count and the EARLIEST instant it
    * is reached (min-t over peak rows, so ties are deterministic).
    *
    * Scale shape: the textbook sweep line is a single global ordered
    * window — a one-partition sort of 2·n rows. Here the running sum is
    * decomposed exactly like [[graft.llm.Packing.packOffsets]]'s cumsum:
    * deltas bucket by coarse time cell (`bucketSeconds`), phase 1 cumsums
    * WITHIN each (key, bucket) in parallel, phase 2 prefix-sums the
    * per-bucket totals on a frame with one row per non-empty bucket
    * (span/bucketSeconds rows, never 2·n) and broadcasts the bases back.
    * Permuting equal (t, delta) rows only permutes equal partial sums, so
    * the (max, argmin-t) result is partition-invariant. */
  def intervalConcurrency(
      intervals: DataFrame,
      keyCols: Seq[String],
      startCol: String,
      endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1, got $bucketSeconds")
    val keys = keyCols.map(col)
    val deltas = intervals
      .select(keys :+ col(startCol).as("t") :+ lit(1L).as("d"): _*)
      .unionByName(intervals
        .select(keys :+ col(endCol).as("t") :+ lit(-1L).as("d"): _*))
      .withColumn("bucket",
        floor(unix_timestamp(col("t").cast("timestamp")) / lit(bucketSeconds)))
    val keyBucket = keyCols :+ "bucket"
    val wIn = Window.partitionBy(keyBucket.map(col): _*)
      .orderBy(col("t").asc, col("d").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = deltas.withColumn("local_c", sum(col("d")).over(wIn))
    val wTot = Window.partitionBy(keys: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = deltas.groupBy(keyBucket.map(col): _*)
      .agg(sum(col("d")).as("bucket_d"))
      .select(keyBucket.map(col) :+
        coalesce(sum(col("bucket_d")).over(wTot), lit(0L)).as("bucket_base"): _*)
    val live = local.join(broadcast(bases), keyBucket)
      .withColumn("c", col("bucket_base") + col("local_c"))
      // two consumers (the peak aggregate and the peak-instant join) each
      // re-ran the union + two-phase cumsum + bases join. The frame is
      // interval-grain but NARROW — keys plus four fixed-width longs, a
      // fraction of the source row — and folding the peak filter into one
      // keys-only window would reintroduce the single-task-per-key
      // partition this sweep deliberately avoids (r15, guide §5/§2).
      .localCheckpoint(true)
    val peaks = broadcast(
      live.groupBy(keys: _*).agg(max(col("c")).as("max_concurrent")))
    live.as("L").join(peaks.as("P"),
        keyCols.map(k => col(s"L.$k") === col(s"P.$k")).reduce(_ && _) &&
          col("L.c") === col("P.max_concurrent"))
      .groupBy(keyCols.map(k => col(s"L.$k").as(k)): _*)
      .agg(max(col("P.max_concurrent")).as("max_concurrent"),
        min(col("L.t")).as("peak_t"))
  }

  /** The inactivity-gap sessionization rule, in ONE place: a session
    * breaks when the gap to the previous event exceeds `gapSeconds`
    * under the (ts, tie...) total order. Returns the frame with a
    * per-user `__sid` running session id plus the order columns —
    * [[sessionPaths]] and [[bounceRate]] both build on exactly this, so
    * the gap semantics (strictly-greater boundary, NULL-lag = new
    * session) can never silently diverge between them. */
  private def withSessionIds(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCols: Seq[String],
      gapSeconds: Long): (DataFrame, Seq[Column]) = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val byUser = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val marked = events
      .withColumn("__new_s",
        when(col(tsCol) < lag(col(tsCol), 1).over(byUser) +
          expr(s"INTERVAL $gapSeconds SECONDS"), 0L).otherwise(1L))
      .withColumn("__sid",
        sum(col("__new_s")).over(byUser.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
    (marked, order)
  }

  /** Session bounce rate by ENTRY event type — the landing-page health
    * metric: sessions form by the same inactivity-gap rule as
    * [[sessionPaths]] (new session when the gap to the previous event
    * exceeds `gapSeconds`), each session is labeled by its FIRST event's
    * type, and a bounce is a single-event session. Share is exact
    * integer ppm. Scale shape: one shuffle on the user, two window
    * passes, one session-grain aggregate, one tiny entry-type rollup. */
  def bounceRate(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCols: Seq[String],
      gapSeconds: Long = 1800L): DataFrame = {
    val (marked, order) =
      withSessionIds(events, userCol, tsCol, tieCols, gapSeconds)
    val sessions = marked
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(userCol), col("__sid")).orderBy(order: _*)))
      .groupBy(col(userCol), col("__sid"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("__rn") === 1, col(typeCol))).as("entry_type"))
    sessions.groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("n_bounce"))
      .withColumn("bounce_ppm", expr("n_bounce * 1000000 div n_sessions"))
  }

  /** CUSUM changepoint locator: per key, the position where the series'
    * cumulative deviation from its own mean peaks — the standard
    * single-changepoint estimate for a level shift (the argmax of
    * |Σ_{i≤t}(x_i − x̄)|).
    *
    * Exactness recipe: the deviation is evaluated SCALED BY n —
    * `D_t = |n·prefix_t − t·total|` (= n·|Σ_{i≤t}(x_i − x̄)| in cents) —
    * so the whole statistic is BIGINT algebra on quantized cents; the
    * per-key mean is never materialized as a float and the argmax cannot
    * be perturbed by rounding. Ties break to the earliest (ts, tie).
    *
    * Scale shape: one shuffle on the key, two window passes over each
    * key's partition (running prefix + full-frame totals), one argmax
    * window — no self-join, no global sort; each key's series is one
    * partition. */
  def cusumChangepoint(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      tieCol: String): DataFrame = {
    val wRun = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wSeq = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    // internal names underscore-prefixed so caller column names (ts
    // columns called "t", value columns called "n", ...) cannot collide
    val scored = df
      .select(col(keyCol), col(tsCol), col(tieCol),
        (col(valueCol).cast("decimal(30,2)") * 100).cast("long").as("_c"))
      .withColumn("_prefix", sum(col("_c")).over(wRun))
      .withColumn("_t", row_number().over(wSeq).cast("long"))
      .withColumn("_total", sum(col("_c")).over(wAll))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_dev",
        abs(col("_n") * col("_prefix") - col("_t") * col("_total")))
    scored
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col("_dev").desc, col(tsCol), col(tieCol))))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col("_n").as("n"), col(tsCol).as("change_ts"),
        col("_t").as("change_pos"), col("_dev").as("max_dev_scaled"))
  }
}
