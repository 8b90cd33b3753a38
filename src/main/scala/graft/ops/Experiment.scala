package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-analytics operators: CUPED variance reduction, sample-ratio
  * mismatch gating, multi-touch linear attribution, grouped least
  * squares, and cohort LTV curves.
  *
  * Shared portability recipe: metric values quantize to integer cents
  * (`decimal(30,2)·100 → BIGINT`) before ANY aggregation, sufficient
  * statistics fold as exact integer sums (order-free, map-side partial),
  * and derived ratios are a fixed sequence of IEEE double operations at
  * the very end — so results are bit-identical on any partitioning, any
  * cluster size, and any engine replaying the same algebra.
  */
object Experiment {

  private def cents(c: Column): Column =
    (c.cast("decimal(30,2)") * 100).cast("long")

  /** CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.
    * 2013): reduce metric variance by regressing out each user's
    * pre-period activity. Per user, pre-period metric X and post-period
    * metric Y fold in ONE grouped conditional-sum pass; the pooled
    * θ = cov(X,Y)/var(X) is a scalar aggregate over the user grain
    * (attached via the audited `crossJoin(broadcast(scalar))` idiom);
    * each variant reports its raw mean and the adjusted mean
    * Ŷ_v − θ·(X̄_v − X̄).
    *
    * Scale shape: the user-grain shuffle is the only exchange; both the
    * scalar stats and the variant rollup reduce it map-side. Variant
    * assignment is `userCol % nVariants` (deterministic, re-derivable).
    */
  def cuped(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String,
      cutover: String,
      nVariants: Int = 2): DataFrame = {
    require(nVariants >= 2, s"need >= 2 variants, got $nVariants")
    val perUser = events
      .select(col(userCol).as("_u"), cents(col(valueCol)).as("c"),
        (col(tsCol) < lit(cutover).cast("timestamp_ntz")).as("pre"))
      .groupBy(col("_u"))
      .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
        sum(when(col("pre"), lit(0L)).otherwise(col("c"))).as("y"))
    // product moments fold as decimal(38,0) (operands lifted to
    // decimal(19,0) BEFORE multiplying, so the product itself cannot
    // wrap): a long product of two ~3e9-cent totals silently overflows,
    // while DuckDB promotes its BIGINT sums to HUGEINT — decimal
    // accumulation keeps the exact-integer → one-double-conversion
    // contract on both engines at any operand magnitude up to 1e38
    val g = perUser.agg(
      count(lit(1)).cast("double").as("gn"),
      sum(col("x")).cast("double").as("gsx"),
      sum(col("y")).cast("double").as("gsy"),
      sum(col("x").cast("decimal(19,0)") * col("y").cast("decimal(19,0)"))
        .cast("double").as("gsxy"),
      sum(col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
        .cast("double").as("gsxx"))
    perUser
      .groupBy((col("_u") % nVariants).cast("int").as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sum_x_cents"),
        sum(col("y")).as("sum_y_cents"))
      .crossJoin(broadcast(g))
      // var(X) = 0 (all pre-period metrics identical — e.g. a cutover
      // before any event zeroes every x) would make theta 0/0 = NaN and
      // poison every adjusted mean; the estimator's correct degenerate
      // limit is theta = 0, i.e. fall back to the raw means
      .withColumn("theta",
        when(col("gn") * col("gsxx") - col("gsx") * col("gsx") === 0.0,
          lit(0.0))
          .otherwise(
            (col("gn") * col("gsxy") - col("gsx") * col("gsy")) /
              (col("gn") * col("gsxx") - col("gsx") * col("gsx"))))
      .withColumn("mean_y",
        col("sum_y_cents").cast("double") /
          (col("n").cast("double") * 100.0))
      .withColumn("mean_adj",
        (col("sum_y_cents").cast("double") / col("n").cast("double") -
          col("theta") *
            (col("sum_x_cents").cast("double") / col("n").cast("double") -
              col("gsx") / col("gn"))) / 100.0)
      .select(col("variant"), col("n"), col("sum_x_cents"),
        col("sum_y_cents"), col("theta"), col("mean_y"), col("mean_adj"))
  }

  /** Sample-ratio-mismatch gate: per group, the chi-square statistic of
    * the observed 50/50 split (variant = `userCol % 2`) from exact
    * counts — the pre-read every experiment readout must pass before its
    * metric deltas mean anything (df=1, χ² > 3.841 ⇔ p < 0.05). One
    * grouped pass, map-side partial. */
  def srmCheck(
      events: DataFrame,
      groupCol: String,
      userCol: String,
      threshold: Double = 3.841): DataFrame =
    srmFromCounts(
      events.groupBy(col(groupCol))
        .agg(sum(when(col(userCol) % 2 === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col(userCol) % 2 === 1, 1L).otherwise(0L)).as("n1")),
      groupCol, threshold)

  /** The χ² derivation over an already-counted (group, n0, n1) frame —
    * shared by [[srmCheck]] and the streaming gate
    * ([[graft.streaming.Streams.srmGateStream]]), so both paths compute
    * the statistic from identical exact counts by identical double
    * algebra. Counts are plain sums (associative, mergeable), which is
    * what makes the streamed partial-fold exact. */
  def srmFromCounts(
      counts: DataFrame,
      groupCol: String,
      threshold: Double = 3.841): DataFrame = {
    val d = counts
      .withColumn("expected", (col("n0") + col("n1")).cast("double") / 2.0)
    d.withColumn("chi2",
        (col("n0").cast("double") - col("expected")) *
          (col("n0").cast("double") - col("expected")) / col("expected") +
          (col("n1").cast("double") - col("expected")) *
            (col("n1").cast("double") - col("expected")) / col("expected"))
      .withColumn("srm", col("chi2") > threshold)
      .select(col(groupCol), col("n0"), col("n1"), col("chi2"), col("srm"))
  }

  /** Multi-touch LINEAR attribution (the even-split counterpart of
    * last-touch): every `touchType` event within the conversion's
    * lookback window shares the credit equally. Credit is
    * `1000000 div n` integer micro-units per touch — exact and
    * order-free, where summing 1/n doubles would be neither; a
    * conversion's total credited mass is therefore in
    * `(1e6 − n, 1e6]` (the `div` truncation remainder is the declared,
    * bounded loss).
    *
    * Output grain: one row per (conversion, touch) with the conversion
    * id/ts, touch ts, the window's touch count, and the credit.
    * Conversions with no in-window touch emit nothing.
    *
    * Scale shape: user-equi join with a time-range residual — shuffles
    * by user only (never an inequality-only join); the per-conversion
    * count is a window over the already-joined grain. */
  def linearAttribution(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      convType: String,
      touchType: String,
      lookbackHours: Int = 24): DataFrame = {
    require(lookbackHours >= 1, s"lookbackHours must be >= 1")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol).as("_u"),
        col(tsCol).as("conv_ts"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("_u"), col(tsCol).as("touch_ts"))
    conv.join(touch, Seq("_u"))
      .filter(col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") -
          expr(s"INTERVAL $lookbackHours HOURS"))
      .withColumn("n_touches",
        count(lit(1)).over(Window.partitionBy(col("conv_id"))))
      .withColumn("credit_micros", expr("1000000 div n_touches"))
      .select(col("conv_id"), col("conv_ts"), col("touch_ts"),
        col("n_touches"), col("credit_micros"))
  }

  /** Grouped simple least squares over integer-exact sufficient
    * statistics: per group, slope and intercept of y-on-x from
    * (n, Σx, Σy as BIGINT; Σxy, Σx² as decimal(38,0) — overflow-safe
    * past the long product bound) folded in ONE map-side-partial
    * pass — the closed form needs no iteration and no driver
    * round-trips at any scale. `xCol`/`yCol` must already be integral
    * (cast/quantize upstream); the coefficients are the only doubles. */
  def groupedLeastSquares(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
        // decimal(38,0) product moments (operands lifted first): long
        // x·y wraps past ~3e9·3e9 while the oracle's HUGEINT doesn't
        sum(col(xCol).cast("decimal(19,0)") * col(yCol).cast("decimal(19,0)"))
          .as("sxy"),
        sum(col(xCol).cast("decimal(19,0)") * col(xCol).cast("decimal(19,0)"))
          .as("sxx"))
      .withColumn("slope",
        (col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("intercept",
        (col("sy").cast("double") -
          col("slope") * col("sx").cast("double")) /
          col("n").cast("double"))
      .select(col(groupCol), col("n"), col("slope"), col("intercept"))

  /** Cohort LTV curve: cohort = the user's first-activity date,
    * age = days since cohort, per-(cohort, age) active-user counts and
    * revenue (events of `revenueType`, exact cents), plus the running
    * cumulative revenue per cohort. Two shuffles (user grain, cohort/age
    * rollup) and one cohort-partitioned window — each cohort's curve is
    * one partition, never a global sort. */
  def cohortLtv(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      valueCol: String,
      revenueType: String): DataFrame = {
    val cohorts = events.groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("cohort"))
    events.join(cohorts, Seq(userCol))
      .withColumn("age_days",
        datediff(to_date(col(tsCol)), col("cohort")).cast("long"))
      .groupBy(col("cohort"), col("age_days"))
      .agg(countDistinct(col(userCol)).as("n_active"),
        sum(when(col(typeCol) === revenueType, cents(col(valueCol)))
          .otherwise(0L)).as("rev_cents"))
      .withColumn("cum_rev_cents",
        sum(col("rev_cents")).over(Window.partitionBy(col("cohort"))
          .orderBy(col("age_days"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
