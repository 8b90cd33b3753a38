package graft.llm

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mixture allocation: turn per-group corpus sizes into
  * per-group token budgets under temperature-scaled sampling — the
  * mT5/LLaMA-style `p_g ∝ size_g^(1/τ)` rule that up-weights small
  * languages/domains without letting any group starve.
  */
object Mixture {

  /** Allocate an integer token `budget` across groups with sampling
    * temperature τ = 2 (exponent 1/2 — `sqrt` is correctly rounded in
    * IEEE 754, so the weight is engine-exact; arbitrary τ would need a
    * non-portable `pow`). Hamilton largest-remainder rounding makes the
    * allocations sum to EXACTLY `budget`: floor allocations first, then
    * one spare unit to each of the largest fractional remainders
    * (remainder ties broken by group name — fully deterministic).
    *
    * Portability discipline: weights are µ-quantized integers
    * (⌊10⁶·√tokens⌋), their total is an exact integer sum, and the only
    * doubles are one product and one division per group on identical
    * integer inputs.
    *
    * Scale shape: the heavy work is the per-group token sum (map-side
    * partial); everything after runs on the GROUPS frame (tens of rows —
    * the global windows are free). */
  def temperatureAllocation(
      docs: DataFrame,
      groupCol: String,
      tokensCol: Column,
      budget: Long): DataFrame = {
    val sizes = docs.groupBy(col(groupCol))
      .agg(sum(tokensCol).as("n_tokens"))
      .withColumn("wq", floor(lit(1e6) * sqrt(col("n_tokens").cast("double")))
        .cast("long"))
    val total = sizes.agg(sum(col("wq")).as("wq_total"))
    val exact = sizes.crossJoin(broadcast(total))
      .withColumn("share",
        (lit(budget) * col("wq").cast("double")) / col("wq_total").cast("double"))
      .withColumn("alloc0", floor(col("share")).cast("long"))
      .withColumn("frac", col("share") - col("alloc0").cast("double"))
    val spare = exact.agg((lit(budget) - sum(col("alloc0"))).as("spare"))
    exact.crossJoin(broadcast(spare))
      .withColumn("r", row_number().over(
        Window.orderBy(col("frac").desc, col(groupCol).asc)))
      .withColumn("alloc",
        col("alloc0") + when(col("r") <= col("spare"), 1L).otherwise(0L))
      .select(col(groupCol), col("n_tokens"), col("wq"), col("alloc"))
  }

  /** Capacity-capped weighted budget split — WATERFILLING: the
    * constrained-mixture allocator behind every data recipe with
    * per-source caps ("tokens proportional to quality weight, but never
    * more than the source has"): alloc_s = min(c_s, λ·w_s) with
    * Σ alloc = B where B = Σc · budgetNum/budgetDen.
    *
    * Exact-integer closed form, division-free where it matters:
    *   1. order sources by the quantized ratio c·10⁶ div w (the
    *      DECLARED order — the oracle states it identically; a true-
    *      rational tie allocates identically either way because
    *      λ = c/w gives alloc = c on both branches);
    *   2. exclusive prefix sums give each row the budget and weight
    *      remaining if every smaller-ratio row saturates; the row
    *      saturates iff its proportional share already covers its
    *      capacity — (B − Cc)·w ≥ c·Wrem, cross-multiplied;
    *   3. waterfilling's capped set is a ratio-order PREFIX, so the
    *      capped flag is the running AND of the saturation flag;
    *   4. uncapped rows floor-split the residual budget by weight
    *      (Σ alloc ≤ B; the per-row floor residue < 1 is declared),
    *      clamped to capacity.
    *
    * Input: one row per source with integer `c` (capacity ≥ 0) and `w`
    * (weight ≥ 1) — an AGGREGATED grain by contract, so the global
    * windows here run on a tiny frame (the plan-audit-allowed shape).
    * Returns the input columns + b, capped, alloc, share_ppm.
    * LawsSpec pins this against an independent driver-side iterative
    * fixpoint with exact rational tests. */
  def waterfill(
      sources: DataFrame, // (keyCol, ..., c, w)
      keyCol: String,
      budgetNum: Long,
      budgetDen: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen >= 1,
      s"budget fraction must be >= 0 with positive denominator, " +
        s"got $budgetNum/$budgetDen")
    // Loud input-contract + overflow guard (round-11 ADVICE), plan-
    // resident like Stats.guardedBucketPrefix: the c>=0 / w>=1 contract
    // was previously doc-only (a negative capacity or zero weight
    // diverges engine vs oracle instead of failing), and the cross-
    // multiplied saturation test (b-cc_prev)*w >= c*w_rem multiplies
    // token-scale capacities by weight sums — at 100 TB grain that can
    // exceed Long, where Spark wraps silently while DuckDB raises.
    // Every product in the algebra is bounded by ctot*wtot (saturation,
    // residual split), ctot*1e6 (ratio_q, share_ppm), or ctot*budgetNum
    // (b), so one scalar bound on ctot covers them all. The guard is
    // fused into `b`, which every output row reads (flag, alloc,
    // share_ppm) — it cannot be pruned and fires on the first row.
    val guardDen = greatest(col("wtot"), lit(1000000L), lit(budgetNum))
    val base = sources
      .crossJoin(broadcast(sources.agg(sum(col("c")).as("ctot"),
        sum(col("w")).as("wtot"),
        min(col("c")).as("_minc"), min(col("w")).as("_minw"))))
      .withColumn("b",
        when(col("_minc") < 0L, raise_error(concat(
            lit("waterfill: capacity column c has a negative value ("),
            col("_minc"), lit(") — the c >= 0 input contract is violated; " +
              "the prefix-AND capped set is meaningless on negative " +
              "capacities. Fix the upstream rollup."))))
          .when(col("_minw") < 1L, raise_error(concat(
            lit("waterfill: weight column w has a value below 1 ("),
            col("_minw"), lit(") — the w >= 1 input contract is violated; " +
              "a zero weight divides by zero in the ratio order. Clamp " +
              "weights with greatest(1L, ...) upstream."))))
          .when(col("ctot") > lit(Long.MaxValue) / guardDen, raise_error(concat(
            lit("waterfill: total capacity "), col("ctot"),
            lit(" x max(weight-sum, 1e6, budgetNum) overflows Long — the " +
              "cross-multiplied saturation test would wrap silently. " +
              "Rescale capacities to a coarser token grain."))))
          .otherwise(expr(s"ctot * $budgetNum div $budgetDen")))
      .withColumn("ratio_q", expr("c * 1000000 div w"))
    val wOrd = Window.orderBy(col("ratio_q"), col(keyCol))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = base
      .withColumn("cc_prev", coalesce(sum(col("c")).over(wPrev), lit(0L)))
      .withColumn("w_rem",
        col("wtot") - coalesce(sum(col("w")).over(wPrev), lit(0L)))
      .withColumn("flag",
        (col("b") - col("cc_prev")) * col("w") >= col("c") * col("w_rem"))
      .withColumn("capped",
        min(when(col("flag"), 1L).otherwise(0L)).over(wRun) === 1L)
    flagged
      .crossJoin(broadcast(flagged.agg(
        sum(when(col("capped"), col("c")).otherwise(0L)).as("cc_star"),
        sum(when(!col("capped"), col("w")).otherwise(0L)).as("wu_star"))))
      .withColumn("alloc",
        when(col("capped"), col("c"))
          .otherwise(least(col("c"),
            expr("greatest(0L, b - cc_star) * w div wu_star"))))
      .withColumn("share_ppm",
        when(col("b") > 0, expr("alloc * 1000000 div b")).otherwise(lit(0L)))
      .drop("ctot", "wtot", "_minc", "_minw", "ratio_q", "cc_prev",
        "w_rem", "flag", "cc_star", "wu_star")
  }
}
