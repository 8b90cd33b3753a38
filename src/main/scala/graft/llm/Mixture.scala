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
}
