package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table- and key-health diagnostics — the "should I salt this join /
  * can this key broadcast / which column is rotten" questions a 100 TB
  * pipeline asks BEFORE running, answered as plans over the data itself.
  */
object Profile {

  /** Long-format column profile: one row per profiled column with row
    * count, null count, exact distinct count, and lexicographic min/max
    * of the string form. The per-column frames union into one plan, so
    * Spark shares the scan across all profiled columns (one pass over
    * the parquet, map-side partial aggs — the ANALYZE TABLE shape
    * without the catalog dependency).
    *
    * Values travel as strings so heterogeneous column types fit one
    * schema; exact distinct (not approx) keeps the result
    * engine-portable. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(
        lit(c).as("column"),
        col(c).cast("string").as("v"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
          count_distinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_s"),
          max(col("v")).as("max_s"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionByName _)

  /** Robust per-group outlier flags via median absolute deviation — the
    * pipeline-monitoring rule ("which metric values broke this batch")
    * that survives the heavy tails a mean/stddev z-score drowns in:
    * a row is an outlier when |x − median| > k·MAD of its group.
    *
    * `percentile` here is the EXACT sort-based aggregate so the result
    * is engine-portable (DuckDB `quantile_cont` computes the same
    * interpolated statistic — the q50 recipe); at 100 TB swap in
    * `approx_percentile`, which changes only this one aggregate, not the
    * operator shape. The median/MAD frames are group-count-sized, so
    * both re-attach joins broadcast. */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      keepCols: Seq[String],
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), groupCol)
      .filter(col("dev") > lit(k) * col("mad"))
      .select((groupCol +: keepCols).map(col) ++
        Seq(col(valueCol), col("med"), col("mad")): _*)
  }

  /** Join-key skew profile: the exact decision inputs for
    * [[Relational.saltedJoin]] — per-key frequencies reduced to (a) the
    * top-k hot keys with their counts and (b) a µ-quantized Gini
    * coefficient of the key distribution, computed with the exact
    * integer form
    *
    *   gini_q = ⌊10⁶ · Σᵢ (2i − n − 1)·cᵢ / (n · Σ cᵢ)⌋,  cᵢ ascending
    *
    * (i is the 1-based rank; ties broken by key for determinism). A
    * gini near 0 = uniform keys (hash join fine); near 1 = a few hot
    * keys own the table (salt or broadcast the other side).
    *
    * Scale shape: the groupBy count is map-side partial on the key; the
    * rank window runs over the DISTINCT-KEY frame (vocabulary-sized, not
    * row-sized). The whole Gini reduces to one integer sum — no doubles
    * until the final division. */
  def keySkewProfile(
      df: DataFrame,
      keyCol: String,
      topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("c"))
    // global windows run over the DISTINCT-KEY frame only —
    // vocabulary-sized, the same single-partition discipline as q74's
    // candidate recount
    val w = Window.orderBy(col("c").asc, col("key").asc)
    val ranked = counts.withColumn("i", row_number().over(w))
    // Σ(2i−n−1)cᵢ = 2·Σi·cᵢ − (n+1)·Σcᵢ — three plain integer sums; the
    // final ratio goes through doubles (exact-int→double conversion and
    // one division are IEEE-deterministic in any engine, and the integer
    // products 10⁶·gnum would overflow a long at real key cardinalities)
    val stats = ranked.agg(
      count(lit(1)).as("n_keys"),
      sum(col("c")).as("n_rows"),
      sum(col("i").cast("long") * col("c")).as("s1"))
    val gini = stats.select(
      lit("__gini__").as("key"),
      col("n_keys").as("c"),
      floor(lit(1e6) *
        ((lit(2) * col("s1") - (col("n_keys") + 1) * col("n_rows")).cast("double") /
          (col("n_keys") * col("n_rows")).cast("double"))).cast("long")
        .as("metric"))
    val top = ranked
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("key").asc)))
      .filter(col("r") <= topK)
      .select(col("key"), col("c"), col("r").cast("long").as("metric"))
    top.unionByName(gini)
  }

  /** Per-group winsorized summary — the robust-mean monitoring rule for
    * heavy-tailed metrics (the winsorized cousin of [[madOutliers]]):
    * values are clamped to the group's exact [pLo, pHi] percentiles and
    * the clamped mean is reported next to the clamp counts.
    *
    * Engine portability of the mean is the delicate part: a float SUM
    * over doubles is order-dependent, so the clamped value is first
    * quantized to integer micro-units with round-half-away-from-zero
    * (`round(x·10⁶)` — the same rule in Spark's HALF_UP-on-BigDecimal
    * and DuckDB's `round`), summed as a plain BIGINT (associative,
    * order-free), and divided ONCE at the end — a single IEEE division
    * both engines share bit-for-bit. The percentile frames are
    * group-count-sized, so the re-attach join broadcasts; at 100 TB the
    * exact `percentile` swaps for `approx_percentile` without changing
    * the shape.
    *
    * NULL contract: rows with a NULL `valueCol` are EXCLUDED up front
    * (and surfaced as `n_null`) — without the filter, Spark's
    * NULL-skipping `least`/`greatest` would silently clamp a missing
    * value to `p_hi` and count it into the winsorized mean. A group
    * whose values are ALL NULL still appears in the output (n = 0,
    * clamp counts 0, NULL percentiles/mean, its full n_null) — dropped
    * rows must never drop their group from the DQ report. */
  def winsorizedStats(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val nulls = df.filter(col(valueCol).isNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_null"))
    val present = df.filter(col(valueCol).isNotNull)
    val bounds = present.groupBy(col(groupCol))
      .agg(
        percentile(col(valueCol), lit(pLo)).as("p_lo"),
        percentile(col(valueCol), lit(pHi)).as("p_hi"))
    present.join(broadcast(bounds), groupCol)
      .withColumn("w", greatest(least(col(valueCol), col("p_hi")), col("p_lo")))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(valueCol) < col("p_lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col(valueCol) > col("p_hi"), 1L).otherwise(0L)).as("n_high"),
        min(col("p_lo")).as("p_lo"),
        min(col("p_hi")).as("p_hi"),
        sum(round(col("w") * lit(1e6)).cast("long")).as("wsum_micros"))
      .withColumn("wmean",
        col("wsum_micros").cast("double") / (col("n") * lit(1e6)))
      // FULL outer: an all-NULL group has no present-side row but must
      // still surface with its n_null count. No broadcast hint —
      // BroadcastHashJoin cannot run a FullOuter, so a hint would be
      // silently ignored; both sides are group-count-sized anyway
      .join(nulls, Seq(groupCol), "full_outer")
      .withColumn("n_null", coalesce(col("n_null"), lit(0L)))
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("n_low", coalesce(col("n_low"), lit(0L)))
      .withColumn("n_high", coalesce(col("n_high"), lit(0L)))
      .withColumn("wsum_micros", coalesce(col("wsum_micros"), lit(0L)))
  }

  /** Exact weighted median per group: the smallest value whose
    * cumulative weight reaches half the group's total —
    * `min{v : 2·cumw(v) ≥ totw}`. All-integer algebra (caller passes
    * integral value/weight columns — quantize upstream), so the
    * boundary decision can never be perturbed by float rounding; rows
    * tied on the value share it, making the intra-tie window order
    * irrelevant to the result. One shuffle on the group, one window
    * pass, one grouped min — the same shape at any scale (the exact
    * percentile's weighted cousin; swap in approx machinery only if the
    * per-group sort ever dominates). */
  def weightedMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      weightCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(col(groupCol), col(valueCol), col(weightCol))
      .withColumn("__cumw", sum(col(weightCol)).over(w))
      .withColumn("__totw", sum(col(weightCol)).over(all))
      .filter(col("__cumw") * 2 >= col("__totw"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("weighted_median"),
        min(col("__totw")).as("total_weight"))
  }

  /** Data-quality expectation report — the pre-flight assertion suite a
    * pipeline runs before trusting a batch (the Deequ/Great-Expectations
    * shape as one plan): each named rule is a boolean VIOLATION predicate
    * evaluated per row, and all rules reduce in a single aggregation over
    * ONE scan — adding a rule adds a sum column, never a pass over the
    * data. Output is long-format (rule, n_rows, n_violations, pass).
    *
    * `uniqueKeys`, when set, appends a uniqueness expectation that a row
    * predicate cannot express: the key-grouped count runs as its own
    * map-side-partial aggregate and reports rows-in-duplicated-keys.
    *
    * NULL predicate results count as violations (an expectation that
    * cannot be evaluated has not been met). */
  def expectations(
      df: DataFrame,
      rules: Seq[(String, Column)],
      uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty || uniqueKeys.nonEmpty, "no expectations given")
    val rowPart = if (rules.isEmpty) None else Some {
      val sums = count(lit(1)).as("n_rows") +:
        rules.zipWithIndex.map { case ((_, violated), i) =>
          sum(when(coalesce(violated, lit(true)), 1L).otherwise(0L))
            .as(s"v_$i")
        }
      // ONE wide scalar aggregate, then explode-unpivoted to long — a
      // union of per-rule selects would re-run the scan once per rule.
      // The names travel as typed lit()s inside struct/explode, never
      // through a SQL string, so any rule name (quotes, backslashes,
      // unicode) round-trips verbatim — no expr() escaping to get wrong.
      val pairs = rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col(s"v_$i").as("n_violations"))
      }
      df.agg(sums.head, sums.tail: _*)
        .select(col("n_rows"), explode(array(pairs: _*)).as("kv"))
        .select(col("kv.rule").as("rule"), col("n_rows"),
          col("kv.n_violations").as("n_violations"))
    }
    val uniquePart = if (uniqueKeys.isEmpty) None else Some {
      df.groupBy(uniqueKeys.map(col): _*)
        .agg(count(lit(1)).as("k_n"))
        .agg(sum(col("k_n")).as("n_rows"),
          sum(when(col("k_n") > 1L, col("k_n")).otherwise(0L))
            .as("n_violations"))
        .select(lit(s"unique(${uniqueKeys.mkString(",")})").as("rule"),
          col("n_rows"), col("n_violations"))
    }
    (rowPart.toSeq ++ uniquePart.toSeq).reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0L)
  }
}
