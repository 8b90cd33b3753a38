package graft
package ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Convergence-witnessed Lloyd k-means over exact-quantized vectors — the
  * FOURTH dynamic-oracle kernel class (after mass-propagation PageRank/HITS,
  * path-relaxation Bellman–Ford, and the linear-operator Markov fixpoint):
  * an ALTERNATING-minimization fixpoint, where each round solves two exact
  * sub-problems (nearest-centroid assignment, per-cluster integer mean) and
  * the stop condition is a combinatorial witness — ZERO membership changes —
  * not a residual threshold.
  *
  * Everything is exact integer algebra so any cluster and the DuckDB oracle
  * walk bit-identical paths: vectors arrive pre-quantized (dim, q) with
  * |q| ≤ OFFSET by contract; distances are exact Long squared-L2 over the
  * quantized grid; means use the OFFSET device ((Σq + n·OFF) div n − OFF,
  * the q408 rule — Spark's truncating div equals DuckDB's floor div only on
  * non-negative numerators); argmin ties break on the smaller cluster id via
  * an explicitly ordered row_number. An empty cluster KEEPS its previous
  * centroid (deterministic, stated in the oracle's left join) instead of
  * respawning — the declared semantics.
  *
  * Scale shape: per round, ONE broadcast hash join of the k·D centroid grid
  * against the exploded vector frame (the fact-scale pass), one partial
  * aggregation to (vec, cid) distances, one per-vec partitioned top-1
  * window, one (cid, dim) rollup for the update. Nothing quadratic; the
  * membership-change count is a key-equi join of two checkpointed
  * assignment frames. Per-round localCheckpoint truncates the growing
  * lineage (the dupClusters iterative-loop rule).
  */
object Kmeans {

  private val Offset = 2000000L

  /** One Lloyd run. `x` must be (vec_id: Long, dim: Long, q: Long) with
    * |q| ≤ 2·10⁶; `seeds` is (vec_id, cid) — the initial centroids are the
    * seed rows' own vectors. Returns (final assignment (vec_id, cid,
    * dist2), post-final-update centroids (cid, dim, c_q) — the serveable
    * model artifact, realized round count, membership changes in the last
    * round — 0 iff converged before `maxRounds`). Runs at least 2 rounds
    * (round 1 has no previous assignment to compare against). */
  def lloydConverged(x: DataFrame, seeds: DataFrame,
      maxRounds: Int = 12): (DataFrame, DataFrame, Int, Long) = {
    val xc = x.localCheckpoint(true)
    var cent = seeds.join(xc, "vec_id")
      .select(col("cid"), col("dim"), col("q").as("c_q"))
      .localCheckpoint(true)
    var assign: DataFrame = null
    var round = 0
    var changed = -1L
    while (round < maxRounds && changed != 0L) {
      round += 1
      val prev = assign
      val wA = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist2"), col("cid"))
      assign = xc.join(broadcast(cent), "dim")
        .select(col("vec_id"), col("cid"),
          ((col("q") - col("c_q")) * (col("q") - col("c_q"))).as("dd"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum(col("dd")).as("dist2"))
        .withColumn("rk", row_number().over(wA))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cid"), col("dist2"))
        .localCheckpoint(true)
      if (prev != null)
        changed = assign
          .join(prev.select(col("vec_id"), col("cid").as("pcid")), "vec_id")
          .filter(col("cid") =!= col("pcid")).count()
      val upd = assign.select(col("vec_id"), col("cid"))
        .join(xc, "vec_id")
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
        .select(col("cid"), col("dim"),
          expr(s"(sq + n * ${Offset}L) div n - ${Offset}L").as("c_q"))
      cent = cent.select(col("cid"), col("dim"), col("c_q").as("o_q"))
        .join(upd, Seq("cid", "dim"), "left_outer")
        .select(col("cid"), col("dim"),
          coalesce(col("c_q"), col("o_q")).as("c_q"))
        .localCheckpoint(true)
    }
    (assign, cent, round, changed)
  }

  /** FIXED-round Lloyd (no convergence witness): exactly `rounds`
    * assignment passes with `rounds − 1` interleaved centroid updates —
    * the declared cross-engine semantics when the caller wants a STATIC
    * oracle (the pageRankInt fixed-round rule) instead of the
    * [[lloydConverged]] dynamic unroll; used by the elbow sweep where
    * three k values would otherwise need three stop-round atomics.
    * Same exact-integer algebra throughout. */
  def lloydFixed(x: DataFrame, seeds: DataFrame, rounds: Int)
      : DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    val xc = x.localCheckpoint(true)
    var cent = seeds.join(xc, "vec_id")
      .select(col("cid"), col("dim"), col("q").as("c_q"))
      .localCheckpoint(true)
    var assign: DataFrame = null
    for (r <- 1 to rounds) {
      val wA = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist2"), col("cid"))
      assign = xc.join(broadcast(cent), "dim")
        .select(col("vec_id"), col("cid"),
          ((col("q") - col("c_q")) * (col("q") - col("c_q"))).as("dd"))
        .groupBy(col("vec_id"), col("cid"))
        .agg(sum(col("dd")).as("dist2"))
        .withColumn("rk", row_number().over(wA))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cid"), col("dist2"))
        .localCheckpoint(true)
      if (r < rounds) {
        val upd = assign.select(col("vec_id"), col("cid"))
          .join(xc, "vec_id")
          .groupBy(col("cid"), col("dim"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
          .select(col("cid"), col("dim"),
            expr(s"(sq + n * ${Offset}L) div n - ${Offset}L").as("c_q"))
        cent = cent.select(col("cid"), col("dim"), col("c_q").as("o_q"))
          .join(upd, Seq("cid", "dim"), "left_outer")
          .select(col("cid"), col("dim"),
            coalesce(col("c_q"), col("o_q")).as("c_q"))
          .localCheckpoint(true)
      }
    }
    assign
  }
}
