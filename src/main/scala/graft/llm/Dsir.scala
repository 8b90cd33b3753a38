package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Data Selection via Importance Resampling (DSIR; Xie et al., NeurIPS
  * 2023): score every document in the raw pool by the log-likelihood
  * ratio of its unigram features under a TARGET distribution vs the
  * RAW-pool distribution (add-1 smoothing on both), then keep the top-k.
  * The published method hashes n-grams into a fixed feature space and
  * Gumbel-samples by weight; this engine keeps literal unigrams (the
  * hashed variant is the same plan with `xxhash64(token) % d` as the
  * feature key) and makes the pick deterministic — top-k by weight with
  * an id tiebreak — so the result is oracle-checkable.
  *
  * Scale shape: two token-keyed aggregations (target counts, raw counts),
  * one vocab-sized join to quantize the per-token log ratio, one join of
  * doc term frequencies against the quantized vocab, one bounded top-k
  * (TakeOrdered, not a global window) broadcast back as the selection
  * flag. Per-token ratios are 1e-6-quantized BIGINTs summed exactly, so
  * partial aggregation is order-free and the doubles never cross an
  * engine boundary unquantized (q83's pattern).
  */
object Dsir {

  /** (id, n_tok, w_q, sel): w_q = Σ_tokens tf · q(token) where
    * q = ⌊1e6·(ln p_target − ln p_raw)⌋ under add-1 smoothing; sel = 1 for
    * the k docs with the highest w_q (ties broken by id). */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, k: Int = 50,
      materializeTf: DataFrame => DataFrame = _.localCheckpoint(true)): DataFrame = {
    // tf is consumed three times (raw pool counts, target counts, the
    // final per-doc weighting) — materialize the corpus term-freq once
    // instead of re-tokenizing the corpus per consumer (r14, guide §5;
    // the q104 before plan held 28 scans). tf is corpus×token grain —
    // the one frame here whose storage tracks the corpus — so callers at
    // scale pass a durable staging materializer (r15, r14 VERDICT #3);
    // vocab and w below stay localCheckpoint (vocab- and doc-grain,
    // narrow numeric columns).
    val tf = materializeTf(
      TextOps.termFreq(docs, idCol, textCol)) // (id, token, tf)
    val raw = tf.groupBy(col("token")).agg(sum(col("tf")).as("cr"))
    val tgtIds = docs.filter(targetPred).select(col(idCol))
    val tgt = tf.join(tgtIds, Seq(idCol), "left_semi")
      .groupBy(col("token")).agg(sum(col("tf")).as("ct"))
    val vocab = raw.join(tgt, Seq("token"), "left_outer")
      .select(col("token"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
      .localCheckpoint(true) // two consumers: the totals + the lr scores
    val tot = vocab.agg(
      sum(col("cr")).as("nr"), sum(col("ct")).as("nt"), count(lit(1)).as("v"))
    // same operation ORDER as the oracle SQL: (ln(ct+1) − ln(nt+v)) −
    // (ln(cr+1) − ln(nr+v)), each ln over an integer cast to double —
    // identical doubles on both engines, so the floor is identical too
    val vq = vocab.crossJoin(broadcast(tot))
      .select(col("token"),
        floor(lit(1e6) *
          ((log((col("ct") + 1).cast("double")) -
            log((col("nt") + col("v")).cast("double"))) -
           (log((col("cr") + 1).cast("double")) -
            log((col("nr") + col("v")).cast("double")))))
          .cast("long").as("q"))
    val w = tf.join(vq, Seq("token"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tok"),
        sum(col("tf") * col("q")).as("w_q"))
      .localCheckpoint(true) // two consumers: top-k + the final join
    val top = w.orderBy(col("w_q").desc, col(idCol)).limit(k)
      .select(col(idCol)).withColumn("sel", lit(1))
    w.join(broadcast(top), Seq(idCol), "left_outer")
      .select(col(idCol), col("n_tok"), col("w_q"),
        coalesce(col("sel"), lit(0)).as("sel"))
  }
}
