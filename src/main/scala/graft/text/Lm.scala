package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus language-model scoring beyond the unigram case
  * ([[TextOps.unigramLogLoss]]): the interpolated-bigram cross-entropy
  * filter — the cheap KenLM-direction quality signal crawl pipelines
  * (CCNet-style) bucket documents by before any expensive classifier.
  */
object Lm {

  /** Per-document cross-entropy under an interpolated bigram model fit on
    * the corpus itself:
    *
    *   p(w₂|w₁) = λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N
    *
    * with λ = 3/4 (dyadic, so exact in a double) and c(w₁·) the BIGRAM
    * left-context marginal (not the raw unigram count — the last token of
    * a document starts no bigram).
    *
    * Portability discipline (same as [[TextOps.unigramLogLoss]]):
    * per-document work is an exact integer `Σ tf·q DIV n` over a
    * per-DISTINCT-bigram quantization q = ⌊−10⁶·ln p⌋ computed once on
    * the model side from exact integer counts — the one double expression
    * is evaluated on identical integers in any engine, so the result is
    * hash-stable. Documents with fewer than two tokens have no bigrams
    * and are dropped (inner join), mirrored by the oracle.
    *
    * Scale shape: bigram extraction is a pure projection (zip of the
    * token array with its tail — no self-join); the model is three hash
    * aggregations (bigram, left-marginal, unigram) that stay map-side
    * partial; scoring is one shuffle join of doc-bigram tf against the
    * model keyed by bigram. Nothing driver-sized: the bigram vocabulary
    * stays distributed (no broadcast — it is quadratic-ish in unigram
    * vocab and the model JOIN is on the fact side's own key anyway). */
  def bigramLogLoss(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts = TextOps.tokens(col(textCol))
    val pairs = docs
      .select(col(idCol), ts.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col(idCol),
        explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    val tfb = pairs.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tfb"))

    val cb = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cw1 = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cw1"))
    val uni = docs.select(explode(ts).as("w2"))
      .groupBy(col("w2")).agg(count(lit(1)).as("cu"))
    val n = uni.agg(sum(col("cu")).as("n"))

    val p = lit(0.75) * (col("cb").cast("double") / col("cw1").cast("double")) +
      lit(0.25) * (col("cu").cast("double") / col("n").cast("double"))
    val model = cb
      .join(cw1, "w1")
      .join(uni, "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"),
        floor(lit(-1e6) * log(p)).cast("long").as("q"))

    tfb.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("tfb")).as("n_bigrams"),
        sum(col("tfb") * col("q")).as("sum_q"))
      .select(col(idCol), col("n_bigrams"),
        expr("sum_q DIV n_bigrams").as("nll_q"))
  }
}
