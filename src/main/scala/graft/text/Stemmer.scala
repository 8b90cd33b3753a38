package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** M1: the pluggable lemmatization stage (SURVEY.md §2.6).
  *
  * The reference lemmatized through CoreNLP's `lemma` UDF from the
  * `databricks:spark-corenlp` package (`acq_etl_code.scala:1,18,54`) — a
  * dead artifact that cannot resolve offline (SURVEY §7.4 U1). The engine
  * keeps the STAGE (token array in → normalized token array out) and ships
  * a rule-based suffix stemmer as the default implementation: a light
  * Porter-style subset (public algorithm, Porter 1980) expressed as pure
  * `regexp_replace` chains — no UDF, no external model, deterministic on
  * any engine. A CoreNLP- or model-backed lemmatizer drops into the same
  * `Column => Column` slot without touching the pipeline.
  */
object Stemmer {

  /** Light suffix-stripping rules for a single lowercase token, ordered
    * longest-suffix-first (each token rewritten at most once — the `when`
    * chain picks the first matching rule, like Porter's step ordering):
    *
    *   - `...sses` → `...ss`, `...ies` → `...y`
    *   - `...ing` / `...ed` stripped when a vowel remains before the suffix
    *   - `...ly` stripped
    *   - trailing `s` stripped when not `ss`/`us` and a vowel exists
    *
    * Guards keep short/irregular tokens intact (min stem length 2). */
  def stemToken(t: Column): Column = {
    def re(p: String) = t.rlike(p)
    when(re("sses$"), regexp_replace(t, "sses$", "ss"))
      .when(re("ies$"), regexp_replace(t, "ies$", "y"))
      .when(re("^[a-z]*[aeiou][a-z]{2,}ing$"), regexp_replace(t, "ing$", ""))
      .when(re("^[a-z]*[aeiou][a-z]+ed$"), regexp_replace(t, "ed$", ""))
      .when(re("^[a-z]{3,}ly$"), regexp_replace(t, "ly$", ""))
      .when(re("^[a-z]*[aeiou][a-z]*[^su]s$") && !re("ss$"),
        regexp_replace(t, "s$", ""))
      .otherwise(t)
  }

  /** The pluggable stage: token array → stemmed token array. Swap the
    * per-token function to change the implementation (the CoreNLP slot). */
  def lemmatize(
      tokens: Column,
      perToken: Column => Column = stemToken): Column =
    transform(tokens, perToken)

  /** Full-parity stage: the COMPLETE Porter (1980) algorithm as a native
    * codegen'd expression ([[graft.expr.PorterStem]]) — token array in,
    * stemmed array out. This is the production path: a real stemming stage
    * with the fidelity of the reference's NLP-library lemmatizer, fused in
    * one pass instead of an interpreted per-token lambda. */
  def porterLemmatize(tokens: Column): Column = graft.exprapi.porterStem(tokens)

  /** Full text → lemmatized tokens, the reference's `lemma('texts)` shape
    * (`acq_etl_code.scala:54`). */
  def lemmas(text: Column): Column = lemmatize(TextOps.tokens(text))

  /** Full text → Porter-stemmed tokens (full-algorithm variant of
    * [[lemmas]]). */
  def porterLemmas(text: Column): Column =
    porterLemmatize(TextOps.tokens(text))
}
