package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide line/sentence-level exact dedup — the C4 "remove any line
  * that occurs in more than one document" / FineWeb boilerplate-line
  * step. Paragraph-level near-dup ([[graft.llm.Dedup]]) removes whole
  * documents; THIS operator removes the repeated navigation strings,
  * cookie banners, and license footers *inside* otherwise-unique
  * documents.
  */
object Lines {

  /** Drop from every document the sentences whose document frequency
    * reaches `minDocs` (distinct documents, not occurrences — a sentence
    * repeated inside ONE doc is repetition, q62's signal, not
    * boilerplate). Sentences are the lowercased `". "`-separated
    * segments; surviving sentences re-join in original order. Documents
    * whose every sentence is boilerplate survive with empty text and
    * `n_kept = 0` — dropping them entirely is the caller's policy
    * (`filter(n_kept > 0)`), not baked in.
    *
    * Scale shape: one groupBy on the sentence (map-side partial distinct
    * via the (sent, doc) pre-dedup), one broadcast-or-shuffle semi join
    * back, one per-doc re-aggregation ordered by position — the same
    * three-stage shape as A3's document-frequency filter, at sentence
    * grain. No driver state; the boilerplate set stays distributed. */
  def dropBoilerplateLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Long): DataFrame = {
    val sent = docs
      .select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\. ")).as(Seq("pos", "sent")))
      .filter(trim(col("sent")) =!= "")
    val df = sent.select(col(idCol), col("sent")).distinct()
      .groupBy(col("sent")).agg(count(lit(1)).as("df"))
    sent.join(df, "sent")
      .withColumn("boiler", col("df") >= minDocs)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_sent"),
        sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("boiler"), struct(col("pos"), col("sent"))))),
            x => x.getField("sent")),
          ". ").as("text"))
      .withColumn("n_kept", col("n_sent") - col("n_boiler"))
      .select(col(idCol), col("n_sent"), col("n_kept"), col("text"))
  }

  /** WITHIN-document exact line dedup — the complement of
    * [[dropBoilerplateLines]]'s cross-document rule: each sentence keeps
    * its FIRST occurrence inside its own document and later repeats drop
    * (the in-doc half of C4's repetition cleanup; cheap enough to run
    * before any cross-doc pass because it needs no corpus-wide state).
    * Surviving sentences re-join in original order.
    *
    * Scale shape: one groupBy on (doc, sentence) — co-partitioned with
    * the per-doc re-aggregation that follows, so the whole operator is
    * one hash exchange on the document key. */
  def dedupLinesWithinDoc(
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val sent = docs
      .select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\. ")).as(Seq("pos", "sent")))
      .filter(trim(col("sent")) =!= "")
    sent.groupBy(col(idCol), col("sent"))
      .agg(min(col("pos")).as("pos"), count(lit(1)).as("occ"))
      .groupBy(col(idCol))
      .agg(
        sum(col("occ")).as("n_sent"),
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("sent")))),
            x => x.getField("sent")),
          ". ").as("text"))
      .select(col(idCol), col("n_sent"), col("n_kept"), col("text"))
  }
}
