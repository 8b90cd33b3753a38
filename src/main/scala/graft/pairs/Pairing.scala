package graft.pairs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** The prediction-pairing layer (SURVEY.md §2.6 M11–M12 + J5/J6) — the
  * reference's `predictions.scala` end-to-end: score positives, bucket by
  * industry group, pair acquirer×target candidates within a bucket with a
  * joint probability.
  */
object Pairing {

  /** `predictions.scala:16-19`: keep predicted positives, extract P(1) via
    * `vector_to_array` (M11 — kills the `v.toArray(1)` UDF), and derive the
    * integer bucket (`(SIC/10).cast("integer")`, P8/P9 — the reference's
    * string-typed SIC silently coerced; the engine casts explicitly). */
  def scoredPositives(
      predictions: DataFrame,
      idCol: String,
      sicCol: String,
      probCol: String = "probability"): DataFrame =
    predictions
      .filter(col("prediction") === 1.0)
      .withColumn("prob",
        element_at(org.apache.spark.ml.functions.vector_to_array(col(probCol)), 2))
      .withColumn("bucket", (col(sicCol).cast("double") / 10).cast("integer"))
      .select(col(idCol), col("bucket"), col("prob"))

  /** [[scoredPositives]] over ALREADY-FLATTENED predictions — the persisted
    * form, where P(1) was extracted to a double column before the parquet
    * sink. This is the serving split: the LR fit (iterative, engine-local)
    * writes (id, sic, prediction, prob) once; every downstream consumer —
    * including a non-Spark engine — re-derives positives and buckets from
    * the persisted columns with pure relational work. Same filter/bucket
    * semantics as [[scoredPositives]], minus the vector access. */
  def scoredPositivesFlat(
      predictions: DataFrame, // (idCol, sicCol, prediction, probCol)
      idCol: String,
      sicCol: String,
      probCol: String = "prob"): DataFrame =
    predictions
      .filter(col("prediction") === 1.0)
      .withColumn("bucket", (col(sicCol).cast("double") / 10).cast("integer"))
      .select(col(idCol), col("bucket"), col(probCol).as("prob"))

  /** M12 + J6: acquirer×target pairing within a bucket, scored
    * `ap.prob * tp.prob` (`predictions.scala:37`), with the same
    * top-k-per-bucket quadratic-output cap as
    * [[graft.ops.Relational.thetaPairs]] (SURVEY §7.4 — the declared
    * semantic that makes the pairing scale-safe: score the k most probable
    * entities per industry bucket, not every pair). */
  def pairCandidates(
      acquirers: DataFrame, // (id, bucket, prob)
      targets: DataFrame,   // (id, bucket, prob)
      idCol: String,
      maxPerBucket: Int = 1000): DataFrame = {
    def prune(df: DataFrame, side: String) =
      Relational.groupedTopK(df, Seq("bucket"), "prob", idCol, maxPerBucket)
        .select(col(idCol).as(s"${side}_id"), col("bucket"),
          col("prob").as(s"${side}_prob"))
    prune(acquirers, "a")
      .join(prune(targets, "t"), Seq("bucket"))
      .filter(col("a_id") =!= col("t_id"))
      .withColumn("pair_prob", col("a_prob") * col("t_prob"))
      .select(col("a_id"), col("t_id"), col("bucket"), col("pair_prob"))
  }
}
