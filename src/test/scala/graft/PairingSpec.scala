package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational
import graft.pairs.Pairing
import graft.text.Stemmer

class PairingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pairCandidates: within-bucket only, no self-pairs, joint probability") {
    val side = Seq(
      (1L, 10, 0.9), (2L, 10, 0.8), (3L, 20, 0.7), (4L, 20, 0.6), (5L, 30, 0.5)
    ).toDF("doc_id", "bucket", "prob")
    val got = Pairing.pairCandidates(side, side, "doc_id")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got === Set(
      (1L, 2L, 10, 0.9 * 0.8), (2L, 1L, 10, 0.8 * 0.9),
      (3L, 4L, 20, 0.7 * 0.6), (4L, 3L, 20, 0.6 * 0.7)),
      "bucket 30 has one entity -> no pair; cross-bucket pairs never appear")
  }

  test("pairCandidates maxPerBucket caps quadratic output deterministically") {
    val side = (1 to 100).map(i => (i.toLong, 1, i / 100.0)).toDF("doc_id", "bucket", "prob")
    val got = Pairing.pairCandidates(side, side, "doc_id", maxPerBucket = 5)
    assert(got.count() === 5 * 4, "5 survivors pair 5*4 ways")
    // survivors are the top-5 by prob (ids 96..100)
    val ids = got.select($"a_id").distinct().as[Long].collect().toSet
    assert(ids === Set(96L, 97L, 98L, 99L, 100L))
  }

  test("scoredPositives: filters prediction=1, derives integer bucket (SIC/10)") {
    import org.apache.spark.ml.linalg.Vectors
    val preds = Seq(
      (1L, "73", 1.0, Vectors.dense(0.3, 0.7)),
      (2L, "74", 0.0, Vectors.dense(0.9, 0.1)),
      (3L, "131", 1.0, Vectors.dense(0.2, 0.8))
    ).toDF("doc_id", "sic", "prediction", "probability")
    val got = Pairing.scoredPositives(preds, "doc_id", "sic")
      .as[(Long, Int, Double)].collect().toSet
    assert(got === Set((1L, 7, 0.7), (3L, 13, 0.8)))
  }

  test("projectByExclusion drops listed columns, tolerating duplicates (P1)") {
    val df = Seq((1, "a", "b", "c")).toDF("k", "x", "y", "z")
    val got = Relational.projectByExclusion(df, "x", "z", "x", "nonexistent")
    assert(got.columns.toSeq === Seq("k", "y"))
  }

  test("rule stemmer: plural/gerund/adverb suffixes fold to a common stem (M1)") {
    val toks = Seq(Tuple1(Seq(
      "mergers", "merged", "merging", "acquisitions", "companies",
      "classes", "quickly", "is", "business", "was"))).toDF("ts")
    val got = toks.select(Stemmer.lemmatize($"ts").as("l")).as[Seq[String]].head()
    assert(got === Seq(
      "merger", "merg", "merg", "acquisition", "company",
      "class", "quick", "is", "business", "was"))
  }

  test("stemmer is pluggable: identity plug-in passes tokens through") {
    val toks = Seq(Tuple1(Seq("mergers", "running"))).toDF("ts")
    val got = toks.select(Stemmer.lemmatize($"ts", identity).as("l")).as[Seq[String]].head()
    assert(got === Seq("mergers", "running"))
  }
}
