package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Lm

class LmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat"),
    (3L, "zebra quark"),
    (4L, "single"), // no bigram -> dropped
    (5L, "")) // no tokens -> dropped
    .toDF("doc_id", "text")

  test("bigramLogLoss matches a from-scratch reimplementation exactly") {
    val out = Lm.bigramLogLoss(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // independent recomputation with plain Scala collections
    val toks = Map(
      1L -> Seq("the", "cat", "sat", "on", "the", "mat"),
      2L -> Seq("the", "cat", "sat"),
      3L -> Seq("zebra", "quark"),
      4L -> Seq("single"),
      5L -> Seq())
    val bigrams = toks.view.mapValues(ts => ts.zip(ts.drop(1))).toMap
    val cb = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val cw1 = cb.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cu = toks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val n = toks.values.map(_.size).sum
    def q(bg: (String, String)): Long =
      math.floor(-1e6 * math.log(
        0.75 * (cb(bg).toDouble / cw1(bg._1).toDouble) +
          0.25 * (cu(bg._2).toDouble / n.toDouble))).toLong
    val expected = bigrams.collect { case (id, bgs) if bgs.nonEmpty =>
      val sumQ = bgs.map(q).sum
      id -> ((bgs.size.toLong, sumQ / bgs.size))
    }
    assert(out === expected)
    assert(!out.contains(4L) && !out.contains(5L),
      "docs without a bigram must be dropped")
  }

  test("bigramLogLoss is partition-invariant (order-free integer aggregation)") {
    val a = Lm.bigramLogLoss(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Lm.bigramLogLoss(docs.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
