package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dsir

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dsirWeights: content decides rank, not the label; top-k flag is deterministic") {
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta", "en"),
      (2L, "alpha gamma beta beta delta alpha", "en"),
      (3L, "zug warg blomp klix zug warg", "de"),
      (4L, "alpha beta gamma delta beta alpha", "de"), // en-LIKE text, de label
      (5L, "blomp klix zug warg klix blomp", "de")
    ).toDF("doc_id", "text", "lang")
    val out = Dsir
      .dsirWeights(docs, "doc_id", "text", col("lang") === "en", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L), "every raw doc is scored")
    val w = out.view.mapValues(_._2).toMap
    assert(Set(1L, 2L, 4L).forall(i => Set(3L, 5L).forall(j => w(i) > w(j))),
      "docs drawn from the target distribution outrank off-target docs")
    assert(Set(1L, 2L, 4L).map(out(_)._3) === Set(1),
      "doc 4 is selected on CONTENT despite its off-target label")
    assert(Set(3L, 5L).map(out(_)._3) === Set(0))
    assert(out(1L)._1 === 6L)
  }
}
